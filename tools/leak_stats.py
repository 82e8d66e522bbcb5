#!/usr/bin/env python
"""Train/eval information-leakage analysis (capability of
data/raw/leak_stats.py:55-119).

A val/test line "leaks" when the same user has a TRAIN interaction whose
interaction id is newer (greater) than the eval line's id — i.e. the model
trains on the user's future relative to the evaluated step.  Reports the
leak rate per split, the analysis the reference used to justify the
``*_new`` splits.

Usage: python tools/leak_stats.py data/raw/Food-Kitchen [--suffix _new]
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict


def user_inter_ids(path):
    out = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            cells = line.strip().split("\t")
            out.append((int(cells[0]), int(cells[1])))
    return out


def leak_rate(train_path: str, eval_path: str) -> tuple:
    """Strict-future leakage: eval lines whose user has a STRICTLY newer
    train interaction (the reference script's semantics,
    data/raw/leak_stats.py:55-119)."""
    max_train = defaultdict(lambda: -1)
    for user, inter in user_inter_ids(train_path):
        max_train[user] = max(max_train[user], inter)
    n = leaked = 0
    for user, inter in user_inter_ids(eval_path):
        n += 1
        if max_train[user] > inter:
            leaked += 1
    return n, leaked / max(n, 1)


def leak_rate_inclusive(train_path: str, eval_path: str) -> tuple:
    """Same-or-newer leakage: also counts eval lines present VERBATIM in
    the train file (same user, same interaction id) — training on the
    evaluated step itself.  The strict check returns 0.0 for FK
    val.txt-vs-test_new while 975/8406 lines are verbatim copies (round-5
    finding); any split-folding decision must gate on THIS rate."""
    max_train = defaultdict(lambda: -1)
    for user, inter in user_inter_ids(train_path):
        max_train[user] = max(max_train[user], inter)
    n = leaked = 0
    for user, inter in user_inter_ids(eval_path):
        n += 1
        if max_train[user] >= inter:
            leaked += 1
    return n, leaked / max(n, 1)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("raw_dir")
    p.add_argument("--suffix", default="_new",
                   help="split suffix: '' for the old splits, '_new' for "
                        "the leakage-reduced ones")
    args = p.parse_args()
    train = os.path.join(args.raw_dir, f"train{args.suffix}.txt")
    if not os.path.exists(train):
        print(f"missing {train}", file=sys.stderr)
        return 1
    for mode in ("val", "test"):
        path = os.path.join(args.raw_dir, f"{mode}{args.suffix}.txt")
        if not os.path.exists(path):
            print(f"{mode}: MISSING")
            continue
        n, rate = leak_rate(train, path)
        print(f"{mode}{args.suffix}: {n} lines, leak rate {rate:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
