"""Round-5 tool behaviors: leakage accounting and eval-user exclusion.

The FK split-folding experiment exposed that the reference-semantics
strict leak check (data/raw/leak_stats.py) reads 0.0 while 975/8406 eval
lines exist VERBATIM in the folded split — these tests pin the inclusive
rate and the realdata_run filter that mitigates it.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import leak_stats  # noqa: E402
from tools import realdata_run  # noqa: E402


def _write(path, lines):
    with open(path, "w") as f:
        for user, inter, items in lines:
            cells = [str(user), str(inter)] + [
                f"{it}|{1000 + i}|d|" for i, it in enumerate(items)]
            f.write("\t".join(cells) + "\n")


def test_leak_rates_strict_vs_inclusive(tmp_path):
    train = str(tmp_path / "train.txt")
    ev = str(tmp_path / "eval.txt")
    # user 1: train inter 5 NEWER than eval inter 3 -> strict leak
    # user 2: train inter 7 == eval inter 7 (verbatim) -> inclusive only
    # user 3: train inter 1 older than eval inter 9 -> clean
    # user 4: eval only -> clean
    _write(train, [(1, 5, [10, 11]), (2, 7, [12]), (3, 1, [13])])
    _write(ev, [(1, 3, [10]), (2, 7, [12]), (3, 9, [14]), (4, 2, [15])])
    n, strict = leak_stats.leak_rate(train, ev)
    n2, incl = leak_stats.leak_rate_inclusive(train, ev)
    assert (n, n2) == (4, 4)
    assert strict == 1 / 4
    assert incl == 2 / 4


def test_realdata_extra_split_user_exclusion(tmp_path):
    raw = tmp_path
    _write(str(raw / "test_new.txt"), [(1, 3, [10]), (2, 7, [12])])
    _write(str(raw / "extra.txt"),
           [(1, 5, [10, 11]), (5, 1, [13]), (2, 7, [12]), (6, 2, [14])])
    assert realdata_run._line_users(str(raw / "extra.txt")) == [1, 5, 2, 6]
    eval_users = set(realdata_run._line_users(str(raw / "test_new.txt")))
    # the production filter (the one run() folds extra splits through)
    kept, dropped = realdata_run.load_extra_split(str(raw / "extra.txt"),
                                                  eval_users)
    # users 1 and 2 appear in the eval file -> their lines are dropped
    assert dropped == 2
    assert kept == [[13], [14]]
    # no eval users -> everything kept, nothing dropped
    all_kept, d0 = realdata_run.load_extra_split(str(raw / "extra.txt"),
                                                 set())
    assert d0 == 0 and len(all_kept) == 4
