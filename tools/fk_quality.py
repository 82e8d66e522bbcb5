"""Food-Kitchen quality-gap experiments (round-5 verdict #2) -> REALDATA_FK.json v2.

Three measured questions about the -0.11 sampled-improvement gap of the
round-4 FK run, each answered by a TPU training run through
tools/realdata_run.py's protocol (train on val_new.txt users, select on
even lines of test_new.txt, report on odd lines):

(a) bug-parity dynamics: the reference's PUBLISHED numbers were produced
    WITH the inverted key-padding mask (encoders.py:33) and the
    zero-grad-once-per-epoch accumulation (trainer.py:42).  Train with
    both bugs enabled and compare against the corrected-default run — does
    the reference's own dynamics close the gap?
(b) data scaling: train on 25/50/75/100% of the 8,173 available users.
    The round-4 claim was "we train on ~24% of the real train corpus
    (34,117 users); most of the gap is data".  The fraction curve makes
    that an extrapolation from measurements instead of a note.
(c) fold the old-protocol val.txt split in as extra training users
    (+5,426 users, the only additional real FK data mounted), gated by a
    leakage analysis (tools/leak_stats.py) of val.txt's users against the
    reporting split.

Writes REALDATA_FK.json with the round-4 default run preserved under
"default" and the new sections alongside.  Each extra run stores the best
tables + a compact epoch trace.

Usage: python tools/fk_quality.py  [--epochs 60]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import leak_stats  # noqa: E402
from tools.realdata_run import run  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FK_RAW = "/root/reference/data/raw/Food-Kitchen"


def compact(report, keep_epochs=True):
    """Strip the per-epoch table down to the selection-relevant columns."""
    out = {k: report[k] for k in ("corpus", "config", "best",
                                  "metric_columns",
                                  "epochs_to_sampled_improvement_gt0",
                                  "train_examples_per_s_steady")
           if k in report}
    if "early_stopped_at" in report:
        out["early_stopped_at"] = report["early_stopped_at"]
    if keep_epochs:
        out["epochs"] = [
            {"epoch": e["epoch"], "loss": e["loss"][0],
             "val_sampled_improve": e["val_sampled_improve"],
             "val_full_improve": e["val_full_improve"]}
            for e in report["epochs"]]
    return out


def main():
    n_epochs = 60
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--epochs":
            n_epochs = int(argv[i + 1])

    out_path = os.path.join(ROOT, "REALDATA_FK.json")
    with open(out_path) as f:
        v1 = json.load(f)
    if "default" in v1:          # already v2: keep the preserved default
        doc = v1
    else:
        doc = {"format": "v2 (round 5): named experiment sections",
               "metric_columns": v1["metric_columns"],
               "device": v1.get("device"),
               "default": v1}
        doc["default"].pop("metric_columns", None)

    def save():
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"checkpointed {out_path}", flush=True)

    # (a) reference-bug-parity dynamics
    print("== (a) bug-parity dynamics ==", flush=True)
    rep = run(data_code="fk", n_epochs=n_epochs, write=False, quiet=True,
              overrides={"bug_inverted_padding_mask": True,
                         "bug_epoch_grad_accum": True})
    doc["bug_parity"] = compact(rep)
    save()

    # (b) data-scaling curve
    doc["data_scaling"] = {"note": "fraction of the 8,173 val_new users "
                           "used for training; 1.0 == the 'default' run"}
    for frac in (0.25, 0.5, 0.75):
        print(f"== (b) fraction {frac} ==", flush=True)
        rep = run(data_code="fk", n_epochs=n_epochs, write=False, quiet=True,
                  train_fraction=frac)
        doc["data_scaling"][str(frac)] = compact(rep, keep_epochs=False)
        save()

    # (c) fold old-split val.txt users in, with a leakage gate.  The strict
    # reference-semantics check (NEWER interaction id) reads 0.0 here, but
    # 975/8406 test_new lines appear VERBATIM in val.txt (same user, same
    # interaction id) — the inclusive rate catches that, and the fold run
    # excludes every val.txt line whose user appears in test_new.
    print("== (c) fold val.txt ==", flush=True)
    n_eval, rate_strict = leak_stats.leak_rate(
        os.path.join(FK_RAW, "val.txt"), os.path.join(FK_RAW, "test_new.txt"))
    _, rate_incl = leak_stats.leak_rate_inclusive(
        os.path.join(FK_RAW, "val.txt"), os.path.join(FK_RAW, "test_new.txt"))
    rep = run(data_code="fk", n_epochs=n_epochs, write=False, quiet=True,
              extra_train_files=("val.txt",),
              exclude_eval_users_from_extra=True)
    doc["fold_val"] = compact(rep)
    doc["fold_val"]["leak_check"] = {
        "method": "tools/leak_stats.py: strict = test_new lines whose user "
                  "has a STRICTLY newer interaction id in val.txt; "
                  "inclusive also counts same-id (verbatim) lines",
        "n_eval_lines": n_eval,
        "leak_rate_strict": round(rate_strict, 5),
        "leak_rate_inclusive": round(rate_incl, 5),
        "mitigation": "every val.txt line whose user appears in test_new "
                      "is dropped from the fold (see corpus."
                      "extra_lines_dropped_shared_eval_user)"}
    save()
    print("done", flush=True)


if __name__ == "__main__":
    main()
