"""Real-data quality runs on the TPU chip (FK / MB; round-5 verdict #1-2).

The mount is missing ``train_new.txt`` for every dataset (SURVEY.md:
`.MISSING_LARGE_BLOBS`), so this is the closest experiment the environment
permits: treat ``val_new.txt`` (real users, the real itemsets, real Zipf
item skew and graph density) as the training corpus, build both adjacency
graphs from it, train on the TPU with the reference's default
hyperparameters (main.py:15-66), and evaluate on ``test_new.txt``'s users —
the real held-out split; none of its users' sequences are seen in training.

``test_new.txt`` is split alternately by line order (preserving the A/B
domain mix of dataloader.py:245-272's split roles) into a model-selection
half ("val", even lines) and a reporting half ("test", odd lines), so
reported metrics come from users used for neither training nor selection.

Both eval protocols are recorded each epoch:
  * full-rank over the whole domain itemset (the north-star protocol;
    README.md:19-21 notes full-rank numbers run far below sampled ones), and
  * the reference's 999-sampled-negative protocol (utils/constant.py's
    paper benchmark numbers — the improvement denominator — were measured
    under this protocol, so only this mode is comparable to them).

Extensions over the round-4 FK-only tool:
  * ``--data mb`` trains Movie-Book (the 63,937-wide B classifier
    production path, BASELINE.json config 2);
  * ``--fraction 0.5`` subsamples training users (deterministic
    permutation) for data-scaling curves;
  * ``--extra-train val.txt`` folds additional mounted splits into the
    training corpus (FK's old-protocol ``val.txt``), for the
    data-supplementation experiment — pair with tools/leak_stats.py;
  * reference-bug-parity dynamics via ``--bug_inverted_padding_mask`` /
    ``--bug_epoch_grad_accum`` (encoders.py:33, trainer.py:42) — the
    configuration that produced the published numbers.

Writes REALDATA_<DATA>.json (or --out): per-epoch losses/metrics,
epochs-to-improvement>0 (sampled protocol), best/final metrics under both
protocols, and steady training throughput (examples/s).

Usage: python tools/realdata_run.py --data mb [--epochs 60] [--out PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RAW_ROOT = "/root/reference/data/raw"
DATA_DIRS = {"fk": "Food-Kitchen", "mb": "Movie-Book",
             "ee": "Entertainment-Education"}


def _line_users(path):
    with open(path, "r", encoding="utf-8") as f:
        return [int(line.split("\t", 1)[0]) for line in f]


def load_extra_split(fpath, eval_users):
    """Parse an extra training split, dropping every line whose USER
    appears in ``eval_users``.  Old-protocol splits (FK val.txt) share
    users with test_new — 975/8406 test lines appear VERBATIM there (same
    user, same interaction id), so folding unfiltered data trains on the
    evaluated steps themselves.  Returns (kept_sequences, n_dropped)."""
    from c2dsr_tpu.data import raw
    extra = raw.parse_interactions(fpath)
    if not eval_users:
        return extra, 0
    users = _line_users(fpath)
    kept = [s for s, u in zip(extra, users) if u not in eval_users]
    return kept, len(extra) - len(kept)


def run(data_code="fk", raw_dir=None, n_epochs=60, es_patience=10,
        out_path=None, train_fraction=1.0, extra_train_files=(),
        exclude_eval_users_from_extra=True, overrides=None, write=True,
        quiet=False):
    from c2dsr_tpu import metrics
    from c2dsr_tpu.config import Config
    from c2dsr_tpu.data import preprocess, raw
    from c2dsr_tpu.evaluate import ranker
    from c2dsr_tpu.graph import build as graph_build
    from c2dsr_tpu.model import c2dsr
    from c2dsr_tpu.ops import spmm
    from c2dsr_tpu.train.loop import Experiment

    raw_dir = raw_dir or os.path.join(RAW_ROOT, DATA_DIRS[data_code])
    overrides = dict(overrides or {})
    cfg = Config(data=data_code, eval_mode="full", n_epoch=n_epochs,
                 es_patience=es_patience, **overrides)
    spec = raw.load_data_spec(raw_dir, cfg.resolved_len_max())

    train_seqs = raw.parse_interactions(os.path.join(raw_dir, "val_new.txt"))
    n_extra_dropped = 0
    eval_users = (set(_line_users(os.path.join(raw_dir, "test_new.txt")))
                  if extra_train_files and exclude_eval_users_from_extra
                  else set())
    for fname in extra_train_files:
        extra, dropped = load_extra_split(os.path.join(raw_dir, fname),
                                          eval_users)
        n_extra_dropped += dropped
        train_seqs = train_seqs + extra
    if train_fraction < 1.0:
        perm = np.random.RandomState(20260821).permutation(len(train_seqs))
        keep = perm[:max(1, int(round(train_fraction * len(train_seqs))))]
        train_seqs = [train_seqs[i] for i in sorted(keep)]
    eval_seqs = raw.parse_interactions(os.path.join(raw_dir, "test_new.txt"))
    val_seqs = eval_seqs[0::2]
    test_seqs = eval_seqs[1::2]

    train = preprocess.preprocess_train(train_seqs, spec, cfg.seed)
    val = preprocess.preprocess_evaluate(val_seqs, spec, cfg.n_neg_sample,
                                         cfg.seed)
    test = preprocess.preprocess_evaluate(test_seqs, spec, cfg.n_neg_sample,
                                          cfg.seed + 1)

    gs, gp = graph_build.build_graphs(train_seqs, spec)
    graphs = c2dsr.Graphs(share=spmm.device_graph(gs),
                          specific=spmm.device_graph(gp))
    exp = Experiment(cfg, spec, graphs, train, val, test)

    report = {
        "corpus": {
            "train_file": "val_new.txt", "eval_file": "test_new.txt",
            "extra_train_files": list(extra_train_files),
            "extra_lines_dropped_shared_eval_user": n_extra_dropped,
            "train_fraction": train_fraction,
            "n_train_users": len(train_seqs),
            "n_train_examples": int(train["seq_share"].shape[0]),
            "n_val_examples": int(val["gt_last"].shape[0]),
            "n_test_examples": int(test["gt_last"].shape[0]),
            "n_item_a": spec.n_item_a, "n_item_b": spec.n_item_b,
            "len_max": spec.len_max,
            "graph_nnz": {"share": int(gs.nnz), "specific": int(gp.nnz)},
        },
        "config": {"data": data_code, "d_latent": cfg.d_latent,
                   "batch_size": cfg.batch_size,
                   "lr": cfg.lr, "l2": cfg.l2, "lambda_loss": cfg.lambda_loss,
                   "lr_step": cfg.lr_step, "seed": cfg.seed,
                   "compute_dtype": cfg.compute_dtype,
                   "kernel_backend": cfg.kernel_backend,
                   "n_epochs_max": n_epochs, "es_patience": es_patience,
                   "overrides": overrides},
        "epochs": [],
    }

    def scores(data_split, mode):
        ra, rb = exp.run_eval(data_split) if mode == "full" else (
            ranker.evaluate_split(exp.state.params,
                                  exp.convolve_eval(exp.state.params),
                                  data_split, exp.rank_step, cfg,
                                  mode="sampled"))
        return metrics.cal_score(ra, rb, cfg.benchmark)

    best = {"full": {"improve": -1e9}, "sampled": {"improve": -1e9}}
    epochs_to_positive = None
    ex_s_steady = []
    for epoch in range(1, n_epochs + 1):
        t0 = time.time()
        loss_tr, loss_rec, loss_mi = exp.run_train_epoch()
        dt_train = time.time() - t0
        if not np.isfinite(loss_tr):
            raise FloatingPointError(f"non-finite loss at epoch {epoch}")
        if epoch > 1:                       # skip the compile epoch
            ex_s_steady.append(exp.n_tr / dt_train)

        res_val_full = scores(exp.val_data, "full")
        res_val_samp = scores(exp.val_data, "sampled")
        row = {"epoch": epoch,
               "loss": [round(loss_tr, 4), round(loss_rec, 4),
                        round(loss_mi, 4)],
               "train_s": round(dt_train, 2),
               "val_full_improve": round(res_val_full[0], 4),
               "val_full_hr5": [round(res_val_full[1], 4),
                                round(res_val_full[7], 4)],
               "val_sampled_improve": round(res_val_samp[0], 4),
               "val_sampled_hr5": [round(res_val_samp[1], 4),
                                   round(res_val_samp[7], 4)]}
        for mode, res_val in (("full", res_val_full), ("sampled",
                                                       res_val_samp)):
            if res_val[0] > best[mode]["improve"]:
                res_test = scores(exp.test_data, mode)
                best[mode] = {"improve": res_val[0], "epoch": epoch,
                              "val": [round(x, 5) for x in res_val],
                              "test": [round(x, 5) for x in res_test]}
        if epochs_to_positive is None and res_val_samp[0] > 0:
            epochs_to_positive = epoch
        report["epochs"].append(row)
        if not quiet:
            print(json.dumps(row), flush=True)
        stale = epoch - max(best[m].get("epoch", 0) for m in best)
        if stale >= es_patience:
            report["early_stopped_at"] = epoch
            break

    cols = ["improve", "hr5_a", "hr20_a", "mrr5_a", "mrr20_a", "ndcg5_a",
            "ndcg20_a", "hr5_b", "hr20_b", "mrr5_b", "mrr20_b", "ndcg5_b",
            "ndcg20_b"]
    report["metric_columns"] = cols
    report["best"] = best
    report["epochs_to_sampled_improvement_gt0"] = epochs_to_positive
    report["train_examples_per_s_steady"] = (
        round(float(np.median(ex_s_steady)), 1) if ex_s_steady else None)
    report["device"] = str(__import__("jax").devices()[0])

    if write:
        out_path = out_path or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"REALDATA_{data_code.upper()}.json")
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_path}")
    return report


def main():
    kw = {}
    overrides = {}
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--data":
            kw["data_code"] = argv[i + 1]; i += 1
        elif a == "--epochs":
            kw["n_epochs"] = int(argv[i + 1]); i += 1
        elif a == "--raw":
            kw["raw_dir"] = argv[i + 1]; i += 1
        elif a == "--out":
            kw["out_path"] = argv[i + 1]; i += 1
        elif a == "--fraction":
            kw["train_fraction"] = float(argv[i + 1]); i += 1
        elif a == "--extra-train":
            kw.setdefault("extra_train_files", []).append(argv[i + 1]); i += 1
        elif a == "--bug_inverted_padding_mask":
            overrides["bug_inverted_padding_mask"] = True
        elif a == "--bug_epoch_grad_accum":
            overrides["bug_epoch_grad_accum"] = True
        else:
            raise SystemExit(f"unknown arg {a}")
        i += 1
    if overrides:
        kw["overrides"] = overrides
    run(**kw)


if __name__ == "__main__":
    main()
