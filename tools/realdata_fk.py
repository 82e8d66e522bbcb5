"""First quality numbers on REAL Food-Kitchen data (round-3 verdict item 3).

The mount is missing FK ``train_new.txt`` (SURVEY.md: `.MISSING_LARGE_BLOBS`),
so this is the closest experiment the environment permits: treat
``val_new.txt`` (8,173 real users, the real 29,207/34,886 itemsets, real
Zipf item skew and graph density) as the training corpus, build both
adjacency graphs from it, train on the TPU with the reference's default
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

Writes REALDATA_FK.json: per-epoch losses/metrics, epochs-to-improvement>0
(sampled protocol), best/final metrics under both protocols, and steady
training throughput (examples/s).

Usage: python tools/realdata_fk.py [--epochs 60] [--raw DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FK_RAW = "/root/reference/data/raw/Food-Kitchen"


def run(raw_dir=FK_RAW, n_epochs=60, es_patience=10, out_path=None):
    from c2dsr_tpu import metrics
    from c2dsr_tpu.config import Config
    from c2dsr_tpu.data import preprocess, raw
    from c2dsr_tpu.evaluate import ranker
    from c2dsr_tpu.graph import build as graph_build
    from c2dsr_tpu.model import c2dsr
    from c2dsr_tpu.ops import spmm
    from c2dsr_tpu.train.loop import Experiment

    cfg = Config(data="fk", eval_mode="full", n_epoch=n_epochs,
                 es_patience=es_patience)
    spec = raw.load_data_spec(raw_dir, cfg.resolved_len_max())

    train_seqs = raw.parse_interactions(os.path.join(raw_dir, "val_new.txt"))
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
            "n_train_users": len(train_seqs),
            "n_train_examples": int(train["seq_share"].shape[0]),
            "n_val_examples": int(val["gt_last"].shape[0]),
            "n_test_examples": int(test["gt_last"].shape[0]),
            "n_item_a": spec.n_item_a, "n_item_b": spec.n_item_b,
            "len_max": spec.len_max,
            "graph_nnz": {"share": int(gs.nnz), "specific": int(gp.nnz)},
        },
        "config": {"d_latent": cfg.d_latent, "batch_size": cfg.batch_size,
                   "lr": cfg.lr, "l2": cfg.l2, "lambda_loss": cfg.lambda_loss,
                   "lr_step": cfg.lr_step, "seed": cfg.seed,
                   "compute_dtype": cfg.compute_dtype,
                   "kernel_backend": cfg.kernel_backend,
                   "n_epochs_max": n_epochs, "es_patience": es_patience},
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
        es_fired = True
        for mode, res_val in (("full", res_val_full), ("sampled",
                                                       res_val_samp)):
            if res_val[0] > best[mode]["improve"]:
                res_test = scores(exp.test_data, mode)
                best[mode] = {"improve": res_val[0], "epoch": epoch,
                              "val": [round(x, 5) for x in res_val],
                              "test": [round(x, 5) for x in res_test]}
                es_fired = False
        if epochs_to_positive is None and res_val_samp[0] > 0:
            epochs_to_positive = epoch
        report["epochs"].append(row)
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

    out_path = out_path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "REALDATA_FK.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")
    return report


def main():
    kw = {}
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--epochs":
            kw["n_epochs"] = int(argv[i + 1])
        elif a == "--raw":
            kw["raw_dir"] = argv[i + 1]
    run(**kw)


if __name__ == "__main__":
    main()
