"""Benchmark harness: steady-state training throughput on one chip.

Protocol (matched to the reference's hot loop, trainer.py:47-49): each
training step includes the full per-batch graph propagation + 6-term loss +
AdamW update at Food-Kitchen scale (64,094 items, d=128, batch 512, len 15),
with the graph built from the REAL FK train-set user count (34,117 users —
bench/fk_graph.py) so SpMM cost is honest.  The baseline is the unmodified
PyTorch reference driven by bench/baseline_torch.py on the same machine
(CPU — the reference's only portable device here), cached in
bench_baseline.json.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Extra modes (each MERGES its section into BENCH_DETAILS.json):
  --kernels   per-kernel roofline microbench (bench/kernel_bench.py)
  --scaled    10M-item scaled-synthetic per-op bench (bench/scaled_bench.py)
  --batches   throughput vs batch size (headline protocol pins 512)
Related: python -m bench.scaled_e2e (composed 1M-item step),
python -m bench.step_ablation (per-component step attribution).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH = 512
ROOT = os.path.dirname(os.path.abspath(__file__))


def _merge_details(update: dict) -> None:
    from bench.details import merge
    merge(update)


def _train_step_time(cfg, spec, graphs, train, n_steps=30):
    import jax
    import jax.numpy as jnp
    from c2dsr_tpu.model import params as params_mod
    from c2dsr_tpu.train import optim, step as step_mod

    params = params_mod.init_params(jax.random.PRNGKey(0), cfg, spec)
    optimizer = optim.make_optimizer(cfg, steps_per_epoch=16)
    state = step_mod.init_state(params, optimizer)
    train_step = step_mod.make_train_step(
        cfg, spec, graphs, optimizer,
        jax.random.key(1, impl=cfg.resolved_train_prng()))
    batches = []
    for i in range(4):
        s = i * BATCH
        batches.append({k: jnp.asarray(v[s:s + BATCH])
                        for k, v in train.items()})
    for b in batches[:2]:                      # warmup / compile
        state, aux = train_step(state, b)
    jax.block_until_ready(aux["loss"])
    t0 = time.time()
    for i in range(n_steps):
        state, aux = train_step(state, batches[i % len(batches)])
    jax.block_until_ready(aux["loss"])
    dt = (time.time() - t0) / n_steps
    return dt, state


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    import jax

    from bench import fk_graph
    from c2dsr_tpu.config import Config
    from c2dsr_tpu.graph.build import CooGraph
    from c2dsr_tpu.model import c2dsr
    from c2dsr_tpu.ops import spmm

    if "--kernels" in argv:
        from bench import kernel_bench
        _merge_details({"kernels": kernel_bench.run()})
        print(json.dumps({"metric": "kernel_bench", "value": 1,
                          "unit": "done", "vs_baseline": None}))
        return 0
    if "--scaled" in argv:
        from bench import scaled_bench
        _merge_details({"scaled": scaled_bench.run()})
        print(json.dumps({"metric": "scaled_bench", "value": 1,
                          "unit": "done", "vs_baseline": None}))
        return 0
    if "--batches" in argv:
        # batch-size scaling: the headline protocol pins batch 512 (the
        # reference's), but production serving/training can feed larger
        # batches — record the throughput headroom per batch size
        global BATCH
        cfg0 = Config(data="fk")
        spec = fk_graph.spec()
        train = fk_graph.load_train()
        g = fk_graph.load_or_build()
        n = spec.n_item
        graphs = c2dsr.Graphs(
            share=spmm.device_graph(
                CooGraph(g["s_rows"], g["s_cols"], g["s_vals"], n)),
            specific=spmm.device_graph(
                CooGraph(g["p_rows"], g["p_cols"], g["p_vals"], n)))
        rows = []
        orig_batch = BATCH
        for b in (256, 512, 1024, 2048, 4096):
            if b > train["seq_share"].shape[0] // 4:
                break
            BATCH = b
            dt, _ = _train_step_time(cfg0.with_(batch_size=b), spec,
                                     graphs, train,
                                     n_steps=max(8, 8192 // b))
            rows.append({"batch": b, "step_ms": round(dt * 1e3, 2),
                         "examples_per_s": round(b / dt, 1)})
            print(json.dumps(rows[-1]), flush=True)
        BATCH = orig_batch
        _merge_details({"batch_scaling": {
            "note": "same FK-scale config as the headline; only batch size "
                    "varies (headline protocol pins 512 = the reference's)",
            "device": str(jax.devices()[0]), "results": rows}})
        print(json.dumps({"metric": "batch_scaling", "value": 1,
                          "unit": "done", "vs_baseline": None}))
        return 0

    cfg = Config(data="fk", batch_size=BATCH)
    spec = fk_graph.spec()
    train = fk_graph.load_train()
    g = fk_graph.load_or_build()
    n = spec.n_item
    graphs = c2dsr.Graphs(
        share=spmm.device_graph(
            CooGraph(g["s_rows"], g["s_cols"], g["s_vals"], n)),
        specific=spmm.device_graph(
            CooGraph(g["p_rows"], g["p_cols"], g["p_vals"], n)))

    # headline = the default config (compute_dtype=auto -> bf16 on TPU)
    step_s, state = _train_step_time(cfg, spec, graphs, train)
    ex_per_s = BATCH / step_s

    # f32 activations variant for comparison
    step_s_f32, _ = _train_step_time(cfg.with_(compute_dtype="float32"),
                                     spec, graphs, train, n_steps=20)

    # --- full-itemset eval throughput (items scored+ranked per second) ----
    import jax.numpy as jnp
    from c2dsr_tpu.data import preprocess, synthetic
    from c2dsr_tpu.evaluate import ranker

    eval_seqs = synthetic.generate_sequences(spec, 2048, seed=7)
    ev = preprocess.preprocess_evaluate(eval_seqs, spec, n_neg_sample=99,
                                        seed=7)
    convolve_eval, rank_step = ranker.make_eval_fns(cfg, spec, graphs)
    hi = convolve_eval(state.params)
    groups = ranker.partition_by_domain(ev)
    eb = {}
    for dom in ("a", "b"):
        n_dom = spec.n_item_a if dom == "a" else spec.n_item_b
        chunk, _ = next(iter(ranker._batches(groups[dom], 1024)))
        chunk = {k: jnp.asarray(v) for k, v in chunk.items()}
        r = rank_step(state.params, hi, chunk, dom, "full")   # compile
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(10):
            r = rank_step(state.params, hi, chunk, dom, "full")
        jax.block_until_ready(r)
        eb[dom] = (10 * 1024) / (time.time() - t0), n_dom
    eval_ex_per_s = eb["a"][0] * 0.5 + eb["b"][0] * 0.5
    eval_items_per_s = (eb["a"][0] * eb["a"][1] + eb["b"][0] * eb["b"][1]) / 2

    vs = None
    base_file = os.path.join(ROOT, "bench_baseline.json")
    if os.path.exists(base_file):
        with open(base_file) as f:
            base = json.load(f)
        vs = ex_per_s / base["examples_per_s"]

    _merge_details({
        "train_examples_per_s_chip": round(ex_per_s, 1),
        "train_step_ms": round(step_s * 1000, 2),
        "train_step_ms_f32": round(step_s_f32 * 1000, 2),
        "eval_full_rank_examples_per_s": round(eval_ex_per_s, 1),
        "eval_full_rank_items_per_s": round(eval_items_per_s, 1),
        "config": {"n_item": spec.n_item, "d": cfg.d_latent,
                   "batch": BATCH, "len_max": spec.len_max,
                   "graph_users": fk_graph.N_USERS,
                   "nnz_share": int(g["s_rows"].shape[0])},
        "baseline_examples_per_s_torch_cpu": (
            base["examples_per_s"] if vs else None),
    })

    print(json.dumps({
        "metric": "train_examples_per_s_chip",
        "value": round(ex_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
