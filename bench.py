"""Benchmark harness: steady-state training throughput on one chip.

Protocol (matched to the reference's hot loop, trainer.py:47-49): each
training step includes the full per-batch graph propagation + 6-term loss +
AdamW update at Food-Kitchen scale (64,094 items, d=128, batch 512, len 15).
The baseline is the unmodified PyTorch reference driven by
bench/baseline_torch.py on the same machine (CPU — the reference's only
available device here), cached in bench_baseline.json.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_ITEM_A, N_ITEM_B = 29207, 34886       # Food-Kitchen (paper Table 1)
N_USERS = 8192
BATCH = 512
LEN_MAX = 15
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_cache")


def _data(spec):
    from c2dsr_tpu.data import preprocess, synthetic

    os.makedirs(CACHE, exist_ok=True)
    f = os.path.join(CACHE, f"train_{N_USERS}_{spec.n_item}.npz")
    if os.path.exists(f):
        with np.load(f) as z:
            train = {k: z[k] for k in z.files}
        seqs = None
    else:
        seqs = synthetic.generate_sequences(spec, N_USERS, seed=0)
        train = preprocess.preprocess_train(seqs, spec, seed=0)
        np.savez(f, **train)
    gf = os.path.join(CACHE, f"graph_{N_USERS}_{spec.n_item}.npz")
    if os.path.exists(gf):
        with np.load(gf) as z:
            g = {k: z[k] for k in z.files}
    else:
        from c2dsr_tpu.data import synthetic as syn
        from c2dsr_tpu.graph import build
        if seqs is None:
            seqs = syn.generate_sequences(spec, N_USERS, seed=0)
        gs, gp = build.build_graphs(seqs, spec)
        g = {"s_rows": gs.rows, "s_cols": gs.cols, "s_vals": gs.vals,
             "p_rows": gp.rows, "p_cols": gp.cols, "p_vals": gp.vals}
        np.savez(gf, **g)
    return train, g


def main():
    import jax

    from c2dsr_tpu.config import Config, DataSpec
    from c2dsr_tpu.graph.build import CooGraph
    from c2dsr_tpu.model import c2dsr, params as params_mod
    from c2dsr_tpu.ops import spmm
    from c2dsr_tpu.train import optim, step as step_mod

    cfg = Config(data="fk", batch_size=BATCH)
    spec = DataSpec(n_item_a=N_ITEM_A, n_item_b=N_ITEM_B, len_max=LEN_MAX)
    train, g = _data(spec)
    n = spec.n_item
    graphs = c2dsr.Graphs(
        share=spmm.device_graph(
            CooGraph(g["s_rows"], g["s_cols"], g["s_vals"], n)),
        specific=spmm.device_graph(
            CooGraph(g["p_rows"], g["p_cols"], g["p_vals"], n)))

    params = params_mod.init_params(jax.random.PRNGKey(0), cfg, spec)
    optimizer = optim.make_optimizer(cfg, steps_per_epoch=16)
    state = step_mod.init_state(params, optimizer)
    train_step = step_mod.make_train_step(cfg, spec, graphs, optimizer,
                                          jax.random.PRNGKey(1))

    import jax.numpy as jnp
    batches = []
    for i in range(4):
        s = i * BATCH
        batches.append({k: jnp.asarray(v[s:s + BATCH])
                        for k, v in train.items()})

    # warmup / compile
    for b in batches[:2]:
        state, aux = train_step(state, b)
    jax.block_until_ready(aux["loss"])

    n_steps = 30
    t0 = time.time()
    for i in range(n_steps):
        state, aux = train_step(state, batches[i % len(batches)])
    jax.block_until_ready(aux["loss"])
    dt = time.time() - t0
    ex_per_s = n_steps * BATCH / dt

    # --- full-itemset eval throughput (items scored+ranked per second) ----
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
    base_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    if os.path.exists(base_file):
        with open(base_file) as f:
            base = json.load(f)
        vs = ex_per_s / base["examples_per_s"]

    details = {
        "train_examples_per_s_chip": round(ex_per_s, 1),
        "train_step_ms": round(dt / n_steps * 1000, 2),
        "eval_full_rank_examples_per_s": round(eval_ex_per_s, 1),
        "eval_full_rank_items_per_s": round(eval_items_per_s, 1),
        "config": {"n_item": spec.n_item, "d": cfg.d_latent,
                   "batch": BATCH, "len_max": LEN_MAX},
        "baseline_examples_per_s_torch_cpu": (
            base["examples_per_s"] if vs else None),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAILS.json"), "w") as f:
        json.dump(details, f, indent=1)

    print(json.dumps({
        "metric": "train_examples_per_s_chip",
        "value": round(ex_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    sys.exit(main())
