"""Composed scaled train step on the real chip (round-5 verdict #3).

bench/scaled_bench.py measures the 10M-item regime PER-OP; this composes
the FULL production train step — per-batch graph propagation (Pallas
blocked SpMM), the one-kernel 5-tower joint pass, BOTH fused-CE heads, the
6-term loss, and the torch-exact AMSGrad update — at the largest
single-chip-fitting vocab, plus full-rank evaluation, so the multi-shard
projection rests on a composed measurement instead of per-op arithmetic.

Config sizing (v5e, 16 GB HBM): AMSGrad's three f32 moments dominate —
params cost 16 bytes/element at rest.  At d=128 with 500k items per
domain the resident state is ~8 GB (3 tables at [1,000,448 x 128] + 2
classifiers) leaving room for the [nnz, d] gather intermediate, so the
composed config is 1,000,001 items / d=128 / batch 512 — 15.6x the
Food-Kitchen vocab, with a 3M-edge synthetic graph matching FK's mean
degree (the SpMM gather scales with edges, BASELINE.json config 5).
d=512 at 2M+ items (the verdict's suggestion) does NOT fit one chip:
5 x 2e6 x 512 x 16 B = 82 GB — that regime is exactly what
parallel/'s sharded tables are for (tests/test_scaled.py at 1M rows x 8
fake shards; memory_plan in bench/scaled_bench.py).

Correctness gates before timing:
  * the jitted step's loss is finite and decreases over the timed window;
  * fused-CE row losses on a probe batch match the chunked-logsumexp
    oracle (scaled_bench._chunked_ce_oracle) at the full 500k-class width.

Writes a "scaled_e2e" section into BENCH_DETAILS.json.
Run: python -m bench.scaled_e2e
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

N_A = 500_000
N_B = 500_000
D = 128
BATCH = 512
N_EDGES = 3_000_000        # ~FK mean degree (~3) at 1M rows
N_USERS = 2048             # synthetic corpus: enough for distinct batches


def _synthetic_graph(n_item: int, n_edges: int, seed: int):
    """Random COO with D^-1 row normalization — degree structure only;
    values follow graph/build.py's row-mean convention."""
    from c2dsr_tpu.graph.build import CooGraph
    rng = np.random.default_rng(seed)
    rows = rng.integers(1, n_item, n_edges, dtype=np.int64)
    cols = rng.integers(1, n_item, n_edges, dtype=np.int64)
    order = np.argsort(rows, kind="stable")
    rows, cols = rows[order], cols[order]
    deg = np.bincount(rows, minlength=n_item).astype(np.float32)
    vals = 1.0 / deg[rows]
    return CooGraph(rows, cols, vals, n_item)


def run() -> dict:
    from bench.scaled_bench import _chunked_ce_oracle
    from c2dsr_tpu.config import Config, DataSpec
    from c2dsr_tpu.data import preprocess, synthetic
    from c2dsr_tpu.evaluate import ranker
    from c2dsr_tpu.model import c2dsr, params as params_mod
    from c2dsr_tpu.ops import fused_ce, spmm
    from c2dsr_tpu.train import optim, step as step_mod

    cfg = Config(data="fk", batch_size=BATCH, d_latent=D)
    spec = DataSpec(n_item_a=N_A, n_item_b=N_B, len_max=15)
    report = {"n_item": spec.n_item, "d_latent": D, "batch": BATCH,
              "n_edges": N_EDGES,
              "device": str(jax.devices()[0])}

    print(f"building {N_EDGES}-edge graphs at {spec.n_item} rows...",
          flush=True)
    graphs = c2dsr.Graphs(
        share=spmm.device_graph(_synthetic_graph(spec.n_item, N_EDGES, 0)),
        specific=spmm.device_graph(_synthetic_graph(spec.n_item, N_EDGES, 1)))

    print("synthesizing corpus...", flush=True)
    seqs = synthetic.generate_sequences(spec, N_USERS, seed=2)
    train = preprocess.preprocess_train(seqs, spec, seed=3)
    evald = preprocess.preprocess_evaluate(seqs[:512], spec,
                                           cfg.n_neg_sample, seed=4)

    params = params_mod.init_params(jax.random.PRNGKey(0), cfg, spec)
    optimizer = optim.make_optimizer(cfg, steps_per_epoch=4)
    state = step_mod.init_state(params, optimizer)
    train_step = step_mod.make_train_step(
        cfg, spec, graphs, optimizer,
        jax.random.key(1, impl=cfg.resolved_train_prng()))

    batches = []
    for i in range(4):
        s = i * BATCH
        batches.append({k: jnp.asarray(v[s:s + BATCH])
                        for k, v in train.items()})

    print("compiling + first steps...", flush=True)
    t0 = time.time()
    state, aux = train_step(state, batches[0])
    jax.block_until_ready(aux["loss"])
    report["compile_plus_first_step_s"] = round(time.time() - t0, 1)
    loss_first = float(aux["loss"])
    assert np.isfinite(loss_first), loss_first

    # --- timed window -----------------------------------------------------
    N_STEPS = 20
    for b in batches[1:3]:
        state, aux = train_step(state, b)
    jax.block_until_ready(aux["loss"])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(N_STEPS):
            state, aux = train_step(state, batches[i % 4])
        jax.block_until_ready(aux["loss"])
        ts.append((time.perf_counter() - t0) / N_STEPS)
    loss_last = float(aux["loss"])
    assert np.isfinite(loss_last), loss_last
    step_ms = min(ts) * 1e3
    report["train_step_ms"] = round(step_ms, 2)
    report["train_examples_per_s"] = round(BATCH / (step_ms / 1e3), 1)
    report["loss_first_step"] = round(loss_first, 4)
    report["loss_after_timing"] = round(loss_last, 4)
    report["loss_decreased"] = bool(loss_last < loss_first)
    print(f"step {step_ms:.1f} ms  ({BATCH / (step_ms / 1e3):.0f} ex/s)  "
          f"loss {loss_first:.3f} -> {loss_last:.3f}", flush=True)

    # --- CE-vs-oracle gate at the full 500k width -------------------------
    print("validating CE rows vs chunked oracle...", flush=True)
    rng = np.random.default_rng(7)
    n_probe = 128
    h = jnp.asarray(rng.normal(size=(n_probe, 1, D)), jnp.float32)
    w = state.params["cls_a_w"]
    b = state.params["cls_a_b"]
    tgt = jnp.asarray(rng.integers(0, N_A, (n_probe, 1)), jnp.int32)
    pad = jnp.full((n_probe, 1), -30.0, jnp.float32)
    got = np.asarray(fused_ce.fused_rec_ce_rows(h, w, b, pad, tgt, N_A)
                     ).reshape(-1)
    v_pad = -(-w.shape[1] // 1024) * 1024
    w_p = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, v_pad - w.shape[1])))
    bm = fused_ce.mask_bias(b, N_A, v_pad)
    want = _chunked_ce_oracle(h.reshape(n_probe, D), w_p, bm, pad, tgt,
                              n_probe).reshape(-1)
    err = float(np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0)))
    report["ce_oracle_max_rel_err"] = err
    assert err < 5e-3, err
    print(f"ce oracle max rel err {err:.2e}", flush=True)

    # --- full-rank eval ---------------------------------------------------
    print("full-rank eval...", flush=True)
    convolve_eval, rank_step = ranker.make_eval_fns(cfg, spec, graphs)
    hi = convolve_eval(state.params)
    ra, rb = ranker.evaluate_split(state.params, hi, evald, rank_step, cfg,
                                   mode="full")
    t0 = time.perf_counter()
    ra, rb = ranker.evaluate_split(state.params, hi, evald, rank_step, cfg,
                                   mode="full")
    dt = time.perf_counter() - t0
    n_ex = len(ra) + len(rb)
    report["eval_full_rank_examples_per_s"] = round(n_ex / dt, 1)
    report["eval_full_rank_items_per_s"] = round(
        (len(ra) * N_A + len(rb) * N_B) / dt, 0)
    assert all(r >= 1 for r in list(ra) + list(rb))
    print(f"full-rank {n_ex / dt:.0f} ex/s "
          f"({(len(ra) * N_A + len(rb) * N_B) / dt / 1e6:.0f}M items/s)",
          flush=True)

    from bench.details import merge
    details_path = merge({"scaled_e2e": report})
    print(f"merged scaled_e2e into {details_path}", flush=True)
    return report


if __name__ == "__main__":
    run()
