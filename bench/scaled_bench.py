"""Scaled-synthetic benchmark: 10M-item vocab, d=512 (BASELINE.json cfg 5).

A 10M-row f32 table is ~20 GB — it cannot live on one chip, so this bench
does what a capacity plan needs:

1. **Measured per-op throughput on the real chip** at the largest feasible
   vocab shard (2^20 rows x d=512 — i.e. one device's shard of a 10M-row
   table split ~10 ways; beyond that the [d, V] classifier operand crosses
   the 2^31-byte addressing limit and the kernel is rejected, see
   ops/fused_ce._pick_blocks): embedding gather, fused-CE fwd+bwd over the
   shard, full-rank scoring over the shard.  These are exactly the per-device ops of the sharded regime
   (model-axis collectives move [B, d] activations, negligible next to
   the [d, V/M] compute), so per-device shard time IS the step component.

2. **Projection to 10M items over M devices**: measured time scaled by
   (10M / M) / V_MEAS, reported for M = 8/16/32.

3. **Per-device memory table** for the full config (3 embedding tables +
   2 classifiers + AMSGrad moments), f32 and bf16-param variants — shows
   which slice sizes fit v5e (16 GB/chip).

The sharded-execution correctness of the same regime runs on the fake CPU
pod in tests/test_scaled.py (shard-local init, masked + all-to-all lookup,
vocab-sharded CE/full-rank, a2a SpMM at 1M rows).

Run via ``python bench.py --scaled`` (merges a "scaled" section into
BENCH_DETAILS.json).
"""

from __future__ import annotations

import time
from typing import Dict

import numpy as np

V_FULL = 10_000_000
D = 512
V_MEAS = 1 << 20          # 1,048,576-row shard measured on the real chip
                          # (d*V*4 = 2^31 B, the operand addressing limit)
B, R = 512, 20            # train CE shapes
B_RANK = 256              # full-rank eval rows per call (keeps [B, V] sane)
HBM_PER_CHIP = 16e9       # v5e


def _timeit(fn, n=8, warmup=2):
    """fn must be a jitted callable taking DEVICE-ARRAY ARGUMENTS bound via
    functools.partial-style lambdas over device arrays passed as args —
    never closures over multi-GB tables (a captured table becomes a baked
    constant shipped to the remote compiler)."""
    import jax
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def memory_plan() -> list:
    """Per-device bytes of the full 10M-item config vs shard count."""
    rows = []
    n_tables = 3                      # shared / A / B embedding tables
    n_cls = 2                         # classifier_a / classifier_b
    for dtype_bytes, tag in ((4, "f32"), (2, "bf16_params")):
        params = (n_tables + n_cls) * V_FULL * D * dtype_bytes
        # AMSGrad carries mu/nu/nu_max in f32 regardless
        opt = (n_tables + n_cls) * V_FULL * D * 4 * 3
        total = params + opt
        for m in (8, 16, 32, 64):
            rows.append({
                "params": tag, "shards": m,
                "per_device_gb": round(total / m / 1e9, 2),
                "fits_v5e": bool(total / m < HBM_PER_CHIP * 0.9),
            })
    return rows


def run() -> Dict:
    import jax
    import jax.numpy as jnp
    from c2dsr_tpu.ops import fused_ce

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # one device's vocab shard at the scaled config
    w = jax.random.normal(key, (D, V_MEAS), jnp.float32) * 0.02
    b = jnp.zeros((V_MEAS,), jnp.float32)
    tbl = jax.random.normal(key, (V_MEAS, D), jnp.float32)

    results = {}

    # --- embedding gather (the per-device half of the sharded lookup) ------
    ids = jnp.asarray(rng.integers(0, V_MEAS, size=(B, 15)), jnp.int32)
    lookup = jax.jit(lambda t, i: t[i])
    t = _timeit(lambda: lookup(tbl, ids), n=20)
    results["lookup_rows_per_s"] = round(B * 15 / t, 0)
    results["lookup_us"] = round(t * 1e6, 1)

    # --- fused CE over the shard (fwd + bwd, train shapes) ------------------
    h = jax.random.normal(key, (B, R, D), jnp.float32)
    pad = jnp.zeros((B, R, 1), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, V_MEAS - 1024, size=(B, R)), jnp.int32)
    grad = jax.jit(jax.grad(
        lambda hh, ww, bb, pp, tt: jnp.sum(fused_ce.fused_rec_ce_rows(
            hh, ww, bb, pp, tt, V_MEAS - 1024)), argnums=(0, 1)))
    t_ce = _timeit(lambda: grad(h, w, b, pad, tgt), n=4)
    flops = 3 * 2.0 * B * R * D * V_MEAS
    results["fused_ce_fwd_bwd_ms"] = round(t_ce * 1e3, 2)
    results["fused_ce_tflops"] = round(flops / t_ce / 1e12, 1)

    # --- full-rank scoring over the shard -----------------------------------
    hv = jax.random.normal(key, (B_RANK, D), jnp.float32)
    gt = jnp.asarray(rng.integers(0, V_MEAS, size=(B_RANK,)), jnp.int32)

    @jax.jit
    def rank(hv, w, b, gt):
        # XLA fuses matmul + compare + reduce: the [B, V] score block never
        # materializes in HBM
        scores = hv @ w + b
        gs = jnp.take_along_axis(scores, gt[:, None], axis=1)
        return jnp.sum(scores > gs, axis=1) + 1

    t_rk = _timeit(lambda: rank(hv, w, b, gt), n=8)
    results["full_rank_ms"] = round(t_rk * 1e3, 3)
    results["full_rank_items_per_s"] = round(B_RANK * V_MEAS / t_rk, 0)

    # --- projections to the 10M-item config ---------------------------------
    proj = []
    for m in (8, 16, 32):
        scale = (V_FULL / m) / V_MEAS
        row = {
            "shards": m,
            "vocab_per_device": V_FULL // m,
            "ce_fwd_bwd_ms": round(t_ce * 1e3 * scale, 2),
            "full_rank_ms_per_256": round(t_rk * 1e3 * scale, 2),
        }
        if (V_FULL // m) * D * 4 > 2 ** 31:
            # f32 [d, V/m] classifier operand would cross the 2^31-byte
            # addressing limit — needs a bf16-at-rest classifier or two
            # vocab-chunked kernel calls per shard
            row["needs_bf16_classifier_or_chunking"] = True
        proj.append(row)

    return {
        "config": {"v_full": V_FULL, "d": D, "v_measured": V_MEAS,
                   "batch": B, "len_rec": R},
        "measured_per_shard": results,
        "projected_10m": proj,
        "memory_plan": memory_plan(),
    }


if __name__ == "__main__":
    import json
    print(json.dumps(run(), indent=1))
