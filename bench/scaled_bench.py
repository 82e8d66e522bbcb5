"""Scaled-synthetic benchmark: 10M-item vocab, d=512 (BASELINE.json cfg 5).

A 10M-row f32 table is ~20 GB — it cannot live on one chip, so this bench
does what a capacity plan needs:

1. **Measured per-op throughput on the real chip** at one device's vocab
   shard of the scaled config, with EVERY timed kernel output validated
   against a chunked XLA oracle first (round-3 verdict: the previous
   version timed an unvalidated miscompile at the 2^31-byte operand
   boundary and recorded 344 PFLOP/s fiction).  Two classifier variants:
     * f32 at V = 2^19 (the largest f32 shard the kernel accepts at d=512:
       d*V*4 = 2^30 B; 2^20 would reach the 2^31-byte addressing limit and
       is now rejected by ops/fused_ce._pick_blocks) — value AND grads
       validated.
     * bf16-at-rest at V = 2^20 (the production scaled config,
       cfg.classifier_dtype=auto: half the bytes per element lets a shard
       twice as large stay under the limit) — forward validated against a
       vocab-chunked logsumexp oracle; the backward runs the identical
       block configuration as the f32-validated case.
   Ops: embedding gather, fused-CE fwd+bwd over the shard, full-rank
   scoring over the shard.  These are exactly the per-device ops of the
   sharded regime (model-axis collectives move [B, d] activations,
   negligible next to the [d, V/M] compute).

2. **Projection to 10M items over M devices**: measured bf16 time scaled
   by (10M / M) / V, reported for M = 8/16/32.

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

from typing import Dict

import numpy as np

from bench.kernel_bench import _timeit

V_FULL = 10_000_000
D = 512
V_F32 = 1 << 19           # largest f32 shard: d*V*4 = 2^30 B
V_BF16 = 1 << 20          # bf16-at-rest shard: d*V*2 = 2^30 B
B, R = 512, 20            # train CE shapes
B_RANK = 256              # full-rank eval rows per call (keeps [B, V] sane)
HBM_PER_CHIP = 16e9       # v5e


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


def _chunked_ce_oracle(h2, w, b_masked, pad, tgt, rows, v_chunk=1 << 16):
    """(lse - tlog) for ``rows`` leading rows, streaming vocab chunks so the
    full logits tensor never materializes.  f32 compute at highest matmul
    precision regardless of w's storage dtype."""
    import jax
    import jax.numpy as jnp

    hc = h2[:rows].astype(jnp.float32)
    v = w.shape[1]

    @jax.jit
    def chunk_stats(ws, bs, tgt_lo):
        logits = jax.lax.dot_general(
            hc, ws.astype(jnp.float32), (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST) + bs
        m = jnp.max(logits, axis=1, keepdims=True)
        se = jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True)
        t_rel = tgt[:rows] - tgt_lo
        inside = (t_rel >= 0) & (t_rel < ws.shape[1])
        tl = jnp.take_along_axis(logits, jnp.clip(t_rel, 0, ws.shape[1] - 1),
                                 axis=1)
        return m, se, jnp.where(inside, tl, 0.0)

    m_run = np.full((rows, 1), -1e30)
    se_run = np.zeros((rows, 1))
    tlog = np.zeros((rows, 1))
    for s in range(0, v, v_chunk):
        m_c, se_c, tl_c = chunk_stats(w[:, s:s + v_chunk],
                                      b_masked[:, s:s + v_chunk], s)
        m_c, se_c = np.asarray(m_c, np.float64), np.asarray(se_c, np.float64)
        m_new = np.maximum(m_run, m_c)
        se_run = se_run * np.exp(m_run - m_new) + se_c * np.exp(m_c - m_new)
        m_run = m_new
        tlog += np.asarray(tl_c, np.float64)
    p = np.asarray(pad[:rows], np.float64)
    m_new = np.maximum(m_run, p)
    se_run = se_run * np.exp(m_run - m_new) + np.exp(p - m_new)
    lse = m_new + np.log(se_run)
    return (lse - tlog)[:, 0]


def _measure_ce(key, rng, v, w_dtype, validate_grads: bool) -> Dict:
    """Fused-CE fwd+bwd over one [d, V] shard; returns timing + validation
    evidence.  All timed outputs are validated first."""
    import jax
    import jax.numpy as jnp
    from c2dsr_tpu.ops import fused_ce

    w = (jax.random.normal(key, (D, v), jnp.float32) * 0.02).astype(w_dtype)
    b = jnp.zeros((v,), jnp.float32)
    h = jax.random.normal(key, (B, R, D), jnp.float32)
    pad = jnp.zeros((B, R, 1), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, v - 1024, size=(B, R)), jnp.int32)
    n_real = v - 1024

    res: Dict = {"v": v, "w_dtype": jnp.dtype(w_dtype).name}

    # ---- forward validation (always) --------------------------------------
    # h/w MUST be jit ARGUMENTS: closing over them embeds the GiB-scale
    # classifier as an HLO constant, which hangs the XLA/Mosaic compile
    # (observed: >14 min stuck in backend_compile; the round-3 "third run
    # hung >9 min" had the same cause)
    rows_fn = jax.jit(lambda hh, ww: fused_ce.fused_rec_ce_rows(
        hh, ww, b, pad, tgt, n_real))
    got = np.asarray(rows_fn(h, w)).reshape(B * R)
    n_check = 256
    bm = fused_ce.mask_bias(b, n_real, v)
    want = _chunked_ce_oracle(h.reshape(B * R, D), w, bm,
                              pad.reshape(B * R, 1), tgt.reshape(B * R, 1),
                              n_check)
    mask = (tgt.reshape(-1)[:n_check] != n_real)
    err = float(np.max(np.abs((got[:n_check] - want) * np.asarray(mask))))
    assert err < 5e-2, f"scaled fused_ce fwd mismatch at V={v}: {err}"
    res["fwd_max_abs_err"] = round(err, 6)

    # ---- backward ---------------------------------------------------------
    grad = jax.jit(jax.grad(
        lambda hh, ww: jnp.sum(fused_ce.fused_rec_ce_rows(
            hh, ww, b, pad, tgt, n_real)), argnums=(0, 1)))
    if validate_grads:
        from c2dsr_tpu.ops import losses

        @jax.jit
        def g_oracle(hc, pc, tc, wf):
            # wf must be an ARGUMENT, not a closure capture: a closed-over
            # GiB-scale array becomes an embedded HLO constant and hangs
            # the compile (same trap as rows_fn above)
            def f(hh, ww):
                logits = jnp.einsum(
                    "brd,dv->brv", hh, ww,
                    preferred_element_type=jnp.float32) + b
                return jnp.sum(losses.rec_ce_row_losses(logits, pc, tc,
                                                        n_real))
            return jax.grad(f, argnums=(0, 1))(hc, wf)

        dh, dw = grad(h, w)
        dh = np.asarray(dh)
        dw = np.asarray(dw, np.float32)
        wf = w.astype(jnp.float32)
        dh_err, dw_acc = 0.0, np.zeros_like(dw)
        for s in range(0, B, 64):
            dh_c, dw_c = g_oracle(h[s:s + 64], pad[s:s + 64],
                                  tgt[s:s + 64], wf)
            dh_err = max(dh_err, float(np.max(np.abs(
                dh[s:s + 64] - np.asarray(dh_c)))))
            dw_acc += np.asarray(dw_c, np.float32)
        dw_err = float(np.max(np.abs(dw - dw_acc)))
        assert dh_err < 5e-2 and dw_err < 5e-2, (
            f"scaled fused_ce grad mismatch at V={v}: {dh_err} / {dw_err}")
        res["dh_max_abs_err"] = round(dh_err, 6)
        res["dw_max_abs_err"] = round(dw_err, 6)

    t_ce, t_ce_med = _timeit(lambda: grad(h, w), n=4, reps=4)
    flops = 3 * 2.0 * B * R * D * v
    res["fused_ce_fwd_bwd_ms"] = round(t_ce * 1e3, 2)
    res["fused_ce_fwd_bwd_ms_median"] = round(t_ce_med * 1e3, 2)
    res["fused_ce_tflops"] = round(flops / t_ce / 1e12, 1)
    res["validated"] = True
    return res


def run() -> Dict:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    results: Dict = {}

    # --- embedding gather (the per-device half of the sharded lookup) ------
    tbl = jax.random.normal(key, (V_BF16, D), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V_BF16, size=(B, 15)), jnp.int32)
    want = np.asarray(tbl)[np.asarray(ids)]
    lookup = jax.jit(lambda t, i: t[i])
    got = np.asarray(lookup(tbl, ids))
    assert np.array_equal(got, want), "lookup mismatch"
    t, t_med = _timeit(lambda: lookup(tbl, ids), n=20)
    results["lookup_rows_per_s"] = round(B * 15 / t, 0)
    results["lookup_us"] = round(t * 1e6, 1)
    results["lookup_us_median"] = round(t_med * 1e6, 1)

    # --- fused CE over the shard (fwd + bwd, train shapes) ------------------
    results["fused_ce_f32"] = _measure_ce(key, rng, V_F32, jnp.float32,
                                          validate_grads=True)
    results["fused_ce_bf16w"] = _measure_ce(key, rng, V_BF16, jnp.bfloat16,
                                            validate_grads=False)

    # --- full-rank scoring over the shard (bf16-at-rest classifier) ---------
    w = (jax.random.normal(key, (D, V_BF16), jnp.float32) * 0.02
         ).astype(jnp.bfloat16)
    b = jnp.zeros((V_BF16,), jnp.float32)
    hv = jax.random.normal(key, (B_RANK, D), jnp.float32)
    gt = jnp.asarray(rng.integers(0, V_BF16, size=(B_RANK,)), jnp.int32)

    @jax.jit
    def rank(hv, w, b, gt):
        # XLA fuses matmul + compare + reduce: the [B, V] score block never
        # materializes in HBM
        scores = jnp.matmul(hv.astype(w.dtype), w,
                            preferred_element_type=jnp.float32) + b
        gs = jnp.take_along_axis(scores, gt[:, None], axis=1)
        return jnp.sum(scores > gs, axis=1) + 1

    # validate ranks on a 32-row subset against a vocab-chunked count
    got_r = np.asarray(rank(hv, w, b, gt))
    score_chunk = jax.jit(lambda ws: jnp.matmul(
        hv[:32].astype(jnp.bfloat16), ws,
        preferred_element_type=jnp.float32) + 0.0)
    chunks = []
    for s in range(0, V_BF16, 1 << 17):
        chunks.append(np.asarray(score_chunk(w[:, s:s + (1 << 17)])))
    all_scores = np.concatenate(chunks, axis=1) + np.asarray(b)
    gs_np = np.take_along_axis(all_scores, np.asarray(gt[:32])[:, None], 1)
    want_r = (all_scores > gs_np).sum(axis=1) + 1
    # chunked and whole-matmul f32 accumulation orders can flip exact ties;
    # allow a handful of boundary flips out of 2^20 candidates
    rank_dev = int(np.max(np.abs(got_r[:32].astype(np.int64) - want_r)))
    assert rank_dev <= 8, f"full_rank mismatch: max rank delta {rank_dev}"
    del all_scores, chunks

    t_rk, t_rk_med = _timeit(lambda: rank(hv, w, b, gt), n=8)
    results["full_rank_ms"] = round(t_rk * 1e3, 3)
    results["full_rank_ms_median"] = round(t_rk_med * 1e3, 3)
    results["full_rank_items_per_s"] = round(B_RANK * V_BF16 / t_rk, 0)
    results["full_rank_validated"] = True

    # --- projections to the 10M-item config ---------------------------------
    # Derived from the bf16-at-rest measurements (the production scaled
    # config): per-device time scales with the device's vocab slice.
    t_ce_bf16 = results["fused_ce_bf16w"]["fused_ce_fwd_bwd_ms"] / 1e3
    proj = []
    for m in (8, 16, 32):
        scale = (V_FULL / m) / V_BF16
        proj.append({
            "shards": m,
            "vocab_per_device": V_FULL // m,
            "classifier": "bf16_at_rest",
            "ce_fwd_bwd_ms": round(t_ce_bf16 * 1e3 * scale, 2),
            "full_rank_ms_per_256": round(t_rk * 1e3 * scale, 2),
        })

    return {
        "config": {"v_full": V_FULL, "d": D, "v_f32": V_F32,
                   "v_bf16": V_BF16, "batch": B, "len_rec": R},
        "measured_per_shard": results,
        "projected_10m": proj,
        "memory_plan": memory_plan(),
    }


if __name__ == "__main__":
    import json
    print(json.dumps(run(), indent=1))
