"""Per-kernel roofline microbenchmarks (SURVEY.md section 7.9).

Times each hot kernel in isolation at Food-Kitchen scale and reports the
achieved FLOP/s and bytes/s against chip peaks, substantiating the
"kernels at speed-of-light per chip" north-star clause (BASELINE.json):

  * fused_ce      — flash-style fused linear+softmax+CE (ops/fused_ce.py),
                    fwd and fwd+bwd.  Compute-bound: streams the [d, V]
                    classifier through the MXU.
  * blocked SpMM  — Pallas gather+MXU segment-sum (ops/spmm_pallas.py).
                    HBM-bound: one [nnz, d] gather + [n, d] write per hop.
  * fused encoder — whole-tower attention kernel (ops/encoder_pallas.py),
                    fwd and fwd+bwd (recompute backward), with dropout.
  * lookup        — embedding gather at train shapes.  HBM-bound.

Peaks default to TPU v5e (197 TFLOP/s bf16 MXU, 819 GB/s HBM); override
with C2DSR_PEAK_TFLOPS / C2DSR_PEAK_GBPS when running elsewhere.

Run via ``python bench.py --kernels`` (merges a "kernels" section into
BENCH_DETAILS.json) or standalone: ``python -m bench.kernel_bench``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np

PEAK_TFLOPS = float(os.environ.get("C2DSR_PEAK_TFLOPS", 197.0))   # v5e bf16
PEAK_GBPS = float(os.environ.get("C2DSR_PEAK_GBPS", 819.0))       # v5e HBM


def _timeit(fn, n=30, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def _entry(name, seconds, flops, bytes_):
    return {
        "kernel": name,
        "time_us": round(seconds * 1e6, 1),
        "tflops": round(flops / seconds / 1e12, 2),
        "gbps": round(bytes_ / seconds / 1e9, 1),
        "pct_peak_flops": round(100 * flops / seconds / (PEAK_TFLOPS * 1e12),
                                1),
        "pct_peak_bw": round(100 * bytes_ / seconds / (PEAK_GBPS * 1e9), 1),
    }


def bench_fused_ce(B=512, R=20, d=128, v_p=64512):
    """The rec-loss CE: [B, R, d] rows against a [d, V] classifier."""
    import jax
    import jax.numpy as jnp
    from c2dsr_tpu.ops import fused_ce

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(B, R, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(d, v_p)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.normal(size=(v_p,)) * 0.02, jnp.float32)
    pad = jnp.asarray(rng.normal(size=(B, R, 1)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, v_p - 1024, size=(B, R)), jnp.int32)
    n_real = v_p - 1024

    fwd = jax.jit(lambda: fused_ce.fused_rec_ce_rows(h, w, b, pad, tgt,
                                                     n_real))
    t_fwd = _timeit(fwd)
    flops_fwd = 2.0 * B * R * d * v_p
    bytes_fwd = 4.0 * (v_p * d + B * R * d + v_p + 2 * B * R)

    grad = jax.jit(jax.grad(
        lambda hh, ww: jnp.sum(fused_ce.fused_rec_ce_rows(
            hh, ww, b, pad, tgt, n_real)), argnums=(0, 1)))
    t_full = _timeit(lambda: grad(h, w))
    # bwd = dh (n,v)@(v,d) + dw (d,n)@(n,v) on top of the fwd recompute
    flops_full = 3 * flops_fwd
    bytes_full = 3 * bytes_fwd
    return [_entry("fused_ce_fwd", t_fwd, flops_fwd, bytes_fwd),
            _entry("fused_ce_fwd_bwd", t_full, flops_full, bytes_full)]


def bench_spmm(d=128):
    """One blocked-SpMM hop over the FK-scale shared graph."""
    import jax
    import jax.numpy as jnp
    from c2dsr_tpu.graph.build import CooGraph
    from c2dsr_tpu.ops import spmm, spmm_pallas

    from bench import fk_graph

    g = fk_graph.load_or_build()
    graph = spmm.device_graph(CooGraph(g["s_rows"], g["s_cols"], g["s_vals"],
                                       int(g["n"])))
    nnz = int(g["s_rows"].shape[0])
    n = int(g["n"])
    h = jnp.asarray(np.random.default_rng(1).normal(size=(n, d)), jnp.float32)

    step = spmm_pallas.make_blocked_spmm(graph.bk_fwd, graph.bk_bwd, False)
    fwd = jax.jit(lambda: step(h))
    t = _timeit(fwd)
    flops = 2.0 * nnz * d
    # gather reads h rows + writes [nnz, d], kernel reads it back + writes out
    bytes_ = 4.0 * (3 * nnz * d + 2 * n * d) + 8.0 * nnz
    e = _entry("blocked_spmm", t, flops, bytes_)
    e["nnz"] = nnz

    import jax.numpy as jnp2
    step16 = spmm_pallas.make_blocked_spmm(graph.bk_fwd, graph.bk_bwd, False,
                                           gather_dtype=jnp2.bfloat16)
    t16 = _timeit(jax.jit(lambda: step16(h)))
    bytes16 = 2.0 * 3 * nnz * d + 4.0 * 2 * n * d + 8.0 * nnz
    e16 = _entry("blocked_spmm_bf16_gather", t16, flops, bytes16)
    e16["nnz"] = nnz
    return [e, e16]


def bench_encoder(B=512, L=15, d=128, n_layers=1, n_head=1):
    """Fused attention tower at train shapes (with dropout, like training)."""
    import jax
    import jax.numpy as jnp
    from c2dsr_tpu.config import Config
    from c2dsr_tpu.model import params as params_mod
    from c2dsr_tpu.ops import encoder_pallas as encp

    cfg = Config(d_latent=d, n_attn=n_layers, n_head=n_head)
    p = params_mod.init_encoder_params(jax.random.PRNGKey(0), cfg, L)
    rng = np.random.default_rng(2)
    seq = jnp.asarray(rng.integers(0, 100, size=(B, L)), jnp.int32)
    pos = jnp.tile(jnp.arange(1, L + 1, dtype=jnp.int32)[None], (B, 1))
    h = jnp.asarray(rng.normal(size=(B, L, d)), jnp.float32)
    key = jax.random.PRNGKey(3)

    def run(hh):
        return encp.encode_sequence_fused(
            seq, hh, pos, p, idx_pad=10**6, n_head=n_head, dropout=0.2,
            rng=key, invert_padding_mask=False)

    lp = -(-L // 16) * 16
    flops = 2.0 * B * lp * d * (4 * d + 2 * lp) * n_layers
    bytes_ = 4.0 * (2 * B * lp * d + 12 * n_layers * d * d)
    t_fwd = _timeit(jax.jit(lambda: run(h)))

    grad = jax.jit(jax.grad(lambda hh: jnp.sum(run(hh))))
    t_full = _timeit(lambda: grad(h))
    return [_entry("fused_encoder_fwd", t_fwd, flops, bytes_),
            _entry("fused_encoder_fwd_bwd", t_full, 3 * flops, 3 * bytes_)]


def bench_lookup(n_p=64512, d=128, B=512, L=15):
    """Embedding gather at train shapes (the 3-table lookup is 6 of these
    per step)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    tbl = jnp.asarray(rng.normal(size=(n_p, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, n_p, size=(B, L)), jnp.int32)
    fn = jax.jit(lambda: tbl[ids])
    t = _timeit(fn, n=100)
    bytes_ = 4.0 * (2 * B * L * d) + 4.0 * B * L
    return [_entry("embed_lookup", t, 0.0, bytes_)]


def run() -> Dict:
    import jax
    out = {
        "device": str(jax.devices()[0]),
        "peaks": {"tflops_bf16": PEAK_TFLOPS, "hbm_gbps": PEAK_GBPS},
        "results": (bench_fused_ce() + bench_spmm() + bench_encoder()
                    + bench_lookup()),
    }
    return out


if __name__ == "__main__":
    print(json.dumps(run(), indent=1))
