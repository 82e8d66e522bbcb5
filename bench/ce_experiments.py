"""Scratch experiments for the fused-CE forward's VPU bound.

The forward runs at ~28% MFU while the merged backward reaches ~73% of
peak hardware FLOP/s — the forward's flash bookkeeping (exp + max/sum
reductions + one-hot target match per logit) outweighs its single matmul.
This script times kernel VARIANTS in isolation on the real chip to find
which per-element ops actually cost time:

  base        current _fwd_kernel (match + running max/sum + exp)
  nomatch     target gather removed (measures the iota/compare/where cost)
  exp2        h/b pre-scaled by log2(e); exp -> exp2 (one fewer vmul/logit
              if Mosaic lowers exp as exp2(x*c))
  bf16exp     exp computed on a bfloat16 logits copy (packed VPU test)
  matmulonly  matmul + plain block sum (no exp): the MXU+reduce floor

Results guide ops/fused_ce.py tuning; this file is an experiment harness,
not part of the production path.  Run: python -m bench.ce_experiments
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
LOG2E = 1.4426950408889634


def _dot(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mk_kernel(variant: str, bv: int):
    def kernel(h_ref, w_ref, b_ref, tgt_ref, lse_ref, tlog_ref,
               m_sc, s_sc, t_sc):
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            m_sc[:] = jnp.full_like(m_sc, NEG)
            s_sc[:] = jnp.zeros_like(s_sc)
            t_sc[:] = jnp.zeros_like(t_sc)

        logits = _dot(h_ref[:], w_ref[:]) + b_ref[:]

        if variant in ("base", "exp2", "bf16exp"):
            if variant != "nomatch":
                col = j * bv + jax.lax.broadcasted_iota(
                    jnp.int32, logits.shape, 1)
                match = col == tgt_ref[:]
                t_sc[:] = t_sc[:] + jnp.sum(
                    jnp.where(match, logits, 0.0), axis=1, keepdims=True)
        if variant == "matmulonly":
            s_sc[:] = s_sc[:] + jnp.sum(logits, axis=1, keepdims=True)

            @pl.when(j == nj - 1)
            def _():
                lse_ref[:] = s_sc[:]
                tlog_ref[:] = t_sc[:]
            return

        m_new = jnp.maximum(m_sc[:], jnp.max(logits, axis=1, keepdims=True))
        if variant == "exp2":
            # h/b pre-scaled by log2e outside; exp2 instead of exp
            s_sc[:] = (s_sc[:] * jnp.exp2(m_sc[:] - m_new)
                       + jnp.sum(jnp.exp2(logits - m_new), axis=1,
                                 keepdims=True))
        elif variant == "bf16exp":
            e = jnp.exp((logits - m_new).astype(jnp.bfloat16))
            s_sc[:] = (s_sc[:] * jnp.exp(m_sc[:] - m_new)
                       + jnp.sum(e.astype(jnp.float32), axis=1,
                                 keepdims=True))
        else:
            s_sc[:] = (s_sc[:] * jnp.exp(m_sc[:] - m_new)
                       + jnp.sum(jnp.exp(logits - m_new), axis=1,
                                 keepdims=True))
        m_sc[:] = m_new

        @pl.when(j == nj - 1)
        def _():
            lse_ref[:] = m_sc[:] + jnp.log(s_sc[:])
            tlog_ref[:] = t_sc[:]

    return kernel


def variant_fn(variant, n, d, v, bn, bv):
    kernel = _mk_kernel("nomatch" if variant == "nomatch" else variant, bv)

    if variant == "nomatch":
        kernel = _mk_kernel("nomatch", bv)

    @jax.jit
    def f(h, w, b, tgt):
        return pl.pallas_call(
            kernel,
            grid=(n // bn, v // bv),
            in_specs=[
                pl.BlockSpec((bn, d), lambda i, j: (i, 0)),
                pl.BlockSpec((d, bv), lambda i, j: (0, j)),
                pl.BlockSpec((1, bv), lambda i, j: (0, j)),
                pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
                pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, 1), jnp.float32),
                jax.ShapeDtypeStruct((n, 1), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((bn, 1), jnp.float32)] * 3,
            cost_estimate=pl.CostEstimate(
                flops=2 * n * v * d,
                bytes_accessed=4 * (n * d + d * v),
                transcendentals=n * v),
        )(h, w, b, tgt)

    return f


def _timeit(fn, *args, n=20, reps=4):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / n)
    return min(ts)


def main():
    N, D, V = 10240, 128, 64512
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, V)) * 0.02, jnp.float32)
    b = jnp.zeros((1, V), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, V, size=(N, 1)), jnp.int32)
    flops = 2.0 * N * V * D

    # oracle lse from the production kernel (itself validated in
    # bench/kernel_bench.py against a chunked XLA oracle)
    from c2dsr_tpu.ops import fused_ce
    pad = jnp.full((N, 1), -1e9, jnp.float32)
    lse_o, tlog_o = jax.jit(
        lambda h, w: fused_ce.fused_ce(h, w, b, pad, tgt))(h, w)
    lse_o = np.asarray(lse_o)

    for bn, bv in ((512, 1024), (256, 1024), (1024, 1024), (2048, 1024),
                   (512, 3584), (512, 9216)):
        if N % bn or V % bv:
            continue
        for variant in ("base", "nomatch", "exp2", "bf16exp", "matmulonly"):
            try:
                f = variant_fn(variant, N, D, V, bn, bv)
                hh = h * LOG2E if variant == "exp2" else h
                lse_v = np.asarray(f(hh, w, b, tgt)[0])
                if variant == "base":
                    err = float(np.max(np.abs(lse_v - lse_o)))
                    assert err < 1e-4, f"WRONG OUTPUT err={err}"
                elif variant == "exp2":
                    err = float(np.max(np.abs(lse_v * float(np.log(2.0))
                                              - lse_o)))
                    assert err < 1e-2, f"WRONG OUTPUT err={err}"
                t = _timeit(f, hh, w, b, tgt)
                # a timed value faster than one W stream (bytes/peak-BW) is
                # physically impossible -> the device returned without
                # executing (observed on this tunnel); flag loudly
                floor = (D * V * 4) / (819e9)
                flag = "  << UNPHYSICAL" if t < floor else ""
                print(f"bn={bn:5d} bv={bv:5d} {variant:11s} "
                      f"{t*1e6:8.1f} us  {flops/t/1e12:6.1f} TF/s{flag}",
                      flush=True)
            except Exception as e:  # noqa: BLE001 - experiment harness
                print(f"bn={bn:5d} bv={bv:5d} {variant:11s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
