"""Scratch experiment: blocked-SpMM chunk-size tuning on the real chip.

At e_block=128 the FK share graph packs into ~1,400 chunks -> ~1,400
sequential grid steps per call, each doing one tiny [R,E]@[E,d] matmul —
suspected grid-dispatch-bound.  Larger e_block cuts grid steps linearly
at the price of more padded edges (extra gather traffic).  This times
fwd and fwd+bwd across (r_block, e_block, gather_dtype) at FK scale to
pick production defaults.  Run: python -m bench.spmm_experiments
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


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
    from bench import fk_graph
    from c2dsr_tpu.ops import spmm_pallas

    g = fk_graph.load_or_build()
    spec = fk_graph.spec()
    n = spec.n_item
    rows, cols, vals = g["s_rows"], g["s_cols"], g["s_vals"]
    nnz = rows.shape[0]
    rng = np.random.default_rng(0)
    d = 128
    h = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)

    print(f"FK share graph: n={n} nnz={nnz}")
    oracle = None
    for r_block in (256, 512):
        for e_block in (128, 256, 512, 1024):
            bk_f = spmm_pallas.prep(rows, cols, vals, n, r_block, e_block)
            bk_b = spmm_pallas.prep(cols, rows, vals, n, r_block, e_block)
            n_chunk = int(bk_f.rb.shape[0])
            pad_frac = n_chunk * e_block / nnz - 1.0
            for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
                f = spmm_pallas.make_blocked_spmm(bk_f, bk_b,
                                                  gather_dtype=dt)
                fwd = jax.jit(f)
                out = np.asarray(fwd(h))
                if oracle is None:
                    oracle = out
                err = float(np.max(np.abs(out - oracle)))
                if err > (1e-5 if dt == jnp.float32 else 0.05):
                    print(f"  r={r_block} e={e_block} {tag}: WRONG err={err}")
                    continue
                t_f = _timeit(fwd, h)
                grad = jax.jit(jax.grad(lambda x: jnp.sum(f(x) ** 2)))
                t_fb = _timeit(grad, h)
                print(f"  r={r_block:4d} e={e_block:5d} {tag:4s} "
                      f"chunks={n_chunk:5d} pad={pad_frac:5.0%} "
                      f"fwd={t_f*1e6:7.1f}us fwd+bwd={t_fb*1e6:7.1f}us "
                      f"err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
