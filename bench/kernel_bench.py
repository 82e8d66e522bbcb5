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


def _timeit(fn, n=30, warmup=3, reps=5):
    """(min, median) of per-call time over ``reps`` pipelined batches of
    ``n`` calls each.  Pipelining inside a batch amortizes dispatch (true
    steady-state throughput); repeating batches and reporting min + median
    exposes timing noise (round-3 verdict: a one-shot mean varied 10x
    between runs)."""
    import jax
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / n)
    ts.sort()
    return ts[0], ts[len(ts) // 2]


def _entry(name, seconds, flops, bytes_, median=None, validated=None):
    e = {
        "kernel": name,
        "time_us": round(seconds * 1e6, 1),
        "tflops": round(flops / seconds / 1e12, 2),
        "gbps": round(bytes_ / seconds / 1e9, 1),
        "pct_peak_flops": round(100 * flops / seconds / (PEAK_TFLOPS * 1e12),
                                1),
        "pct_peak_bw": round(100 * bytes_ / seconds / (PEAK_GBPS * 1e9), 1),
    }
    if median is not None:
        e["time_us_median"] = round(median * 1e6, 1)
    if validated is not None:
        e["validated"] = validated
    return e


def _validate_ce_rows(h, w, b, pad, tgt, n_real, rows_fn, chunk=64):
    """Max |fused - XLA-oracle| over all CE row terms, oracle computed in
    chunks so the full logits tensor never materializes at once.  The
    oracle is fed the SAME w dtype (bf16 rounding is the variant's defined
    numerics; this check catches kernel miscompiles, not rounding)."""
    import jax
    import jax.numpy as jnp
    from c2dsr_tpu.ops import losses

    got = np.asarray(rows_fn())
    wf = w.astype(jnp.float32)

    @jax.jit
    def oracle_chunk(hc, pc, tc):
        logits = jnp.einsum("brd,dv->brv", hc, wf,
                            preferred_element_type=jnp.float32) + b
        return losses.rec_ce_row_losses(logits, pc, tc, n_real)

    errs = []
    for s in range(0, h.shape[0], chunk):
        want = np.asarray(oracle_chunk(h[s:s + chunk], pad[s:s + chunk],
                                       tgt[s:s + chunk]))
        errs.append(np.max(np.abs(got[s:s + chunk] - want)))
    return float(max(errs))


def bench_fused_ce(B=512, R=20, d=128, v_p=65536):
    # v_p is a 2048-multiple so the benched forward runs the PRODUCTION
    # block config (bv=2048): with the default vocab_pad_multiple=2048 the
    # real per-domain classifiers (FK: 30720/36864) all take that path;
    # 64512 (a 1024-multiple) would measure the bv=1024 variant instead.
    """The rec-loss CE: [B, R, d] rows against a [d, V] classifier, f32 and
    bf16-at-rest W (the TPU default, cfg.classifier_dtype=auto).  Outputs
    are validated against a chunked XLA oracle BEFORE timing (round-3
    verdict: never time unvalidated kernel output)."""
    import jax
    import jax.numpy as jnp
    from c2dsr_tpu.ops import fused_ce

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(B, R, d)), jnp.float32)
    w32 = jnp.asarray(rng.normal(size=(d, v_p)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.normal(size=(v_p,)) * 0.02, jnp.float32)
    pad = jnp.asarray(rng.normal(size=(B, R, 1)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, v_p - 1024, size=(B, R)), jnp.int32)
    n_real = v_p - 1024

    out = []
    for suffix, w, w_bytes in (("", w32, 4),
                               ("_bf16w", w32.astype(jnp.bfloat16), 2)):
        fwd = jax.jit(lambda w=w: fused_ce.fused_rec_ce_rows(
            h, w, b, pad, tgt, n_real))
        err = _validate_ce_rows(h, w, b, pad, tgt, n_real, fwd)
        assert err < 5e-2, f"fused_ce{suffix} output mismatch: {err}"
        t_fwd, t_fwd_med = _timeit(fwd)
        flops_fwd = 2.0 * B * R * d * v_p
        bytes_fwd = (w_bytes * v_p * d
                     + 4.0 * (B * R * d + v_p + 2 * B * R))

        grad = jax.jit(jax.grad(
            lambda hh, ww: jnp.sum(fused_ce.fused_rec_ce_rows(
                hh, ww, b, pad, tgt, n_real)), argnums=(0, 1)))

        # validate (dh, dw) against a chunked oracle: the row-sum loss
        # decomposes over row chunks (dw sums, dh concatenates)
        from c2dsr_tpu.ops import losses
        wf = w.astype(jnp.float32)

        @jax.jit
        def g_oracle(hc, pc, tc):
            def f(hh, ww):
                logits = jnp.einsum("brd,dv->brv", hh, ww,
                                    preferred_element_type=jnp.float32) + b
                return jnp.sum(losses.rec_ce_row_losses(logits, pc, tc,
                                                        n_real))
            return jax.grad(f, argnums=(0, 1))(hc, wf)

        dh, dw = grad(h, w)
        dh, dw = np.asarray(dh), np.asarray(dw, np.float32)
        dh_err, dw_acc = 0.0, np.zeros_like(dw)
        for s in range(0, B, 64):
            dh_c, dw_c = g_oracle(h[s:s + 64], pad[s:s + 64], tgt[s:s + 64])
            dh_err = max(dh_err, float(np.max(np.abs(
                dh[s:s + 64] - np.asarray(dh_c)))))
            dw_acc += np.asarray(dw_c, np.float32)
        dw_err = float(np.max(np.abs(dw - dw_acc)))
        assert dh_err < 5e-2 and dw_err < 5e-2, (
            f"fused_ce{suffix} grad mismatch: dh {dh_err} dw {dw_err}")

        t_full, t_full_med = _timeit(lambda: grad(h, w))
        # bwd = dh (n,v)@(v,d) + dw (d,n)@(n,v) on top of the fwd recompute
        flops_full = 3 * flops_fwd
        bytes_full = 3 * bytes_fwd
        out += [_entry(f"fused_ce_fwd{suffix}", t_fwd, flops_fwd, bytes_fwd,
                       median=t_fwd_med, validated={"max_abs_err": err}),
                _entry(f"fused_ce_fwd_bwd{suffix}", t_full, flops_full,
                       bytes_full, median=t_full_med,
                       validated={"dh_max_abs_err": dh_err,
                                  "dw_max_abs_err": dw_err})]
    return out


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

    # validate vs the XLA segment-sum reference before timing
    want = np.asarray(jax.jit(lambda: spmm.spmm(graph, h))())
    got = np.asarray(fwd())
    err = float(np.max(np.abs(got - want)))
    scale = float(np.max(np.abs(want))) or 1.0
    assert err < 5e-2 * scale, f"blocked_spmm mismatch: {err}"

    t, t_med = _timeit(fwd)
    flops = 2.0 * nnz * d
    # gather reads h rows + writes [nnz, d], kernel reads it back + writes out
    bytes_ = 4.0 * (3 * nnz * d + 2 * n * d) + 8.0 * nnz
    e = _entry("blocked_spmm", t, flops, bytes_, median=t_med,
               validated={"max_abs_err": err})
    e["nnz"] = nnz

    import jax.numpy as jnp2
    step16 = spmm_pallas.make_blocked_spmm(graph.bk_fwd, graph.bk_bwd, False,
                                           gather_dtype=jnp2.bfloat16)
    fwd16 = jax.jit(lambda: step16(h))
    err16 = float(np.max(np.abs(np.asarray(fwd16()) - want)))
    assert err16 < 5e-2 * scale, f"blocked_spmm_bf16 mismatch: {err16}"
    t16, t16_med = _timeit(fwd16)
    bytes16 = 2.0 * 3 * nnz * d + 4.0 * 2 * n * d + 8.0 * nnz
    e16 = _entry("blocked_spmm_bf16_gather", t16, flops, bytes16,
                 median=t16_med, validated={"max_abs_err": err16})
    e16["nnz"] = nnz

    # batch-sparse fwd+bwd (the training configuration, train/step.py):
    # ~B*L marked rows out of n; dead edges gather one hot row
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, n, size=512 * 16), jnp.int32)
    flag = jnp.zeros(n, jnp.float32).at[ids].set(1.0)
    stepf = spmm_pallas.make_blocked_spmm_flagged(
        graph.bk_fwd, graph.bk_bwd, False, gather_dtype=jnp2.bfloat16)
    sel = np.asarray(ids)
    got_f = np.asarray(jax.jit(lambda: stepf(h, flag))())[sel]
    err_f = float(np.max(np.abs(got_f - np.asarray(fwd16())[sel])))
    assert err_f == 0.0, f"flagged spmm mismatch on marked rows: {err_f}"
    gradf = jax.jit(jax.grad(lambda hh: jnp.sum(stepf(hh, flag)[ids] ** 2)))
    grad16 = jax.jit(jax.grad(lambda hh: jnp.sum(step16(hh)[ids] ** 2)))
    gerr = float(np.max(np.abs(np.asarray(gradf(h)) - np.asarray(grad16(h)))))
    assert gerr == 0.0, f"flagged spmm grad mismatch: {gerr}"
    tf_, tf_med = _timeit(jax.jit(lambda: stepf(h, flag)))
    tfb, tfb_med = _timeit(lambda: gradf(h))
    ef = _entry("blocked_spmm_bf16_batch_sparse", tf_, flops, bytes16,
                median=tf_med, validated={"marked_rows_max_abs_err": err_f,
                                          "grad_max_abs_err": gerr})
    ef["nnz"] = nnz
    ef["marked_rows"] = int(np.unique(sel).shape[0])
    efb = _entry("blocked_spmm_bf16_batch_sparse_fwd_bwd", tfb, 2 * flops,
                 2 * bytes16, median=tfb_med)
    efb["nnz"] = nnz
    return [e, e16, ef, efb]


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

    # validate the deterministic kernel (dropout off) vs the XLA encoder
    from c2dsr_tpu.ops import encoder as enc_xla
    got = np.asarray(jax.jit(lambda: encp.encode_sequence_fused(
        seq, h, pos, p, idx_pad=10**6, n_head=n_head, dropout=0.0, rng=None,
        invert_padding_mask=False))())
    want = np.asarray(jax.jit(lambda: enc_xla.encode_sequence(
        seq, h, pos, p, idx_pad=10**6, n_head=n_head, dropout=0.0, rng=None,
        norm_first=False, invert_padding_mask=False))())
    err = float(np.max(np.abs(got - want)))
    assert err < 5e-2, f"fused_encoder mismatch vs XLA: {err}"

    lp = -(-L // 16) * 16
    flops = 2.0 * B * lp * d * (4 * d + 2 * lp) * n_layers
    bytes_ = 4.0 * (2 * B * lp * d + 12 * n_layers * d * d)
    t_fwd, t_fwd_med = _timeit(jax.jit(lambda: run(h)))

    grad = jax.jit(jax.grad(lambda hh: jnp.sum(run(hh))))
    t_full, t_full_med = _timeit(lambda: grad(h))
    return [_entry("fused_encoder_fwd", t_fwd, flops, bytes_,
                   median=t_fwd_med, validated={"max_abs_err_dropout0": err}),
            _entry("fused_encoder_fwd_bwd", t_full, 3 * flops, 3 * bytes_,
                   median=t_full_med)]


def bench_lookup(n_p=64512, d=128, B=512, L=15):
    """Embedding gather at train shapes (the 3-table lookup is 6 of these
    per step)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    tbl = jnp.asarray(rng.normal(size=(n_p, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, n_p, size=(B, L)), jnp.int32)
    fn = jax.jit(lambda: tbl[ids])
    t, t_med = _timeit(fn, n=100)
    bytes_ = 4.0 * (2 * B * L * d) + 4.0 * B * L
    return [_entry("embed_lookup", t, 0.0, bytes_, median=t_med)]


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
