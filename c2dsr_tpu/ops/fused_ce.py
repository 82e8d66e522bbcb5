"""Fused linear + softmax cross-entropy Pallas kernel (the training hot op).

The recommendation loss scores every position against the full domain
itemset (trainer.py:131-154): at Food-Kitchen scale the logits tensor is
[B*len_rec, ~30k-35k] — XLA materializes it to HBM in forward AND saves it
for backward, making the CE heads the dominant step cost (profiled at ~22ms
of a 52ms step).  This kernel never materializes logits:

* forward: grid (rows/Bn, vocab/Bv); each row block keeps flash-style
  running (max, sumexp) accumulators in VMEM scratch across the vocab axis,
  gathers the target logit with a one-hot match, and folds the appended
  pad-class logit (trainer.py:131-140) into the normalizer at the last
  vocab block.  Outputs per-row (lse, target_logit); the masked mean and
  count-reweighting stay outside in plain JAX.
* backward: ONE merged kernel recomputes each logit block once (cheaper
  than saving them) and feeds both grad matmuls from it:
  dh = sum_j dlogits_j @ W_j^T and dW_j/db_j = sum_i h_i^T @ dlogits_ij,
  with dlogits = dlse*P + dt*onehot.  The grid runs vocab-major so each W
  block streams exactly once; dh stays whole in VMEM (constant output
  index) accumulating across vocab blocks.  When dh would not fit in VMEM
  the backward falls back to two single-purpose kernels.

Vocab padding convention: callers pass a bias with -1e9 on padded columns
(``mask_bias``), so padded classes vanish from the softmax with no masking
inside the kernel.  Matmuls run in bf16 with f32 accumulation — the MXU
fast path, matching XLA's default precision.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def mask_bias(b: jax.Array, n_real: int, v_pad: int) -> jax.Array:
    """Bias vector with -1e9 on vocab-padding columns, shaped [1, V_pad]."""
    b = jnp.pad(b, (0, v_pad - b.shape[0]))
    col = jnp.arange(v_pad)
    return jnp.where(col < n_real, b, NEG)[None, :].astype(jnp.float32)


def _dot(a, b):
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fwd_kernel(h_ref, w_ref, b_ref, pad_ref, tgt_ref,
                lse_ref, tlog_ref, m_sc, s_sc, t_sc, *, bv: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG)
        s_sc[:] = jnp.zeros_like(s_sc)
        t_sc[:] = jnp.zeros_like(t_sc)

    logits = _dot(h_ref[:], w_ref[:]) + b_ref[:]          # [Bn, Bv]

    # target gather via one-hot match on global column ids
    col = j * bv + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    match = col == tgt_ref[:]                              # [Bn, Bv]
    t_sc[:] = t_sc[:] + jnp.sum(jnp.where(match, logits, 0.0), axis=1,
                                keepdims=True)

    m_new = jnp.maximum(m_sc[:], jnp.max(logits, axis=1, keepdims=True))
    s_sc[:] = (s_sc[:] * jnp.exp(m_sc[:] - m_new)
               + jnp.sum(jnp.exp(logits - m_new), axis=1, keepdims=True))
    m_sc[:] = m_new

    @pl.when(j == nj - 1)
    def _():
        # fold the appended pad-class logit into the normalizer
        p = pad_ref[:]
        m_fin = jnp.maximum(m_sc[:], p)
        s_fin = s_sc[:] * jnp.exp(m_sc[:] - m_fin) + jnp.exp(p - m_fin)
        lse_ref[:] = m_fin + jnp.log(s_fin)
        tlog_ref[:] = t_sc[:]


def _bwd_merged_kernel(h_ref, w_ref, b_ref, lse_ref, dlse_ref, dt_ref,
                       tgt_ref, dh_ref, dw_ref, db_ref, *, bn: int, bv: int):
    """One pass for ALL input grads: recompute the logit block once and feed
    both grad matmuls.  Grid (j=vocab outer, i=rows inner): the w block loads
    once per j; dh lives whole in VMEM (constant output index) accumulating
    across j; dw/db accumulate across the inner i loop."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    logits = _dot(h_ref[:], w_ref[:]) + b_ref[:]          # [Bn, Bv]
    p = jnp.exp(logits - lse_ref[:])
    col = j * bv + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    match = col == tgt_ref[:]
    dlogits = dlse_ref[:] * p + jnp.where(match, dt_ref[:], 0.0)

    dh_part = jax.lax.dot_general(
        dlogits.astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [Bn, d]
    rows = pl.ds(i * bn, bn)

    @pl.when(j == 0)
    def _():
        dh_ref[rows, :] = dh_part

    @pl.when(j != 0)
    def _():
        dh_ref[rows, :] = dh_ref[rows, :] + dh_part

    dw_part = jax.lax.dot_general(
        h_ref[:].astype(jnp.bfloat16), dlogits.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [d, Bv]
    db_part = jnp.sum(dlogits, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = dw_part
        db_ref[:] = db_part

    @pl.when(i != 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw_part
        db_ref[:] = db_ref[:] + db_part


# dh is held fully VMEM-resident by the merged kernel; beyond this the
# two-kernel fallback keeps VMEM bounded.
_MERGED_DH_BYTES = 6 * 1024 * 1024


def _bwd_dh_kernel(h_ref, w_ref, b_ref, lse_ref, dlse_ref, dt_ref, tgt_ref,
                   dh_ref, acc_sc, *, bv: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)

    logits = _dot(h_ref[:], w_ref[:]) + b_ref[:]
    p = jnp.exp(logits - lse_ref[:])                       # softmax probs
    col = j * bv + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    match = col == tgt_ref[:]
    dlogits = dlse_ref[:] * p + jnp.where(match, dt_ref[:], 0.0)
    acc_sc[:] = acc_sc[:] + jax.lax.dot_general(
        dlogits.astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        dh_ref[:] = acc_sc[:]


def _bwd_dw_kernel(h_ref, w_ref, b_ref, lse_ref, dlse_ref, dt_ref, tgt_ref,
                   dw_ref, db_ref, dw_sc, db_sc, *, bv: int):
    j = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        dw_sc[:] = jnp.zeros_like(dw_sc)
        db_sc[:] = jnp.zeros_like(db_sc)

    logits = _dot(h_ref[:], w_ref[:]) + b_ref[:]
    p = jnp.exp(logits - lse_ref[:])
    col = j * bv + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    match = col == tgt_ref[:]
    dlogits = dlse_ref[:] * p + jnp.where(match, dt_ref[:], 0.0)
    dw_sc[:] = dw_sc[:] + jax.lax.dot_general(
        h_ref[:].astype(jnp.bfloat16), dlogits.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_sc[:] = db_sc[:] + jnp.sum(dlogits, axis=0, keepdims=True)

    @pl.when(i == ni - 1)
    def _():
        dw_ref[:] = dw_sc[:]
        db_ref[:] = db_sc[:]


def _pick_blocks(n: int, v: int, d: int = 128, fwd: bool = False,
                 w_bytes: int = 4) -> Tuple[int, int]:
    """Block sizes per phase, measured on v5e at FK scale (N=10240, V=65536):

    * forward is VPU-bound (exp + flash bookkeeping per logit); bv=2048
      cuts grid steps 2x and measured 12% faster than bv=1024 (2.76ms vs
      3.15ms).  Only safe when the [bn, bv] f32 logit temporaries fit VMEM
      — gate on bn*d so large-d configs fall back.
    * backward is MXU-bound at ~60% peak with bn=512/bv=1024; bv=2048
      overflows VMEM at bn=512 and gains nothing at bn=256.
    """
    if d * v * w_bytes >= 2 ** 31:
        # `>=` is load-bearing: an operand of EXACTLY 2^31 bytes (f32
        # d=512 x V=2^20) was observed to hang/miscompile (round-3 verdict
        # reproduced 344 PFLOP/s garbage timings at that size).
        raise ValueError(
            f"classifier operand d*V = {d}x{v} at {w_bytes} B/elt reaches "
            "2 GiB — at/beyond the 32-bit per-operand addressing limit "
            "(observed to hang/miscompile).  Use a bfloat16 classifier "
            "(halves the operand) or shard the vocab "
            "(parallel/sharded_loss.py).")
    bn = 512 if n % 512 == 0 else 256 if n % 256 == 0 else 128
    bv = 1024 if v % 1024 == 0 else 512 if v % 512 == 0 else 256
    if fwd and bn * d <= 512 * 128:
        # widest stripe that divides v and keeps the [bn, bv] f32 logit
        # temporary within VMEM (bn=512: 3584 -> 7.3 MB, measured safe).
        # Round-5 sweep at the PRODUCTION vocab widths (/tmp lore ->
        # bench/ce_experiments.py): FK-B 35840: bv 3584 is 13% faster than
        # 1024; MB-A 36864: bv 2048 is 12% faster; MB-B 64512: bv 3584 is
        # 14% faster.  The round-4 tuning benched V=65536 (bv=2048 valid)
        # but in-step vocabs pad to 1024 multiples where 2048 rarely
        # divides — see fused_rec_ce_rows' pad rule, which now bumps the
        # padding when that unlocks a wider stripe.
        for cand in (3584, 2048):
            if v % cand == 0 and bn * cand <= 512 * 3584:
                bv = cand
                break
    # NOTE: bn=2048 forward blocks measured ~10% faster in isolation
    # (bench/ce_experiments.py: 3.27 vs 3.60 ms at N=10240 V=64512) but
    # were in-step NEUTRAL at FK scale and the Mosaic compile helper
    # crashes (HTTP 500, reproducibly) at (bn=2048, v=64512) — exactly the
    # Movie-Book B-domain classifier width — so the tall-block branch was
    # removed after round-4 measurement.
    if v % bv != 0:
        raise ValueError(f"vocab dim {v} must be a multiple of 256; "
                         "pad W/bias before calling the kernel")
    return bn, bv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_ce(h, w, b_masked, pad_logit, targets, interpret=False):
    """Per-row (lse, target_logit) of softmax over [h@w + b | pad_logit].

    h: [N, d] f32 (N % 128 == 0, pad rows with target = any masked col);
    w: [d, V] f32 (V % 256 == 0); b_masked: [1, V] with -1e9 on padding
    (see ``mask_bias``); pad_logit: [N, 1]; targets: [N, 1] int32 (global
    class id; rows whose loss is masked can point anywhere).
    """
    lse, tlog = _fused_ce_fwd_impl(h, w, b_masked, pad_logit, targets,
                                   interpret)
    return lse, tlog


def _fused_ce_fwd_impl(h, w, b_masked, pad_logit, targets, interpret):
    n, d = h.shape
    v = w.shape[1]
    bn, bv = _pick_blocks(n, v, d, fwd=True, w_bytes=w.dtype.itemsize)
    grid = (n // bn, v // bv)
    kernel = functools.partial(_fwd_kernel, bv=bv)
    lse, tlog = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, bv), lambda i, j: (0, j)),
            pl.BlockSpec((1, bv), lambda i, j: (0, j)),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
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
        scratch_shapes=[
            pltpu.VMEM((bn, 1), jnp.float32),
            pltpu.VMEM((bn, 1), jnp.float32),
            pltpu.VMEM((bn, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * v * d, bytes_accessed=4 * (n * d + d * v + n * 4),
            transcendentals=n * v),
        interpret=interpret,
    )(h, w, b_masked, pad_logit, targets)
    return lse, tlog


def _fused_ce_fwd(h, w, b_masked, pad_logit, targets, interpret):
    lse, tlog = _fused_ce_fwd_impl(h, w, b_masked, pad_logit, targets,
                                   interpret)
    return (lse, tlog), (h, w, b_masked, pad_logit, targets, lse)


def _fused_ce_bwd(interpret, res, cts):
    h, w, b_masked, pad_logit, targets, lse = res
    dlse, dt = cts
    n, d = h.shape
    v = w.shape[1]
    bn, bv = _pick_blocks(n, v, d, w_bytes=w.dtype.itemsize)

    if n * d * 4 <= _MERGED_DH_BYTES:
        dh, dw, db = pl.pallas_call(
            functools.partial(_bwd_merged_kernel, bn=bn, bv=bv),
            grid=(v // bv, n // bn),
            in_specs=[
                pl.BlockSpec((bn, d), lambda j, i: (i, 0)),
                pl.BlockSpec((d, bv), lambda j, i: (0, j)),
                pl.BlockSpec((1, bv), lambda j, i: (0, j)),
                pl.BlockSpec((bn, 1), lambda j, i: (i, 0)),
                pl.BlockSpec((bn, 1), lambda j, i: (i, 0)),
                pl.BlockSpec((bn, 1), lambda j, i: (i, 0)),
                pl.BlockSpec((bn, 1), lambda j, i: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((n, d), lambda j, i: (0, 0)),
                pl.BlockSpec((d, bv), lambda j, i: (0, j)),
                pl.BlockSpec((1, bv), lambda j, i: (0, j)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, d), jnp.float32),
                jax.ShapeDtypeStruct((d, v), jnp.float32),
                jax.ShapeDtypeStruct((1, v), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=6 * n * v * d,
                bytes_accessed=4 * (n * d * 2 + d * v * 2),
                transcendentals=n * v),
            interpret=interpret,
        )(h, w, b_masked, lse, dlse, dt, targets)
        dpad = dlse * jnp.exp(pad_logit - lse)
        return dh, dw.astype(w.dtype), db, dpad, None

    dh = pl.pallas_call(
        functools.partial(_bwd_dh_kernel, bv=bv),
        grid=(n // bn, v // bv),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, bv), lambda i, j: (0, j)),
            pl.BlockSpec((1, bv), lambda i, j: (0, j)),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bn, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * v * d, bytes_accessed=4 * (n * d * 2 + d * v),
            transcendentals=n * v),
        interpret=interpret,
    )(h, w, b_masked, lse, dlse, dt, targets)

    dw, db = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, bv=bv),
        grid=(v // bv, n // bn),
        in_specs=[
            pl.BlockSpec((bn, d), lambda j, i: (i, 0)),
            pl.BlockSpec((d, bv), lambda j, i: (0, j)),
            pl.BlockSpec((1, bv), lambda j, i: (0, j)),
            pl.BlockSpec((bn, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((bn, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((bn, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((bn, 1), lambda j, i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((d, bv), lambda j, i: (0, j)),
            pl.BlockSpec((1, bv), lambda j, i: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, v), jnp.float32),
            jax.ShapeDtypeStruct((1, v), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, bv), jnp.float32),
            pltpu.VMEM((1, bv), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * v * d, bytes_accessed=4 * (n * d + d * v * 2),
            transcendentals=n * v),
        interpret=interpret,
    )(h, w, b_masked, lse, dlse, dt, targets)

    # pad-class logit gradient: softmax weight of the pad class, elementwise
    dpad = dlse * jnp.exp(pad_logit - lse)
    return dh, dw.astype(w.dtype), db, dpad, None


fused_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


def fused_rec_ce_rows(h, w, b, pad_logit, targets, n_real: int,
                      interpret: bool = False) -> jax.Array:
    """Fused counterpart of ops.losses.rec_ce_row_losses: per-position
    masked CE terms [B, R] without materializing logits.

    ``w`` may be bfloat16 (classifier-at-rest streaming dtype): the kernel
    computes bf16 matmuls with f32 accumulation either way, so a bf16 ``w``
    halves its HBM traffic in the forward AND all three backward streams
    with identical matmul numerics; only the stored rounding differs."""
    B, R, d = h.shape
    n = B * R
    # pad vocab to a 1024 multiple (kernel block constraint); padded columns
    # get zero weights and a -1e9 bias, vanishing from the softmax.  When a
    # slightly larger 2048 multiple (<= 3.5% extra columns) unlocks a wider
    # forward stripe in _pick_blocks (measured 5-14% faster at FK/MB
    # production widths), pad to that instead — unless the 1024 multiple
    # already divides by a wide stripe (e.g. FK-B 35840 = 10 x 3584).
    v = -(-w.shape[1] // 1024) * 1024
    if v % 3584 and v % 2048:
        v2048 = -(-w.shape[1] // 2048) * 2048
        if v2048 <= v * 1.035:
            v = v2048
    if v != w.shape[1]:
        w = jnp.concatenate(
            [w, jnp.zeros((d, v - w.shape[1]), w.dtype)], axis=1)
    n_pad = (-n) % 128
    h2 = h.reshape(n, d)
    t2 = targets.reshape(n, 1).astype(jnp.int32)
    p2 = pad_logit.reshape(n, 1).astype(jnp.float32)
    if n_pad:
        h2 = jnp.concatenate([h2, jnp.zeros((n_pad, d), h2.dtype)])
        t2 = jnp.concatenate([t2, jnp.full((n_pad, 1), n_real, jnp.int32)])
        p2 = jnp.concatenate([p2, jnp.zeros((n_pad, 1), jnp.float32)])
    bm = mask_bias(b, n_real, v)
    if w.dtype != jnp.bfloat16:
        w = w.astype(jnp.float32)
    lse, tlog = fused_ce(h2.astype(jnp.float32), w, bm, p2, t2, interpret)
    lse = lse[:n, 0].reshape(B, R)
    tlog = tlog[:n, 0].reshape(B, R)
    mask = (targets != n_real).astype(jnp.float32)
    return (lse - tlog) * mask


def fused_rec_cross_entropy(h, w, b, pad_logit, targets, n_real: int,
                            interpret: bool = False):
    """Drop-in fused replacement for ops.losses.rec_cross_entropy:
    (mean_loss, n_valid)."""
    from c2dsr_tpu.ops import losses
    rows = fused_rec_ce_rows(h, w, b, pad_logit, targets, n_real, interpret)
    return losses.ce_mean_from_rows(rows, targets, n_real)
