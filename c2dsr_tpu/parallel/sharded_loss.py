"""Vocab-sharded recommendation cross-entropy (distributed logsumexp).

The classifier weight is sharded over output classes (P(None, "model"), see
parallel/mesh.py), so each shard computes a [B, R, V/M] logits block; the
softmax normalizer is combined with a two-pass max/sum-exp psum over the
model axis — the logits are never materialized unsharded.  The target's
logit is owned by exactly one shard and recovered with a masked psum.

Two shard-local kernels:
  * XLA einsum (portable) — materializes the local [B, R, V/M] logits block.
  * Pallas fused CE (``sharded_rec_ce_rows_pallas``) — runs ops/fused_ce.py
    on the LOCAL vocab shard inside the shard_map kernel, so even the
    model-sharded regime never materializes logits: each shard's flash
    (max, sumexp, target-logit) accumulators reduce to a per-row local
    logsumexp, and shards combine with one differentiable
    logsumexp-of-logsumexps + psum of the masked target logit.  The
    replicated pad-class logit is folded by shard 0 only.

Semantics match ops/losses.rec_cross_entropy (torch F.cross_entropy with
ignore_index = n_real, plus the appended classifier_pad logit,
trainer.py:131-154).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

NEG = -1e9


def sharded_rec_cross_entropy(h: jax.Array, w: jax.Array, b: jax.Array,
                              pad_logit: jax.Array, targets: jax.Array,
                              n_real: int, mesh: Mesh, axis: str = "model",
                              batch_spec: P = P()):
    """CE over [vocab-sharded domain classes | replicated pad class].

    h: [B, R, d]; w: [d, V_p] sharded P(None, axis); b: [V_p] sharded
    P(axis); pad_logit: [B, R, 1]; targets: [B, R] (n_real = ignored).
    ``batch_spec`` is the sharding of the batch dim of h/pad/targets —
    P() standalone, P("data") inside the data-parallel step; the loss sum
    and valid count are then also combined over those axes.
    Returns (mean_loss, n_valid), replicated.
    """
    batch_axes = tuple(a for a in batch_spec if a is not None)

    def kernel(h_, w_, b_, pad_, tgt):
        Vs = w_.shape[1]
        ax = jax.lax.axis_index(axis)
        logits = jnp.einsum("brd,dv->brv", h_, w_,
                            preferred_element_type=jnp.float32) + b_
        # mask vocab-padding columns (global col >= n_real)
        col = ax * Vs + jnp.arange(Vs)
        logits = jnp.where(col < n_real, logits, -1e9)

        # distributed logsumexp over classes + the replicated pad logit.
        # The max shift is for stability only — keep it out of the autodiff
        # graph (pmax has no differentiation rule, and d(lse)/d(m) = 0).
        m_local = jnp.max(jax.lax.stop_gradient(logits), axis=-1)
        m = jax.lax.pmax(m_local, axis)
        m = jnp.maximum(m, jax.lax.stop_gradient(pad_[..., 0]))
        se_local = jnp.sum(jnp.exp(logits - m[..., None]), axis=-1)
        se = jax.lax.psum(se_local, axis) + jnp.exp(pad_[..., 0] - m)
        lse = m + jnp.log(se)

        # target logit lives on one shard; ignored targets (== n_real) pick
        # a masked column, zeroed by the loss mask below
        t_local = tgt - ax * Vs
        t_ok = (t_local >= 0) & (t_local < Vs)
        t_logit = jnp.take_along_axis(
            logits, jnp.clip(t_local, 0, Vs - 1)[..., None], axis=-1)[..., 0]
        t_logit = jax.lax.psum(jnp.where(t_ok, t_logit, 0.0), axis)

        mask = (tgt != n_real).astype(jnp.float32)
        n_valid = jnp.sum(mask)
        total = jnp.sum((lse - t_logit) * mask)
        if batch_axes:
            n_valid = jax.lax.psum(n_valid, batch_axes)
            total = jax.lax.psum(total, batch_axes)
        mean = total / jnp.maximum(n_valid, 1.0)
        return mean, n_valid

    hspec = P(*batch_spec)
    return shard_map(kernel, mesh=mesh,
                     in_specs=(hspec, P(None, axis), P(axis), hspec, hspec),
                     out_specs=(P(), P()))(h, w, b, pad_logit, targets)


def sharded_rec_ce_rows(h: jax.Array, w: jax.Array, b: jax.Array,
                        pad_logit: jax.Array, targets: jax.Array,
                        n_real: int, mesh: Mesh, axis: str = "model",
                        batch_spec: P = P()) -> jax.Array:
    """Per-position masked CE terms [B, R], co-sharded with the batch —
    the vocab-sharded counterpart of ops.losses.rec_ce_row_losses (callers
    do their own reductions, which GSPMD handles on sharded arrays)."""

    def kernel(h_, w_, b_, pad_, tgt):
        Vs = w_.shape[1]
        ax = jax.lax.axis_index(axis)
        logits = jnp.einsum("brd,dv->brv", h_, w_,
                            preferred_element_type=jnp.float32) + b_
        col = ax * Vs + jnp.arange(Vs)
        logits = jnp.where(col < n_real, logits, -1e9)

        m_local = jnp.max(jax.lax.stop_gradient(logits), axis=-1)
        m = jax.lax.pmax(m_local, axis)
        m = jnp.maximum(m, jax.lax.stop_gradient(pad_[..., 0]))
        se_local = jnp.sum(jnp.exp(logits - m[..., None]), axis=-1)
        se = jax.lax.psum(se_local, axis) + jnp.exp(pad_[..., 0] - m)
        lse = m + jnp.log(se)

        t_local = tgt - ax * Vs
        t_ok = (t_local >= 0) & (t_local < Vs)
        t_logit = jnp.take_along_axis(
            logits, jnp.clip(t_local, 0, Vs - 1)[..., None], axis=-1)[..., 0]
        t_logit = jax.lax.psum(jnp.where(t_ok, t_logit, 0.0), axis)

        mask = (tgt != n_real).astype(jnp.float32)
        return (lse - t_logit) * mask

    hspec = P(*batch_spec)
    return shard_map(kernel, mesh=mesh,
                     in_specs=(hspec, P(None, axis), P(axis), hspec, hspec),
                     out_specs=hspec)(h, w, b, pad_logit, targets)


def sharded_rec_ce_rows_pallas(h: jax.Array, w: jax.Array, b: jax.Array,
                               pad_logit: jax.Array, targets: jax.Array,
                               n_real: int, mesh: Mesh, axis: str = "model",
                               batch_spec: P = P(),
                               interpret: bool = False) -> jax.Array:
    """Per-position masked CE terms [B, R] with the Pallas fused-CE kernel
    running on each shard's local vocab slice (never materializing logits,
    even model-sharded).

    Per shard: ops/fused_ce.fused_ce over the local [d, V/M] classifier
    gives a local logsumexp and (masked) target logit; shards combine with
      lse  = logsumexp_over_shards(lse_local)      (differentiable: the max
             shift uses stop_gradient + pmax, d(lse)/d(m) = 0)
      tlog = psum(tlog_local)                      (owned by exactly 1 shard)
    The pad-class logit is folded into shard 0's local lse only (folding it
    per shard would count it M times).  Same appended-pad + ignore-index
    semantics as ops/losses.rec_cross_entropy (trainer.py:131-154).

    ``interpret``: run the kernel in Pallas interpreter mode (CPU tests /
    the fake-pod dryrun).
    """
    from c2dsr_tpu.ops import fused_ce

    n_shards = mesh.shape[axis]
    vs = w.shape[1] // n_shards

    def kernel(h_, w_, b_, pad_, tgt):
        B, R, d = h_.shape
        ax = jax.lax.axis_index(axis)
        # local bias with -inf on global vocab padding (col >= n_real)
        col = ax * vs + jnp.arange(vs)
        bm = jnp.where(col < n_real, b_, NEG)[None, :].astype(jnp.float32)
        # fold the appended pad logit on shard 0 only
        pad_local = jnp.where(ax == 0, pad_[..., 0], NEG)
        # local target ids; out-of-shard targets match no column -> tlog 0
        t_local = tgt - ax * vs

        n = B * R
        n_pad = (-n) % 128
        h2 = h_.reshape(n, d).astype(jnp.float32)
        t2 = t_local.reshape(n, 1).astype(jnp.int32)
        p2 = pad_local.reshape(n, 1).astype(jnp.float32)
        if n_pad:
            h2 = jnp.concatenate([h2, jnp.zeros((n_pad, d), h2.dtype)])
            t2 = jnp.concatenate([t2, jnp.full((n_pad, 1), -1, jnp.int32)])
            p2 = jnp.concatenate([p2, jnp.full((n_pad, 1), NEG, jnp.float32)])

        w2 = w_ if w_.dtype == jnp.bfloat16 else w_.astype(jnp.float32)
        lse_s, tlog_s = fused_ce.fused_ce(h2, w2, bm, p2, t2, interpret)
        lse_s = lse_s[:n, 0].reshape(B, R)
        tlog_s = tlog_s[:n, 0].reshape(B, R)

        # combine shards: logsumexp of local logsumexps + target-logit psum
        m = jax.lax.pmax(jax.lax.stop_gradient(lse_s), axis)
        lse = m + jnp.log(jax.lax.psum(jnp.exp(lse_s - m), axis))
        t_ok = (t_local >= 0) & (t_local < vs)
        tlog = jax.lax.psum(jnp.where(t_ok, tlog_s, 0.0), axis)

        mask = (tgt != n_real).astype(jnp.float32)
        return (lse - tlog) * mask

    hspec = P(*batch_spec)
    # check_vma=False: pallas_call outputs don't carry varying-mesh-axis
    # metadata, and the combine above already psums everything explicitly
    return shard_map(kernel, mesh=mesh,
                     in_specs=(hspec, P(None, axis), P(axis), hspec, hspec),
                     out_specs=hspec,
                     check_vma=False)(h, w, b, pad_logit, targets)
