"""Vocab-sharded recommendation cross-entropy (distributed logsumexp).

The classifier weight is sharded over output classes (P(None, "model"), see
parallel/mesh.py), so each shard computes a [B, R, V/M] logits block; the
softmax normalizer is combined with a two-pass max/sum-exp psum over the
model axis — the logits are never materialized unsharded.  The target's
logit is owned by exactly one shard and recovered with a masked psum.

Semantics match ops/losses.rec_cross_entropy (torch F.cross_entropy with
ignore_index = n_real, plus the appended classifier_pad logit,
trainer.py:131-154).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


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
