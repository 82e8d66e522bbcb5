"""Loss primitives: masked large-vocab cross-entropy and BCE-with-logits.

The recommendation CE runs over ~30k-64k class logits; it is expressed with
logsumexp + target gather so XLA keeps it fused and never materializes a
softmax table.  A vocab-sharded variant (distributed logsumexp over the model
axis) lives in ``parallel/sharded_loss.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_cross_entropy(logits: jax.Array, targets: jax.Array,
                         ignore_index: int) -> tuple[jax.Array, jax.Array]:
    """CE with ignore_index, torch ``F.cross_entropy`` mean semantics.

    logits: [..., C]; targets: [...] int.  Returns (mean_loss, n_valid):
    mean over non-ignored targets (0 if none), plus the valid count —
    callers re-weight with it (trainer.py:147-149 count-reweighting).
    """
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(
        logits, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = (targets != ignore_index).astype(jnp.float32)
    n_valid = jnp.sum(mask)
    total = jnp.sum((lse - tgt) * mask)
    mean = total / jnp.maximum(n_valid, 1.0)
    return mean, n_valid


def rec_cross_entropy(dom_logits: jax.Array, pad_logit: jax.Array,
                      targets: jax.Array, n_real: int
                      ) -> tuple[jax.Array, jax.Array]:
    """Recommendation CE over [domain classes | pad class], torch
    ``F.cross_entropy(..., ignore_index=n_real)`` mean semantics.

    dom_logits: [..., C_pad] where C_pad >= n_real (columns past n_real are
    vocab padding, masked to -1e9 here); pad_logit: [..., 1] (the appended
    ``classifier_pad`` logit, trainer.py:131-140); targets: [...] with
    value n_real meaning "ignored".  Returns (mean_loss, n_valid).
    """
    C_pad = dom_logits.shape[-1]
    if C_pad > n_real:
        col = jnp.arange(C_pad)
        dom_logits = jnp.where(col < n_real, dom_logits, -1e9)
    logits = jnp.concatenate([dom_logits, pad_logit], axis=-1)
    lse = jax.nn.logsumexp(logits, axis=-1)
    # ignored targets (== n_real) gather a masked column; zeroed by the mask
    tgt = jnp.take_along_axis(
        logits, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = (targets != n_real).astype(jnp.float32)
    n_valid = jnp.sum(mask)
    mean = jnp.sum((lse - tgt) * mask) / jnp.maximum(n_valid, 1.0)
    return mean, n_valid


def rec_ce_row_losses(dom_logits: jax.Array, pad_logit: jax.Array,
                      targets: jax.Array, n_real: int) -> jax.Array:
    """Per-position CE terms (lse - target_logit), already masked to 0 at
    ignored positions — callers do their own mean/count reductions (the
    reference mixes mean-CE and count-reweighted terms, trainer.py:143-154).
    """
    C_pad = dom_logits.shape[-1]
    if C_pad > n_real:
        col = jnp.arange(C_pad)
        dom_logits = jnp.where(col < n_real, dom_logits, -1e9)
    logits = jnp.concatenate([dom_logits, pad_logit], axis=-1)
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(
        logits, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = (targets != n_real).astype(jnp.float32)
    return (lse - tgt) * mask


def ce_mean_from_rows(rows: jax.Array, targets: jax.Array, n_real: int):
    """(mean over valid positions, n_valid) from masked per-position terms."""
    n_valid = jnp.sum((targets != n_real).astype(jnp.float32))
    return jnp.sum(rows) / jnp.maximum(n_valid, 1.0), n_valid


def bce_with_logits(logits: jax.Array, label_is_one: bool,
                    weights: jax.Array | None = None) -> jax.Array:
    """Mean binary cross-entropy with logits against an all-ones or all-zeros
    label tensor (trainer.py:113-117).

    ``weights``: optional per-example 0/1 validity [B] — the mean then runs
    over valid examples only (multi-process pad rows, data/pipeline.py)."""
    t = jax.nn.softplus(-logits) if label_is_one else jax.nn.softplus(logits)
    if weights is None:
        return jnp.mean(t)
    w = weights.reshape(weights.shape[0],
                        *([1] * (t.ndim - 1))).astype(t.dtype)
    per_row = t.size // t.shape[0]
    return jnp.sum(t * w) / jnp.maximum(jnp.sum(w) * per_row, 1.0)
