"""Causal self-attention sequence encoder (XLA path).

Functionally equivalent to the reference's ``SelfAttention`` wrapper around
``nn.TransformerEncoder`` (models/encoders.py:7-33): learned positional
embedding (index 0 = pad slot) + dropout, then ``n_attn`` post-norm (or
pre-norm) transformer layers with d_ff = d_latent, ReLU, LayerNorm eps=1e-8,
and a final LayerNorm, under a causal mask plus a key-padding mask.

Masking (SURVEY.md quirk 1): the reference *inverts* the key-padding mask
(encoders.py:33) so real tokens are masked and pads attended.  Default here
is the correct polarity; ``invert_padding_mask=True`` reproduces the bug.

Everything is batched, static-shaped, and fuses well under jit; sequence
length is <= 30 so attention is VMEM-resident — the Pallas fused kernel in
``ops/encoder_pallas.py`` covers the TPU fast path.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

LN_EPS = 1e-8          # layer_norm_eps of the reference (encoders.py:25-27)
NEG_INF = -1e9         # finite mask value: keeps softmax NaN-free on all-pad rows


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = LN_EPS) -> jax.Array:
    # statistics in f32 regardless of compute dtype (eps=1e-8 is below
    # bf16 resolution), result back in the input dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return out.astype(x.dtype)


def _dropout(x: jax.Array, rate: float, rng: Optional[jax.Array]) -> jax.Array:
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def multi_head_attention(x: jax.Array, params: Dict[str, jax.Array],
                         n_head: int, mask_bias: jax.Array,
                         dropout: float, rng: Optional[jax.Array]) -> jax.Array:
    """Self-attention with additive mask bias [B, 1, L, L]."""
    B, L, d = x.shape
    dh = d // n_head
    qkv = x @ params["w_qkv"] + params["b_qkv"]          # [B, L, 3d]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, L, n_head, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    logits = logits + mask_bias
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    attn = _dropout(attn, dropout, rng)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, L, d)
    return out @ params["w_out"] + params["b_out"]


def encoder_layer(x: jax.Array, p: Dict[str, Any], *, n_head: int,
                  mask_bias: jax.Array, dropout: float,
                  rng: Optional[jax.Array], norm_first: bool) -> jax.Array:
    """One transformer encoder layer, post-norm by default (torch semantics)."""
    r = (lambda i: None) if rng is None else (lambda i: jax.random.fold_in(rng, i))
    if norm_first:
        h = layer_norm(x, p["ln1_scale"], p["ln1_bias"])
        x = x + _dropout(
            multi_head_attention(h, p, n_head, mask_bias, dropout, r(0)),
            dropout, r(1))
        h = layer_norm(x, p["ln2_scale"], p["ln2_bias"])
        ff = jnp.maximum(h @ p["w_ff1"] + p["b_ff1"], 0.0)
        ff = _dropout(ff, dropout, r(2)) @ p["w_ff2"] + p["b_ff2"]
        return x + _dropout(ff, dropout, r(3))
    x = x + _dropout(
        multi_head_attention(x, p, n_head, mask_bias, dropout, r(0)),
        dropout, r(1))
    x = layer_norm(x, p["ln1_scale"], p["ln1_bias"])
    ff = jnp.maximum(x @ p["w_ff1"] + p["b_ff1"], 0.0)
    ff = _dropout(ff, dropout, r(2)) @ p["w_ff2"] + p["b_ff2"]
    x = x + _dropout(ff, dropout, r(3))
    return layer_norm(x, p["ln2_scale"], p["ln2_bias"])


def attention_mask_bias(seq: jax.Array, idx_pad: int,
                        invert_padding_mask: bool) -> jax.Array:
    """Additive attention bias [B, 1, L, L]: causal + key-padding.

    Correct polarity masks *pad* keys; the bug-parity mode masks *real* keys
    (reference encoders.py:33 passes ``seq != idx_pad`` where torch expects
    True = ignore).
    """
    B, L = seq.shape
    causal = jnp.tril(jnp.ones((L, L), jnp.bool_))
    is_real = seq != idx_pad                       # [B, L] keys that are real
    key_ok = jnp.logical_not(is_real) if invert_padding_mask else is_real
    ok = causal[None, :, :] & key_ok[:, None, :]   # [B, L, L]
    return jnp.where(ok, 0.0, NEG_INF)[:, None, :, :].astype(jnp.float32)


def encode_sequence(seq: jax.Array, h_in: jax.Array, pos: jax.Array,
                    params: Dict[str, Any], *, idx_pad: int, n_head: int,
                    dropout: float, rng: Optional[jax.Array],
                    norm_first: bool, invert_padding_mask: bool) -> jax.Array:
    """Full tower: pos-embed add + dropout + n layers + final LayerNorm.

    seq, pos: [B, L] int32; h_in: [B, L, d] (embedding already scaled by
    sqrt(d) upstream, models/C2DSR.py:69-71).
    """
    h = h_in + params["pos_emb"][pos]
    r = (lambda i: None) if rng is None else (lambda i: jax.random.fold_in(rng, i))
    h = _dropout(h, dropout, r(1000))
    bias = attention_mask_bias(seq, idx_pad, invert_padding_mask)
    for li, layer in enumerate(params["layers"]):
        h = encoder_layer(h, layer, n_head=n_head, mask_bias=bias,
                          dropout=dropout, rng=r(li), norm_first=norm_first)
    return layer_norm(h, params["lnf_scale"], params["lnf_bias"])
