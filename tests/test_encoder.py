"""Encoder numerics vs a torch TransformerEncoder oracle.

The reference wraps ``nn.TransformerEncoder`` (models/encoders.py:7-33).
Here we build the same torch stack in the test, copy our parameters into it,
and require our XLA encoder to match in eval mode — for both padding-mask
polarities (correct, and the reference's inverted quirk).
Torch is used as a CPU test oracle only; the framework itself never
imports it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2dsr_tpu.config import Config, DataSpec
from c2dsr_tpu.model import params as params_mod
from c2dsr_tpu.ops import encoder as enc

torch = pytest.importorskip("torch")

D, L, H, NL = 32, 10, 2, 2
PAD = 99


def _torch_encoder(p, n_head, n_layers=NL):
    import torch.nn as nn
    layer = nn.TransformerEncoderLayer(
        d_model=D, nhead=n_head, dim_feedforward=D, dropout=0.0,
        activation="relu", layer_norm_eps=1e-8, batch_first=True,
        norm_first=False)
    encoder = nn.TransformerEncoder(layer, n_layers, nn.LayerNorm(D, eps=1e-8))
    with torch.no_grad():
        for li, lp in enumerate(p["layers"]):
            tl = encoder.layers[li]
            tl.self_attn.in_proj_weight.copy_(
                torch.tensor(np.array(lp["w_qkv"]).T))
            tl.self_attn.in_proj_bias.copy_(torch.tensor(np.array(lp["b_qkv"])))
            tl.self_attn.out_proj.weight.copy_(
                torch.tensor(np.array(lp["w_out"]).T))
            tl.self_attn.out_proj.bias.copy_(torch.tensor(np.array(lp["b_out"])))
            tl.linear1.weight.copy_(torch.tensor(np.array(lp["w_ff1"]).T))
            tl.linear1.bias.copy_(torch.tensor(np.array(lp["b_ff1"])))
            tl.linear2.weight.copy_(torch.tensor(np.array(lp["w_ff2"]).T))
            tl.linear2.bias.copy_(torch.tensor(np.array(lp["b_ff2"])))
            tl.norm1.weight.copy_(torch.tensor(np.array(lp["ln1_scale"])))
            tl.norm1.bias.copy_(torch.tensor(np.array(lp["ln1_bias"])))
            tl.norm2.weight.copy_(torch.tensor(np.array(lp["ln2_scale"])))
            tl.norm2.bias.copy_(torch.tensor(np.array(lp["ln2_bias"])))
        encoder.norm.weight.copy_(torch.tensor(np.array(p["lnf_scale"])))
        encoder.norm.bias.copy_(torch.tensor(np.array(p["lnf_bias"])))
    encoder.eval()
    return encoder


def _make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    B = 4
    seq = rng.integers(0, 5, size=(B, L)).astype(np.int32)
    # left padding of varying lengths (position 0 always pad, as in the data)
    for i in range(B):
        seq[i, : 1 + i] = PAD
    pos = np.zeros((B, L), np.int32)
    for i in range(B):
        pos[i, 1 + i:] = np.arange(1, L - i)
    h = rng.normal(size=(B, L, D)).astype(np.float32)
    return seq, pos, h


def _run_pair(p, seq, pos, h, n_layers, invert, no_pads=False):
    """Run ours and the torch oracle on identical inputs."""
    cfg = Config(d_latent=D, n_attn=n_layers, n_head=H, dropout_attn=0.0)
    del cfg
    ours = np.array(enc.encode_sequence(
        jnp.asarray(seq), jnp.asarray(h), jnp.asarray(pos),
        {**p, "layers": p["layers"][:n_layers]},
        idx_pad=PAD, n_head=H, dropout=0.0, rng=None,
        norm_first=False, invert_padding_mask=invert))

    encoder = _torch_encoder({**p, "layers": p["layers"][:n_layers]}, H,
                             n_layers)
    x = torch.tensor(h) + torch.tensor(np.array(p["pos_emb"]))[
        torch.tensor(pos, dtype=torch.long)]
    causal = torch.triu(torch.ones(L, L, dtype=torch.bool), diagonal=1)
    is_real = torch.tensor(seq != PAD)
    # torch semantics: True = ignore this key.  Correct polarity ignores pads;
    # the reference's quirk passes (seq != pad), ignoring real keys.
    kpm = is_real if invert else ~is_real
    with torch.no_grad():
        if no_pads:
            ref = encoder(x, mask=causal).numpy()
        else:
            ref = encoder(x, mask=causal, src_key_padding_mask=kpm).numpy()
    return ours, ref


def test_encoder_matches_torch_causal_only():
    """Multi-layer parity with no pad tokens (pure causal attention)."""
    p = params_mod.init_encoder_params(
        jax.random.PRNGKey(0), Config(d_latent=D, n_attn=NL, n_head=H), L)
    rng = np.random.default_rng(0)
    B = 4
    seq = rng.integers(0, 5, size=(B, L)).astype(np.int32)   # no PAD anywhere
    pos = np.tile(np.arange(L, dtype=np.int32), (B, 1))
    h = rng.normal(size=(B, L, D)).astype(np.float32)
    ours, ref = _run_pair(p, seq, pos, h, NL, invert=False, no_pads=True)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_encoder_matches_torch_padded_single_layer():
    """Correct padding polarity, 1 layer: torch NaNs only on all-masked pad
    rows (torch's own fully-masked-row behavior); real rows must match."""
    p = params_mod.init_encoder_params(
        jax.random.PRNGKey(0), Config(d_latent=D, n_attn=1, n_head=H), L)
    seq, pos, h = _make_inputs()
    ours, ref = _run_pair(p, seq, pos, h, 1, invert=False)
    finite = np.isfinite(ref).all(axis=-1)
    assert (finite == (seq != PAD)).all()
    np.testing.assert_allclose(ours[finite], ref[finite], atol=2e-5)


def test_encoder_matches_torch_inverted_quirk():
    """Reference bug-parity mode (encoders.py:33): real keys masked, pads
    attended.  With left padding every row keeps >=1 allowed key, so torch
    stays finite and multi-layer outputs must match exactly."""
    p = params_mod.init_encoder_params(
        jax.random.PRNGKey(0), Config(d_latent=D, n_attn=NL, n_head=H), L)
    seq, pos, h = _make_inputs()
    ours, ref = _run_pair(p, seq, pos, h, NL, invert=True)
    assert np.isfinite(ref).all()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_real_rows_finite_everywhere():
    cfg = Config(d_latent=D, n_attn=1, n_head=1, dropout_attn=0.0)
    p = params_mod.init_encoder_params(jax.random.PRNGKey(1), cfg, L)
    seq, pos, h = _make_inputs(3)
    out = enc.encode_sequence(jnp.asarray(seq), jnp.asarray(h),
                              jnp.asarray(pos), p, idx_pad=PAD, n_head=1,
                              dropout=0.0, rng=None, norm_first=False,
                              invert_padding_mask=False)
    assert np.isfinite(np.array(out)).all()


def test_causality():
    """Changing a future token must not affect earlier outputs."""
    cfg = Config(d_latent=D, n_attn=1, n_head=1, dropout_attn=0.0)
    p = params_mod.init_encoder_params(jax.random.PRNGKey(2), cfg, L)
    seq, pos, h = _make_inputs(4)
    out1 = enc.encode_sequence(jnp.asarray(seq), jnp.asarray(h),
                               jnp.asarray(pos), p, idx_pad=PAD, n_head=1,
                               dropout=0.0, rng=None, norm_first=False,
                               invert_padding_mask=False)
    h2 = h.copy()
    h2[:, -1, :] += 100.0
    out2 = enc.encode_sequence(jnp.asarray(seq), jnp.asarray(h2),
                               jnp.asarray(pos), p, idx_pad=PAD, n_head=1,
                               dropout=0.0, rng=None, norm_first=False,
                               invert_padding_mask=False)
    # Pad query rows have no allowed keys; with the finite mask bias they
    # attend uniformly (incl. the future) — that's fine, nothing downstream
    # reads pad rows (the torch reference returns NaN there).  Causality must
    # hold on real rows.
    real = (seq != PAD)[:, :-1]
    np.testing.assert_allclose(np.array(out1)[:, :-1][real],
                               np.array(out2)[:, :-1][real], atol=1e-5)
