"""Fused Pallas encoder kernel vs the XLA encoder (interpret mode on CPU).

The fused kernel (ops/encoder_pallas.py) runs a whole tower pass —
n_attn x (QKV -> causal masked softmax -> out-proj -> residual -> LN ->
FFN -> residual -> LN) -> final LN — in one Pallas call, with a
recompute-forward backward.  These tests pin it against the XLA path
(ops/encoder.py, itself torch-oracle-pinned in tests/test_encoder.py) for
forward AND gradients, in both padding-mask polarities (SURVEY.md quirk 1,
reference encoders.py:33).

The kernel's in-VMEM dropout uses the TPU per-core PRNG, which interpret
mode stubs to zeros — so CPU tests cover the PRNG-free paths (rng=None)
and the dropout path is exercised on real TPU hardware (see
bench/kernel_bench.py and the dropout-stats test gated below).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2dsr_tpu.config import Config
from c2dsr_tpu.model import params as params_mod
from c2dsr_tpu.ops import encoder as enc
from c2dsr_tpu.ops import encoder_pallas as encp


@pytest.fixture(autouse=True)
def _interpret_mode():
    encp.st_interpret.set(True)
    yield
    encp.st_interpret.set(False)


PAD = 99


def _inputs(b, l, d, seed=0, all_real=False):
    rng = np.random.default_rng(seed)
    seq = rng.integers(0, 5, size=(b, l)).astype(np.int32)
    pos = np.tile(np.arange(1, l + 1, dtype=np.int32), (b, 1))
    if not all_real:
        # left padding of varying lengths, like the real data
        for i in range(b):
            npad = 1 + (i % (l - 1))
            seq[i, :npad] = PAD
            pos[i, :npad] = 0
            pos[i, npad:] = np.arange(1, l - npad + 1)
    h = rng.normal(size=(b, l, d)).astype(np.float32) * 0.5
    return jnp.asarray(seq), jnp.asarray(pos), jnp.asarray(h)


def _params(d, n_layers, n_head, l, seed=0):
    cfg = Config(d_latent=d, n_attn=n_layers, n_head=n_head)
    return params_mod.init_encoder_params(jax.random.PRNGKey(seed), cfg, l)


def _run_both(p, seq, pos, h, *, n_head, invert, block_b=8):
    xla = enc.encode_sequence(seq, h, pos, p, idx_pad=PAD, n_head=n_head,
                              dropout=0.0, rng=None, norm_first=False,
                              invert_padding_mask=invert)
    fused = encp.encode_sequence_fused(
        seq, h, pos, p, idx_pad=PAD, n_head=n_head, dropout=0.0, rng=None,
        invert_padding_mask=invert, matmul_dtype=jnp.float32,
        block_b=block_b)
    return np.asarray(xla), np.asarray(fused)


@pytest.mark.parametrize("invert", [False, True])
@pytest.mark.parametrize("n_head,n_layers", [(1, 1), (2, 2)])
def test_fused_forward_matches_xla(invert, n_head, n_layers):
    d, l = 32, 15
    p = _params(d, n_layers, n_head, l)
    seq, pos, h = _inputs(8, l, d)
    xla, fused = _run_both(p, seq, pos, h, n_head=n_head, invert=invert)
    real = np.asarray(seq != PAD)
    if invert:
        # inverted quirk: every row attends only pads (always >=1 with left
        # padding) -> finite everywhere, must match everywhere
        np.testing.assert_allclose(fused, xla, atol=3e-5)
    else:
        # correct polarity: pad query rows attend nothing (uniform over the
        # -1e9 bias); nothing downstream reads them.  Compare real rows.
        np.testing.assert_allclose(fused[real], xla[real], atol=3e-5)


def test_fused_forward_alignment_padding():
    """b and l not multiples of the block: kernel pads to (bp, lp) and must
    mask alignment pads in BOTH polarities (they are not data pads)."""
    d, l = 32, 10          # lp -> 16
    p = _params(d, 1, 1, l)
    for invert in (False, True):
        seq, pos, h = _inputs(5, l, d, seed=3)      # bp -> 8 with block_b=8
        xla, fused = _run_both(p, seq, pos, h, n_head=1, invert=invert)
        real = np.asarray(seq != PAD)
        sel = np.ones_like(real) if invert else real
        np.testing.assert_allclose(fused[sel], xla[sel], atol=3e-5)


def test_fused_forward_no_pads_multiblock():
    """Multiple grid blocks (b=32, block_b=8), no data pads."""
    d, l = 32, 15
    p = _params(d, 2, 2, l, seed=5)
    seq, pos, h = _inputs(32, l, d, seed=6, all_real=True)
    xla, fused = _run_both(p, seq, pos, h, n_head=2, invert=False)
    np.testing.assert_allclose(fused, xla, atol=5e-5)


@pytest.mark.parametrize("invert", [False, True])
def test_fused_grads_match_xla(invert):
    """Recompute-forward backward: dx, d(pos_emb) and every weight grad must
    match the XLA encoder's autodiff.  Weight grads also cross grid blocks
    (b=16, block_b=8) to cover the accumulate-into-constant-block path."""
    d, l, n_head, n_layers = 32, 15, 2, 2
    p = _params(d, n_layers, n_head, l, seed=7)
    seq, pos, h = _inputs(16, l, d, seed=8)
    real = (np.asarray(seq) != PAD)[..., None]
    # project through a fixed random cotangent, zeroed on pad rows for the
    # correct polarity (nothing downstream reads pad rows; the XLA path's
    # uniform-softmax pad rows would otherwise contribute junk grads)
    ct = np.random.default_rng(9).normal(size=(16, l, d)).astype(np.float32)
    if not invert:
        ct = ct * real
    ct = jnp.asarray(ct)

    def loss_xla(p, h):
        out = enc.encode_sequence(seq, h, pos, p, idx_pad=PAD, n_head=n_head,
                                  dropout=0.0, rng=None, norm_first=False,
                                  invert_padding_mask=invert)
        return jnp.sum(out * ct)

    def loss_fused(p, h):
        out = encp.encode_sequence_fused(
            seq, h, pos, p, idx_pad=PAD, n_head=n_head, dropout=0.0,
            rng=None, invert_padding_mask=invert,
            matmul_dtype=jnp.float32, block_b=8)
        return jnp.sum(out * ct)

    g_xla = jax.grad(loss_xla, argnums=(0, 1))(p, h)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(p, h)
    flat_x, tree_x = jax.tree.flatten(g_xla)
    flat_f, tree_f = jax.tree.flatten(g_fused)
    assert tree_x == tree_f
    paths = jax.tree_util.tree_flatten_with_path(g_xla)[0]
    for (path, gx), gf in zip(paths, flat_f):
        scale = max(1.0, float(np.abs(gx).max()))
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=3e-5 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_multi_tower_matches_per_tower():
    """encode_towers_fused: 3 towers with distinct weights and UNEQUAL
    batch sizes in one kernel call must match three per-tower calls, for
    outputs AND gradients (weight grads must accumulate only over each
    tower's own contiguous block range)."""
    d, l, n_head, n_layers = 32, 15, 2, 2
    ps = [_params(d, n_layers, n_head, l, seed=20 + t) for t in range(3)]
    ins = [_inputs(b, l, d, seed=30 + t)
           for t, b in enumerate((24, 8, 8))]       # 3/1/1 blocks at bb=8
    cts = [jnp.asarray(
        np.random.default_rng(40 + t).normal(size=(b, l, d)) *
        (np.asarray(ins[t][0] != PAD)[..., None])).astype(jnp.float32)
        for t, b in enumerate((24, 8, 8))]

    def loss_multi(ps, hs):
        segs = [(ins[t][0], hs[t], ins[t][1], ps[t]) for t in range(3)]
        outs = encp.encode_towers_fused(
            segs, idx_pad=PAD, n_head=n_head, dropout=0.0, rng=None,
            invert_padding_mask=False, matmul_dtype=jnp.float32, block_b=8)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cts)), outs

    def loss_single(ps, hs):
        outs = [encp.encode_sequence_fused(
            ins[t][0], hs[t], ins[t][1], ps[t], idx_pad=PAD, n_head=n_head,
            dropout=0.0, rng=None, invert_padding_mask=False,
            matmul_dtype=jnp.float32, block_b=8) for t in range(3)]
        return sum(jnp.sum(o * c) for o, c in zip(outs, cts)), outs

    hs = [i[2] for i in ins]
    (_, outs_m), g_m = jax.value_and_grad(loss_multi, argnums=(0, 1),
                                          has_aux=True)(ps, hs)
    (_, outs_s), g_s = jax.value_and_grad(loss_single, argnums=(0, 1),
                                          has_aux=True)(ps, hs)
    for om, os_ , t in zip(outs_m, outs_s, range(3)):
        real = np.asarray(ins[t][0] != PAD)
        np.testing.assert_allclose(np.asarray(om)[real],
                                   np.asarray(os_)[real], atol=3e-5,
                                   err_msg=f"tower {t} output")
    flat_m = jax.tree.flatten(g_m)[0]
    paths = jax.tree_util.tree_flatten_with_path(g_s)[0]
    for (path, gs), gm in zip(paths, flat_m):
        scale = max(1.0, float(np.abs(np.asarray(gs)).max()))
        np.testing.assert_allclose(
            np.asarray(gm), np.asarray(gs), atol=3e-5 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_supported_gating():
    assert encp.supported(n_head=1, d=128, norm_first=False)
    assert encp.supported(n_head=2, d=32, norm_first=False)
    assert not encp.supported(n_head=1, d=128, norm_first=True)
    assert not encp.supported(n_head=3, d=32, norm_first=False)   # 32 % 3
    assert not encp.supported(n_head=2, d=20, norm_first=False)   # dh=10 % 8


def test_fused_dropout_on_tpu():
    """Dropout path needs the hardware PRNG; runs only on a real TPU."""
    if jax.default_backend() != "tpu":
        pytest.skip("TPU-only: interpret mode stubs the per-core PRNG")
    encp.st_interpret.set(False)
    d, l = 32, 15
    p = _params(d, 1, 1, l, seed=11)
    seq, pos, h = _inputs(64, l, d, seed=12, all_real=True)
    out = encp.encode_sequence_fused(
        seq, h, pos, p, idx_pad=PAD, n_head=1, dropout=0.2,
        rng=jax.random.PRNGKey(0), invert_padding_mask=False)
    out2 = encp.encode_sequence_fused(
        seq, h, pos, p, idx_pad=PAD, n_head=1, dropout=0.2,
        rng=jax.random.PRNGKey(1), invert_padding_mask=False)
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(out2))
