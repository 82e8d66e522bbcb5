"""Fused Pallas TPU kernel for the causal self-attention tower.

The reference runs this tower as ``nn.TransformerEncoder`` — dozens of small
CUDA kernels per layer (models/encoders.py:7-33).  At C2DSR shapes the whole
problem is tiny (L <= 30, d = 128): every op is dispatch/HBM-bound, so the
TPU-native answer is ONE kernel per tower pass that keeps a batch block's
activations and all layer weights resident in VMEM:

  forward : [input dropout] -> n_attn x (QKV matmul -> per-head causal
            masked softmax attention (+prob dropout) -> out-proj (+dropout)
            -> residual -> LN1 -> FFN d->d ReLU (+dropouts) -> residual
            -> LN2) -> final LN, all in VMEM, post-norm torch semantics
            (d_ff = d, eps = 1e-8 with f32 statistics).
  backward: ONE kernel per batch block that re-runs the forward (activations
            are cheaper to recompute than to round-trip through HBM),
            regenerating identical dropout masks from the same per-block
            PRNG seed, then walks the layer stack in reverse producing dx
            and all parameter grads; weight grads accumulate across the
            sequential TPU grid into constant-index output blocks.

The positional-embedding add happens OUTSIDE the kernel (ops/encoder.py):
it is one XLA gather, and Mosaic cannot reshape an int [B, L] block to
[B*L, 1] for an in-kernel one-hot ("unsupported shape cast").

Masking matches ops/encoder.py: causal + key-padding with both polarities
(quirk 1, reference encoders.py:33), with -1e9 finite bias so all-masked
rows stay NaN-free.  Sequence-length alignment padding (L -> multiple of
16) is masked unconditionally in BOTH polarities — alignment pads are not
data pads, so the inverted-mask bug must not attend them.

Dropout uses the per-core PRNG (seeded per batch block), so masks never
touch HBM; eval (rng=None) and dropout=0 compile PRNG-free kernels.
Matmuls run in ``matmul_dtype`` (bf16 on TPU = MXU fast path) with f32
accumulation; LayerNorm statistics are always f32.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-8
NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# in-kernel building blocks
# ---------------------------------------------------------------------------

def _dot(a, b, dims, dtype):
    return jax.lax.dot_general(a.astype(dtype), b.astype(dtype),
                               dimension_numbers=dims,
                               preferred_element_type=jnp.float32)


def _mm(a, b, dtype):                       # [n, k] @ [k, m]
    return _dot(a, b, (((1,), (0,)), ((), ())), dtype)


def _mm_tn(a, b, dtype):                    # a^T @ b : [k, n]^T-style
    return _dot(a, b, (((0,), (0,)), ((), ())), dtype)


def _mm_nt(a, b, dtype):                    # a @ b^T
    return _dot(a, b, (((1,), (1,)), ((), ())), dtype)


def _bmm(a, b, dims, dtype):                # batched over leading dim
    (lc, rc) = dims
    return _dot(a, b, (((lc,), (rc,)), ((0,), (0,))), dtype)


def _ln_fwd(x, scale, bias):
    """Post-norm LayerNorm, f32 statistics.  Returns (y, xhat, rstd)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x - mean) * r
    return xhat * scale + bias, xhat, r


def _ln_bwd(g, xhat, r, scale):
    """Returns (dx, dscale_rows [1,d], dbias_rows [1,d])."""
    d = xhat.shape[-1]
    gs = g * scale
    m1 = jnp.sum(gs, axis=-1, keepdims=True) / d
    m2 = jnp.sum(gs * xhat, axis=-1, keepdims=True) / d
    dx = r * (gs - m1 - xhat * m2)
    dscale = jnp.sum(g * xhat, axis=0, keepdims=True)
    dbias = jnp.sum(g, axis=0, keepdims=True)
    return dx, dscale, dbias


def _keep_mask(shape, rate: float):
    """Bernoulli(1-rate) keep mask from the per-core PRNG, as f32 scale."""
    thr = jnp.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return jnp.where(bits >= thr, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _mask_bias(seq, idx_pad: int, l_real: int, invert: bool):
    """[Bb, LP, LP] additive bias: causal + key padding (+ alignment pad)."""
    bb, lp = seq.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
    causal = (col <= row) & (col < l_real)      # alignment pads never attended
    is_real = seq != idx_pad                    # [Bb, LP]
    key_ok = jnp.logical_not(is_real) if invert else is_real
    ok = causal[None, :, :] & key_ok[:, None, :]
    return jnp.where(ok, 0.0, NEG).astype(jnp.float32)


def _forward_core(x2, seq, refs, *, st, collect: bool):
    """Shared forward dataflow for both kernels.

    x2: [N, d] f32 (N = Bb*LP) AFTER input dropout; seq: [Bb, LP].
    refs: dict of weight refs.  Returns (out [N, d], saved) where ``saved``
    (when collect) holds every intermediate the backward needs, in forward
    order so PRNG mask regeneration stays aligned with the forward kernel.
    """
    (idx_pad, n_head, dropout, invert, l_real, n_layers, bb, lp, dh,
     use_drop, starts, mm_dtype) = st
    d = n_head * dh
    scale = 1.0 / float(np.sqrt(dh))
    bias = _mask_bias(seq, idx_pad, l_real, invert)
    saved = []
    for li in range(n_layers):
        s: Dict[str, Any] = {"x_in": x2}
        qkv = _mm(x2, refs["w_qkv"][li], mm_dtype) + refs["b_qkv"][li]
        s["qkv"] = qkv
        heads = []
        for h in range(n_head):
            q = qkv[:, h * dh:(h + 1) * dh].reshape(bb, lp, dh)
            k = qkv[:, d + h * dh:d + (h + 1) * dh].reshape(bb, lp, dh)
            v = qkv[:, 2 * d + h * dh:2 * d + (h + 1) * dh].reshape(bb, lp, dh)
            logits = _bmm(q, k, (2, 2), mm_dtype) * scale + bias
            p = jax.nn.softmax(logits, axis=-1)          # [Bb, LP, LP] f32
            if use_drop:
                mp = _keep_mask(p.shape, dropout)
                pd = p * mp
            else:
                mp, pd = None, p
            o = _bmm(pd, v, (2, 1), mm_dtype)            # [Bb, LP, dh]
            heads.append(o.reshape(bb * lp, dh))
            if collect:
                s.setdefault("p", []).append(p)
                s.setdefault("mp", []).append(mp)
                s.setdefault("pd", []).append(pd)
        o_cat = heads[0] if n_head == 1 else jnp.concatenate(heads, axis=1)
        s["o_cat"] = o_cat
        a = _mm(o_cat, refs["w_out"][li], mm_dtype) + refs["b_out"][li]
        if use_drop:
            ma = _keep_mask(a.shape, dropout)
            a = a * ma
            s["ma"] = ma
        z1 = x2 + a
        y1, xhat1, r1 = _ln_fwd(z1, refs["ln1_s"][li], refs["ln1_b"][li])
        s.update(xhat1=xhat1, r1=r1, y1=y1)
        f_pre = _mm(y1, refs["w_ff1"][li], mm_dtype) + refs["b_ff1"][li]
        f = jnp.maximum(f_pre, 0.0)
        s["f_pre"] = f_pre
        if use_drop:
            mf = _keep_mask(f.shape, dropout)
            f = f * mf
            s["mf"] = mf
        s["f_drop"] = f
        g = _mm(f, refs["w_ff2"][li], mm_dtype) + refs["b_ff2"][li]
        if use_drop:
            mg = _keep_mask(g.shape, dropout)
            g = g * mg
            s["mg"] = mg
        z2 = y1 + g
        x2, xhat2, r2 = _ln_fwd(z2, refs["ln2_s"][li], refs["ln2_b"][li])
        s.update(xhat2=xhat2, r2=r2)
        if collect:
            saved.append(s)
    out, xhatf, rf = _ln_fwd(x2, refs["lnf_s"][0], refs["lnf_b"][0])
    return out, (saved, xhatf, rf)


_WEIGHT_NAMES = ("w_qkv", "b_qkv", "w_out", "b_out", "w_ff1", "b_ff1",
                 "w_ff2", "b_ff2", "ln1_s", "ln1_b", "ln2_s", "ln2_b",
                 "lnf_s", "lnf_b")


def _fwd_kernel(seed_ref, x_ref, seq_ref, *ws, st):
    out_ref = ws[-1]
    refs = dict(zip(_WEIGHT_NAMES, ws[:-1]))
    (idx_pad, n_head, dropout, invert, l_real, n_layers, bb, lp, dh,
     use_drop, starts, mm_dtype) = st
    if use_drop:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x2 = x_ref[:].reshape(bb * lp, n_head * dh).astype(jnp.float32)
    if use_drop:
        x2 = x2 * _keep_mask(x2.shape, dropout)
    out, _ = _forward_core(x2, seq_ref[:], refs, st=st, collect=False)
    out_ref[:] = out.reshape(bb, lp, n_head * dh)


def _bwd_kernel(seed_ref, x_ref, seq_ref, *args, st):
    """Recompute-forward backward: one block's dx plus accumulated dW."""
    n_w = len(_WEIGHT_NAMES)
    refs = dict(zip(_WEIGHT_NAMES, args[:n_w]))
    g_ref = args[n_w]
    dx_ref = args[n_w + 1]
    grefs = dict(zip(_WEIGHT_NAMES, args[n_w + 2:]))
    (idx_pad, n_head, dropout, invert, l_real, n_layers, bb, lp, dh,
     use_drop, starts, mm_dtype) = st
    d = n_head * dh
    n = bb * lp
    scale = 1.0 / float(np.sqrt(dh))
    i = pl.program_id(0)

    if use_drop:
        pltpu.prng_seed(seed_ref[0] + i)     # same stream as forward
    x2 = x_ref[:].reshape(n, d).astype(jnp.float32)
    if use_drop:
        m_in = _keep_mask(x2.shape, dropout)
        x2 = x2 * m_in
    _, (saved, xhatf, rf) = _forward_core(x2, seq_ref[:], refs, st=st,
                                          collect=True)

    acc = {k: None for k in _WEIGHT_NAMES}

    # final LN backward
    g = g_ref[:].reshape(n, d).astype(jnp.float32)
    g, dlnf_s, dlnf_b = _ln_bwd(g, xhatf, rf, refs["lnf_s"][0])
    acc["lnf_s"] = dlnf_s[None]
    acc["lnf_b"] = dlnf_b[None]

    def stash(name, li, val):
        if acc[name] is None:
            acc[name] = [None] * n_layers
        acc[name][li] = val

    for li in range(n_layers - 1, -1, -1):
        s = saved[li]
        # LN2
        g, ds, db = _ln_bwd(g, s["xhat2"], s["r2"], refs["ln2_s"][li])
        stash("ln2_s", li, ds)
        stash("ln2_b", li, db)
        # residual: z2 = y1 + drop(g2)
        d_y1 = g
        d_g2 = g * s["mg"] if use_drop else g
        # g2 = f_drop @ w_ff2 + b_ff2
        stash("w_ff2", li, _mm_tn(s["f_drop"], d_g2, mm_dtype))
        stash("b_ff2", li, jnp.sum(d_g2, axis=0, keepdims=True))
        d_f = _mm_nt(d_g2, refs["w_ff2"][li], mm_dtype)
        if use_drop:
            d_f = d_f * s["mf"]
        d_fpre = jnp.where(s["f_pre"] > 0, d_f, 0.0)
        stash("w_ff1", li, _mm_tn(s["y1"], d_fpre, mm_dtype))
        stash("b_ff1", li, jnp.sum(d_fpre, axis=0, keepdims=True))
        d_y1 = d_y1 + _mm_nt(d_fpre, refs["w_ff1"][li], mm_dtype)
        # LN1
        g, ds, db = _ln_bwd(d_y1, s["xhat1"], s["r1"], refs["ln1_s"][li])
        stash("ln1_s", li, ds)
        stash("ln1_b", li, db)
        # residual: z1 = x_in + drop(a)
        d_x = g
        d_a = g * s["ma"] if use_drop else g
        # a = o_cat @ w_out + b_out
        stash("w_out", li, _mm_tn(s["o_cat"], d_a, mm_dtype))
        stash("b_out", li, jnp.sum(d_a, axis=0, keepdims=True))
        d_o = _mm_nt(d_a, refs["w_out"][li], mm_dtype)      # [n, d]
        # attention backward, per head
        qkv = s["qkv"]
        dqs, dks, dvs = [], [], []
        for h in range(n_head):
            q = qkv[:, h * dh:(h + 1) * dh].reshape(bb, lp, dh)
            k = qkv[:, d + h * dh:d + (h + 1) * dh].reshape(bb, lp, dh)
            v = qkv[:, 2 * d + h * dh:2 * d + (h + 1) * dh].reshape(bb, lp, dh)
            p = s["p"][h]
            pd = s["pd"][h]
            d_oh = d_o[:, h * dh:(h + 1) * dh].reshape(bb, lp, dh)
            d_pd = _bmm(d_oh, v, (2, 2), mm_dtype)           # [Bb, LP, LP]
            d_v = _bmm(pd, d_oh, (1, 1), mm_dtype)           # [Bb, LP, dh]
            d_p = d_pd * s["mp"][h] if use_drop else d_pd
            # softmax bwd (pre-dropout probs)
            d_s = p * (d_p - jnp.sum(d_p * p, axis=-1, keepdims=True))
            d_q = _bmm(d_s, k, (2, 1), mm_dtype) * scale
            d_k = _bmm(d_s, q, (1, 1), mm_dtype) * scale
            dqs.append(d_q.reshape(n, dh))
            dks.append(d_k.reshape(n, dh))
            dvs.append(d_v.reshape(n, dh))
        d_qkv = jnp.concatenate(
            (dqs + dks + dvs) if n_head > 1 else [dqs[0], dks[0], dvs[0]],
            axis=1)                                          # [n, 3d]
        stash("w_qkv", li, _mm_tn(s["x_in"], d_qkv, mm_dtype))
        stash("b_qkv", li, jnp.sum(d_qkv, axis=0, keepdims=True))
        g = d_x + _mm_nt(d_qkv, refs["w_qkv"][li], mm_dtype)

    if use_drop:
        g = g * m_in
    dx_ref[:] = g.reshape(bb, lp, d)

    # write/accumulate weight grads across the sequential grid.  With
    # multiple towers the grad output block is tower-indexed: initialize it
    # on the FIRST batch block of each tower's contiguous grid range.
    first = i == starts[0]
    for s in starts[1:]:
        first = jnp.logical_or(first, i == s)
    for name in _WEIGHT_NAMES:
        vals = acc[name]
        if name in ("lnf_s", "lnf_b"):
            stacked = vals.reshape(grefs[name].shape)
        else:
            stacked = jnp.stack(vals).reshape(grefs[name].shape)

        @pl.when(first)
        def _(name=name, stacked=stacked):
            grefs[name][...] = stacked

        @pl.when(jnp.logical_not(first))
        def _(name=name, stacked=stacked):
            grefs[name][...] = grefs[name][...] + stacked


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _weight_shapes(n_layers: int, d: int, n_towers: int = 1):
    """Full weight-array shapes: ``n_towers`` weight sets stacked along the
    layer axis ([T*NL, ...]; lnf gets its own [T, 1, d] leading dim)."""
    nl = n_towers * n_layers
    return {
        "w_qkv": (nl, d, 3 * d), "b_qkv": (nl, 1, 3 * d),
        "w_out": (nl, d, d), "b_out": (nl, 1, d),
        "w_ff1": (nl, d, d), "b_ff1": (nl, 1, d),
        "w_ff2": (nl, d, d), "b_ff2": (nl, 1, d),
        "ln1_s": (nl, 1, d), "ln1_b": (nl, 1, d),
        "ln2_s": (nl, 1, d), "ln2_b": (nl, 1, d),
        "lnf_s": (n_towers, 1, d), "lnf_b": (n_towers, 1, d),
    }


def _tower_block(shape, starts):
    """BlockSpec selecting one tower's weight slice by batch-block index.

    ``shape`` is the full stacked array; the block is its leading dim
    divided by the tower count.  The index map computes the tower id from
    the grid index against the static block-start offsets — so each batch
    block streams only its own tower's weights, and consecutive blocks of
    the same tower reuse the resident copy."""
    n_towers = len(starts)
    blk = (shape[0] // n_towers,) + shape[1:]
    nd = len(shape)
    if n_towers == 1:
        return pl.BlockSpec(blk, lambda i, _nd=nd: (0,) * _nd)
    sa = starts[1:]

    def im(i, _nd=nd, _sa=sa):
        t = jnp.int32(0)
        for s in _sa:
            t = t + jnp.where(i >= s, 1, 0).astype(jnp.int32)
        return (t,) + (0,) * (_nd - 1)

    return pl.BlockSpec(blk, im)


def _stack_params(params: Dict[str, Any], d: int) -> Dict[str, jax.Array]:
    """Stack the per-layer param dicts into the kernel's [NL, ...] arrays."""
    layers = params["layers"]
    nl = len(layers)
    out = {}
    for name, key in (("w_qkv", "w_qkv"), ("w_out", "w_out"),
                      ("w_ff1", "w_ff1"), ("w_ff2", "w_ff2")):
        out[name] = jnp.stack([l[key] for l in layers])
    for name, key in (("b_qkv", "b_qkv"), ("b_out", "b_out"),
                      ("b_ff1", "b_ff1"), ("b_ff2", "b_ff2"),
                      ("ln1_s", "ln1_scale"), ("ln1_b", "ln1_bias"),
                      ("ln2_s", "ln2_scale"), ("ln2_b", "ln2_bias")):
        out[name] = jnp.stack([l[key][None, :] for l in layers])
    out["lnf_s"] = params["lnf_scale"][None, None, :]
    out["lnf_b"] = params["lnf_bias"][None, None, :]
    assert out["w_qkv"].shape == (nl, d, 3 * d)
    return out


def _stack_params_multi(params_list, d: int) -> Dict[str, jax.Array]:
    """Stack several towers' params along the layer axis ([T*NL, ...];
    lnf along a [T, ...] leading dim).  Autodiff through the concatenation
    routes each tower's weight-grad slice back to its own pytree."""
    stacked = [_stack_params(p, d) for p in params_list]
    if len(stacked) == 1:
        return stacked[0]
    return {name: jnp.concatenate([s[name] for s in stacked], axis=0)
            for name in _WEIGHT_NAMES}


def _unstack_grads(gw: Dict[str, jax.Array]) -> Dict[str, Any]:
    """Inverse of _stack_params for the gradient pytree."""
    nl = gw["w_qkv"].shape[0]
    layers = []
    for li in range(nl):
        layers.append({
            "w_qkv": gw["w_qkv"][li], "b_qkv": gw["b_qkv"][li, 0],
            "w_out": gw["w_out"][li], "b_out": gw["b_out"][li, 0],
            "w_ff1": gw["w_ff1"][li], "b_ff1": gw["b_ff1"][li, 0],
            "w_ff2": gw["w_ff2"][li], "b_ff2": gw["b_ff2"][li, 0],
            "ln1_scale": gw["ln1_s"][li, 0], "ln1_bias": gw["ln1_b"][li, 0],
            "ln2_scale": gw["ln2_s"][li, 0], "ln2_bias": gw["ln2_b"][li, 0],
        })
    return {"layers": layers, "lnf_scale": gw["lnf_s"][0, 0],
            "lnf_bias": gw["lnf_b"][0, 0]}


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(st: Tuple, x: jax.Array, seq: jax.Array,
           weights: Dict[str, jax.Array], seed: jax.Array) -> jax.Array:
    return _fused_fwd_impl(st, x, seq, weights, seed)


def _specs(st, d):
    (idx_pad, n_head, dropout, invert, l_real, n_layers, bb, lp, dh,
     use_drop, starts, mm_dtype) = st
    wshapes = _weight_shapes(n_layers, d, len(starts))
    in_specs = [
        pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        pl.BlockSpec((bb, lp, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((bb, lp), lambda i: (i, 0)),
    ] + [_tower_block(wshapes[nm], starts) for nm in _WEIGHT_NAMES]
    return in_specs, wshapes


def _fused_fwd_impl(st, x, seq, weights, seed):
    (idx_pad, n_head, dropout, invert, l_real, n_layers, bb, lp, dh,
     use_drop, starts, mm_dtype) = st
    d = n_head * dh
    bp = x.shape[0]
    in_specs, _ = _specs(st, d)
    interpret = bool(st_interpret.get())
    return pl.pallas_call(
        functools.partial(_fwd_kernel, st=st),
        grid=(bp // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, lp, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, lp, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * lp * d * (4 * d + 2 * lp) * n_layers,
            bytes_accessed=4 * (2 * bp * lp * d + 12 * n_layers * d * d),
            transcendentals=bp * lp * lp * n_layers),
        interpret=interpret,
    )(seed, x, seq, *[weights[nm] for nm in _WEIGHT_NAMES])


def _fused_fwd(st, x, seq, weights, seed):
    out = _fused_fwd_impl(st, x, seq, weights, seed)
    return out, (x, seq, weights, seed)


def _fused_bwd(st, res, g):
    x, seq, weights, seed = res
    (idx_pad, n_head, dropout, invert, l_real, n_layers, bb, lp, dh,
     use_drop, starts, mm_dtype) = st
    d = n_head * dh
    bp = x.shape[0]
    in_specs, wshapes = _specs(st, d)
    in_specs = in_specs + [pl.BlockSpec((bb, lp, d), lambda i: (i, 0, 0))]
    out_specs = [pl.BlockSpec((bb, lp, d), lambda i: (i, 0, 0))] + [
        _tower_block(wshapes[nm], starts) for nm in _WEIGHT_NAMES]
    out_shape = [jax.ShapeDtypeStruct((bp, lp, d), jnp.float32)] + [
        jax.ShapeDtypeStruct(wshapes[nm], jnp.float32)
        for nm in _WEIGHT_NAMES]
    interpret = bool(st_interpret.get())
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, st=st),
        grid=(bp // bb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=6 * bp * lp * d * (4 * d + 2 * lp) * n_layers,
            bytes_accessed=4 * (3 * bp * lp * d + 24 * n_layers * d * d),
            transcendentals=bp * lp * lp * n_layers),
        interpret=interpret,
    )(seed, x, seq, *[weights[nm] for nm in _WEIGHT_NAMES], g)
    dx = outs[0]
    gw = dict(zip(_WEIGHT_NAMES, outs[1:]))
    dseq = np.zeros(seq.shape, dtype=jax.dtypes.float0)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dx, dseq, gw, dseed


_fused.defvjp(_fused_fwd, _fused_bwd)


class _Flag:
    """Process-local interpret toggle (tests force interpret on CPU)."""

    def __init__(self):
        self.v = False

    def get(self):
        return self.v

    def set(self, v):
        self.v = v


st_interpret = _Flag()


def supported(n_head: int, d: int, norm_first: bool) -> bool:
    return (not norm_first) and d % n_head == 0 and (d // n_head) % 8 == 0


def encode_sequence_fused(seq: jax.Array, h_in: jax.Array, pos: jax.Array,
                          params: Dict[str, Any], *, idx_pad: int,
                          n_head: int, dropout: float,
                          rng: Optional[jax.Array],
                          invert_padding_mask: bool,
                          matmul_dtype=jnp.bfloat16,
                          block_b: int = 64) -> jax.Array:
    """Drop-in fused replacement for ops.encoder.encode_sequence (post-norm).

    Pos-embed add runs outside the kernel (one XLA gather; its grad is the
    standard scatter-add).  Batch/length are padded to block multiples; the
    kernel masks alignment pads in both polarities and pad-row grads vanish
    because the sliced-output cotangent is zero there.
    """
    return encode_towers_fused(
        [(seq, h_in, pos, params)], idx_pad=idx_pad, n_head=n_head,
        dropout=dropout, rng=rng, invert_padding_mask=invert_padding_mask,
        matmul_dtype=matmul_dtype, block_b=block_b)[0]


def encode_towers_fused(segments, *, idx_pad: int, n_head: int,
                        dropout: float, rng: Optional[jax.Array],
                        invert_padding_mask: bool,
                        matmul_dtype=jnp.bfloat16,
                        block_b: int = 64) -> list:
    """Run SEVERAL towers (distinct weight sets) in ONE kernel invocation.

    The reference runs five tower passes per training step (shared on
    positive + 2 corrupted sequences, trainer.py:97-108, plus the A and B
    towers, C2DSR.py:73-75).  Per-pass kernels leave the sequential TPU
    grid short and pay 5x dispatch; here every pass joins one grid along
    the batch axis, and each batch block selects its tower's weight slice
    via the BlockSpec index map (weights stacked [T*NL, ...]) — consecutive
    blocks of the same tower reuse the VMEM-resident weights, and weight
    grads accumulate per tower over its contiguous block range.

    segments: list of (seq [Bt, L], h_in [Bt, L, d], pos [Bt, L], params).
    All segments must share L, d, layer count.  Returns the per-segment
    outputs [Bt, L, d].  Dropout masks are iid across the whole joined
    batch (matching independent per-tower dropout in distribution).
    """
    l = segments[0][0].shape[1]
    d = segments[0][1].shape[-1]
    n_layers = len(segments[0][3]["layers"])
    for sq, hh, pp, pr in segments:
        assert sq.shape[1] == l and hh.shape[-1] == d
        assert len(pr["layers"]) == n_layers

    lp = _round_up(l, 16)
    # the backward kernel stashes ~15 per-layer [bb, lp, d] activation
    # tensors in VMEM scratch; the block size is budgeted at lp=16 (FK/MB),
    # so scale it down with longer sequences or the stack overflows the
    # 16 MB scoped-vmem limit (observed: lp=32 EE geometry at bb=64 needs
    # 17.47 MB -> compile OOM).  Floor to a power of two — the kernel's
    # block/reshape geometry has only ever been exercised at 2^k blocks.
    block_b = max(8, block_b * 16 // lp)
    block_b = 1 << (block_b.bit_length() - 1)
    bs = [int(s[0].shape[0]) for s in segments]
    bb = min(block_b, 1 << (min(bs) - 1).bit_length())
    xs, seqs, starts, bps = [], [], [], []
    blk = 0
    for sq, hh, pp, pr in segments:
        b = sq.shape[0]
        x0 = hh.astype(jnp.float32) + pr["pos_emb"][pp]
        bp = _round_up(b, bb)
        if lp != l or bp != b:
            x0 = jnp.pad(x0, ((0, bp - b), (0, lp - l), (0, 0)))
            sq = jnp.pad(sq, ((0, bp - b), (0, lp - l)),
                         constant_values=idx_pad)
        xs.append(x0)
        seqs.append(sq.astype(jnp.int32))
        starts.append(blk)
        bps.append(bp)
        blk += bp // bb
    x = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=0)
    seq = seqs[0] if len(seqs) == 1 else jnp.concatenate(seqs, axis=0)

    use_drop = dropout > 0.0 and rng is not None
    if use_drop:
        seed = jax.random.randint(rng, (1,), 0, np.iinfo(np.int32).max,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    st = (int(idx_pad), int(n_head), float(dropout),
          bool(invert_padding_mask), int(l), int(n_layers), int(bb),
          int(lp), int(d // n_head), bool(use_drop), tuple(starts),
          jnp.dtype(matmul_dtype).name)
    # jnp dtype objects aren't hashable across versions; store the name and
    # resolve inside the kernels via _resolve_st
    st = _resolve_st(st)
    weights = _stack_params_multi([s[3] for s in segments], d)
    out = _fused(st, x, seq, weights, seed)
    outs, off = [], 0
    for b, bp in zip(bs, bps):
        outs.append(out[off:off + b, :l, :])
        off += bp
    return outs


class _StaticArgs(tuple):
    """Hashable static-arg bundle whose last field is a dtype."""


def _resolve_st(st):
    *rest, dtype_name = st
    return _StaticArgs(tuple(rest) + (jnp.dtype(dtype_name).type,))
