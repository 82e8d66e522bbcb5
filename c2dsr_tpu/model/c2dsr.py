"""C2DSR model forward passes (pure functions over a params pytree).

Mirrors models/C2DSR.py:59-85:
  * ``convolve_graph`` — three GCN propagations over the full item tables
    (shared table over adj_share; A and B tables over adj_specific — the
    domain separation comes from which table is propagated, C2DSR.py:61-62).
  * ``forward`` — (propagated + raw) embedding lookup x sqrt(d) into three
    causal self-attention towers.
  * ``forward_share`` — shared tower only (used on corrupted sequences for
    the infomax negatives, trainer.py:105,108).

Pad-row semantics: torch's ``padding_idx`` freezes the pad row at zero
(C2DSR.py:20).  Here the pad row is masked at apply time, which both zeroes
the lookup result and kills the gradient into that row.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from c2dsr_tpu.config import Config, DataSpec
from c2dsr_tpu.ops import backend as backend_mod
from c2dsr_tpu.ops import encoder as enc
from c2dsr_tpu.ops import spmm


class Graphs(NamedTuple):
    share: spmm.CooDevice
    specific: spmm.CooDevice


class Propagated(NamedTuple):
    """GCN-propagated item tables (the reference's hi_share/hi_a/hi_b)."""
    share: jax.Array
    a: jax.Array
    b: jax.Array


def embedding_tables(params: Dict[str, Any], cfg: Config, spec: DataSpec
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Raw tables (pad-row zeroing happens at lookup sites, see _tower).

    The pad row is zero at init and never receives gradient: lookups mask
    their result by ``seq == idx_pad`` (zeroing the pulled row AND its
    gradient), and the graph never references the pad id (sequences enter
    graph/build.py unpadded), so GCN backprop cannot reach it either.
    Decoupled weight decay of an exactly-zero row is zero, closing the loop
    — torch ``padding_idx`` semantics (models/C2DSR.py:20) without touching
    all n_item rows every step.
    """
    share = params["embed_share"]
    if cfg.shared_item_embed:
        return share, share, share
    return share, params["embed_a"], params["embed_b"]


def convolve_graph(params: Dict[str, Any], graphs: Graphs, cfg: Config,
                   spec: DataSpec, rng: Optional[jax.Array],
                   pops=None, out_flags=None) -> Propagated:
    """Propagate all three tables through their GCNs (C2DSR.py:59-62).

    rng=None -> eval mode (no dropout).  Differentiable in params.
    pops = parallel-op strategy (parallel/strategy.py); None -> local.
    out_flags: optional (flag_share, flag_ab) 0/1 f32 row markers of the
    rows the caller will read (batch-sparse training propagation,
    ops/spmm.gcn_propagate); None -> dense (eval / full-table consumers).
    """
    pops = pops or _local_ops(cfg)
    e_share, e_a, e_b = embedding_tables(params, cfg, spec)
    r = (lambda i: None) if rng is None else (lambda i: jax.random.fold_in(rng, i))
    f_share, f_ab = out_flags if out_flags is not None else (None, None)
    hi_share = pops.spmm_propagate(graphs.share, e_share, cfg.n_gnn,
                                   cfg.dropout_gnn, r(0), out_flag=f_share)
    # A and B propagate through the SAME adjacency (C2DSR.py:61-62), so run
    # them as one pass over the feature-concatenated table: one gather over
    # the edge list serves both.  Feature-dim concat keeps dropout iid per
    # element, identical in distribution to two independent passes.
    e_ab = jnp.concatenate([e_a, e_b], axis=1)
    hi_ab = pops.spmm_propagate(graphs.specific, e_ab, cfg.n_gnn,
                                cfg.dropout_gnn, r(1), out_flag=f_ab)
    hi_a, hi_b = jnp.split(hi_ab, 2, axis=1)
    return Propagated(share=hi_share, a=hi_a, b=hi_b)


def _local_ops(cfg: Config):
    from c2dsr_tpu.parallel.strategy import LocalOps
    return LocalOps(cfg=cfg)


def _tower_pre(seq, hi, raw_table, cfg: Config, spec: DataSpec,
               pops=None) -> jax.Array:
    """(propagated + raw) lookup x sqrt(d) — the encoder's input.

    The lookup result is masked where seq == idx_pad: zeroes the pad row's
    contribution and kills the gradient into it (padding_idx semantics, see
    embedding_tables)."""
    pops = pops or _local_ops(cfg)
    lk = lambda tbl: pops.lookup(tbl, seq)
    real = (seq != spec.idx_pad)[..., None]
    if cfg.bug_inverted_padding_mask:
        # reference-parity mode: pads ARE attended (encoders.py:33), and
        # torch padding_idx only guards the direct embedding path — the
        # GCN-propagated row hi[pad] is looked up unguarded and its pad row
        # can drift via the propagation identity term.  Mirror that.
        h = (lk(hi) + jnp.where(real, lk(raw_table), 0.0))
    else:
        # correct masking: nothing downstream reads pad rows, so the whole
        # lookup (and its gradient) is zeroed at pad positions.  Summing the
        # tables FIRST (one table-sized add) halves the gather count and,
        # crucially, the backward scatter-adds into the tables — the chain
        # rule routes the single scattered cotangent to both tables.
        h = jnp.where(real, lk(hi + raw_table), 0.0)
    return (h * (cfg.d_latent ** 0.5)).astype(
        jnp.dtype(cfg.resolved_compute_dtype()))


def _tower(seq, pos, hi, raw_table, attn_params, cfg: Config, spec: DataSpec,
           rng: Optional[jax.Array], pops=None) -> jax.Array:
    """(propagated + raw) lookup x sqrt(d) -> attention tower."""
    h = _tower_pre(seq, hi, raw_table, cfg, spec, pops)
    if backend_mod.use_fused_encoder(cfg):
        # fused Pallas tower: one kernel per pass, activations + weights in
        # VMEM, recompute-forward backward (ops/encoder_pallas.py)
        from c2dsr_tpu.ops import encoder_pallas
        out = encoder_pallas.encode_sequence_fused(
            seq, h, pos, attn_params, idx_pad=spec.idx_pad,
            n_head=cfg.n_head, dropout=cfg.dropout_attn, rng=rng,
            invert_padding_mask=cfg.bug_inverted_padding_mask)
    else:
        out = enc.encode_sequence(
            seq, h, pos, attn_params, idx_pad=spec.idx_pad,
            n_head=cfg.n_head, dropout=cfg.dropout_attn, rng=rng,
            norm_first=cfg.norm_first,
            invert_padding_mask=cfg.bug_inverted_padding_mask)
    return out.astype(jnp.float32)


def forward(params: Dict[str, Any], hi: Propagated, seq_share, seq_a, seq_b,
            pos_share, pos_a, pos_b, cfg: Config, spec: DataSpec,
            rng: Optional[jax.Array], pops=None
            ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Three towers (C2DSR.py:64-77). Returns (h_share, hx, hy), [B, L, d]."""
    e_share, e_a, e_b = embedding_tables(params, cfg, spec)
    r = (lambda i: None) if rng is None else (lambda i: jax.random.fold_in(rng, i))
    h_share = _tower(seq_share, pos_share, hi.share, e_share,
                     params["attn_share"], cfg, spec, r(0), pops)
    hx = _tower(seq_a, pos_a, hi.a, e_a, params["attn_a"], cfg, spec, r(1),
                pops)
    hy = _tower(seq_b, pos_b, hi.b, e_b, params["attn_b"], cfg, spec, r(2),
                pops)
    return h_share, hx, hy


def forward_share(params: Dict[str, Any], hi: Propagated, seq, pos,
                  cfg: Config, spec: DataSpec, rng: Optional[jax.Array],
                  pops=None) -> jax.Array:
    """Shared tower only (C2DSR.py:79-85)."""
    e_share, _, _ = embedding_tables(params, cfg, spec)
    return _tower(seq, pos, hi.share, e_share, params["attn_share"],
                  cfg, spec, rng, pops)


def forward_joint(params: Dict[str, Any], hi: Propagated, seq_share3, pos3,
                  seq_a, seq_b, pos_a, pos_b, cfg: Config, spec: DataSpec,
                  rng: Optional[jax.Array], pops=None
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """ALL tower passes of one training step in one fused kernel call.

    The reference runs five encoder passes per step (trainer.py:97-108 +
    C2DSR.py:73-75); the caller stacks the three shared-tower sequences
    (positive + 2 corrupted) into ``seq_share3`` [3B, L], and this joins
    them with the A and B towers into ONE Pallas invocation
    (ops/encoder_pallas.encode_towers_fused): a 5B-row grid streaming each
    tower's weights once, instead of 3 short grids with 3x dispatch.
    Returns (h_share3 [3B, L, d], hx [B, L, d], hy [B, L, d]).

    Falls back to per-tower passes on the XLA (non-fused) backend.
    """
    e_share, e_a, e_b = embedding_tables(params, cfg, spec)
    h_s3 = _tower_pre(seq_share3, hi.share, e_share, cfg, spec, pops)
    h_a = _tower_pre(seq_a, hi.a, e_a, cfg, spec, pops)
    h_b = _tower_pre(seq_b, hi.b, e_b, cfg, spec, pops)
    if backend_mod.use_fused_encoder(cfg):
        from c2dsr_tpu.ops import encoder_pallas
        outs = encoder_pallas.encode_towers_fused(
            [(seq_share3, h_s3, pos3, params["attn_share"]),
             (seq_a, h_a, pos_a, params["attn_a"]),
             (seq_b, h_b, pos_b, params["attn_b"])],
            idx_pad=spec.idx_pad, n_head=cfg.n_head,
            dropout=cfg.dropout_attn, rng=rng,
            invert_padding_mask=cfg.bug_inverted_padding_mask)
        return tuple(o.astype(jnp.float32) for o in outs)
    r = (lambda i: None) if rng is None else (lambda i: jax.random.fold_in(rng, i))

    def run(seqX, hX, posX, prX, rr):
        return enc.encode_sequence(
            seqX, hX, posX, prX, idx_pad=spec.idx_pad, n_head=cfg.n_head,
            dropout=cfg.dropout_attn, rng=rr, norm_first=cfg.norm_first,
            invert_padding_mask=cfg.bug_inverted_padding_mask
        ).astype(jnp.float32)

    return (run(seq_share3, h_s3, pos3, params["attn_share"], r(0)),
            run(seq_a, h_a, pos_a, params["attn_a"], r(1)),
            run(seq_b, h_b, pos_b, params["attn_b"], r(2)))


def forward_domains(params: Dict[str, Any], hi: Propagated, seq_a, seq_b,
                    pos_a, pos_b, cfg: Config, spec: DataSpec,
                    rng: Optional[jax.Array], pops=None):
    """A and B towers only (the shared tower is often run separately on a
    stacked batch — see train/step.py).  Returns (None, hx, hy)."""
    _, e_a, e_b = embedding_tables(params, cfg, spec)
    r = (lambda i: None) if rng is None else (lambda i: jax.random.fold_in(rng, i))
    hx = _tower(seq_a, pos_a, hi.a, e_a, params["attn_a"], cfg, spec, r(1),
                pops)
    hy = _tower(seq_b, pos_b, hi.b, e_b, params["attn_b"], cfg, spec, r(2),
                pops)
    return None, hx, hy


def classify_a(params, h):
    return h @ params["cls_a_w"] + params["cls_a_b"]


def classify_b(params, h):
    return h @ params["cls_b_w"] + params["cls_b_b"]


def classify_pad(params, h):
    return h @ params["cls_pad_w"] + params["cls_pad_b"]


def discriminate(w: jax.Array, b: Optional[jax.Array], x1: jax.Array,
                 x2: jax.Array) -> jax.Array:
    """Bilinear discriminator x1^T W x2 (+ b) -> [B, 1] (C2DSR.py:46-55)."""
    out = jnp.sum((x1 @ w) * x2, axis=-1, keepdims=True)
    if b is not None:
        out = out + b
    return out
