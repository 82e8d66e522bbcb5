"""Jitted training step: the exact 6-term loss of the reference under jit.

Loss structure (trainer.py:91-160):
  infomax (4 BCE terms, trainer.py:96-119):
      sim_a_pos = D_a(mean_a(hx),        mean_b(h_share))
      sim_a_neg = D_a(mean_a(hx),        mean_a(share_tower(corrupt_a)))
      sim_b_pos = D_b(mean_b(hy),        mean_a(h_share))
      sim_b_neg = D_b(mean_b(hy),        mean_b(share_tower(corrupt_b)))
    where mean_d pools with the domain-d ground-truth mask normalized per
    row (trainer.py:85-89); safe because preprocessing drops users with an
    all-zero mask (SURVEY.md quirk 10).
  recommendation (last len_rec positions, trainer.py:122-154):
      loss_share_a/b : CE(cat(cls_dom(h_share), cls_pad(h_share))),
                       count-reweighted by n_valid/(len_rec*B)
      loss_a/b       : CE(cat(cls_dom(h_share+h_dom), cls_pad(h_dom)))
  total = lambda * rec + (1-lambda) * infomax   (trainer.py:156)

The graph propagation runs INSIDE the step (per-batch, with dropout), as in
trainer.py:48 — gradients flow through the propagated tables into the
embeddings.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from c2dsr_tpu.config import Config, DataSpec
from c2dsr_tpu.model import c2dsr
from c2dsr_tpu.ops import losses


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array          # int32 scalar


def _pool_mask(gt_mask: jax.Array) -> jax.Array:
    """gt_mask [B, L] 0/1 -> per-row mean weights (trainer.py:85-89)."""
    m = gt_mask.astype(jnp.float32)
    return m / jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)


def loss_fn(params, graphs: c2dsr.Graphs, batch: Dict[str, jax.Array],
            rng: jax.Array, cfg: Config, spec: DataSpec, pops=None
            ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    from c2dsr_tpu.parallel import strategy
    pops = pops or strategy.LocalOps(cfg=cfg)
    r_gnn, r_fwd, r_neg = jax.random.split(rng, 3)

    B = batch["seq_share"].shape[0]
    # The shared tower runs on three sequences per example (positive +
    # two corrupted, trainer.py:97,105,108) with the SAME weights — stack
    # them into one 3B-batch segment, then join ALL towers (shared + A + B)
    # into ONE fused kernel invocation (c2dsr.forward_joint): a single 5B
    # grid instead of 5 tower passes.
    seq_share3 = jnp.concatenate(
        [batch["seq_share"], batch["seq_share_neg_a"],
         batch["seq_share_neg_b"]], axis=0)
    pos3 = jnp.concatenate([batch["pos"]] * 3, axis=0)

    # batch-sparse propagation (cfg.batch_sparse_gnn): mark the table rows
    # this step will read.  INVARIANT: the propagated tables hi are consumed
    # ONLY by c2dsr.forward_joint's lookups, so the flags are derived from
    # the SAME arrays passed to forward_joint below (seq_share3 for the
    # shared table; seq_share_a/_b for the specific table) — any new read of
    # hi must extend this flag set or it will consume unpropagated rows.
    # Marked-row values and ALL gradients are exactly the dense
    # computation's; unmarked propagated rows are never read.
    out_flags = None
    if cfg.batch_sparse_gnn and isinstance(pops, strategy.LocalOps) \
            and not isinstance(pops, strategy.ShardedOps):
        def row_flag(*id_arrays):
            f = jnp.zeros(spec.n_item, jnp.float32)
            for ids in id_arrays:
                f = f.at[ids.reshape(-1)].set(1.0)
            return f
        out_flags = (row_flag(seq_share3),
                     row_flag(batch["seq_share_a"], batch["seq_share_b"]))
    hi = c2dsr.convolve_graph(params, graphs, cfg, spec, r_gnn, pops,
                              out_flags=out_flags)
    h_share3, hx, hy = c2dsr.forward_joint(
        params, hi, seq_share3, pos3, batch["seq_share_a"],
        batch["seq_share_b"], batch["pos_a"], batch["pos_b"], cfg, spec,
        r_fwd, pops)
    h_share, h_neg_a, h_neg_b = jnp.split(h_share3, 3, axis=0)

    # optional example-validity mask: multi-process batches pad by repeating
    # rows (data/pipeline.py) — padded duplicates must contribute NOTHING, so
    # the padded batch reproduces the reference's ragged batch exactly.
    valid = batch.get("valid")
    if valid is not None:
        valid = valid.astype(jnp.float32)
    n_examples = jnp.sum(valid) if valid is not None else jnp.float32(B)

    mask_a = _pool_mask(batch["gt_mask_a"])[..., None]     # [B, L, 1]
    mask_b = _pool_mask(batch["gt_mask_b"])[..., None]

    hx_mean = jnp.sum(hx * mask_a, axis=1)
    hy_mean = jnp.sum(hy * mask_b, axis=1)

    d_a_b = params.get("D_a_b")
    d_b_b = params.get("D_b_b")
    sim_a_pos = c2dsr.discriminate(params["D_a_w"], d_a_b, hx_mean,
                                   jnp.sum(h_share * mask_b, axis=1))
    sim_a_neg = c2dsr.discriminate(params["D_a_w"], d_a_b, hx_mean,
                                   jnp.sum(h_neg_a * mask_a, axis=1))
    sim_b_pos = c2dsr.discriminate(params["D_b_w"], d_b_b, hy_mean,
                                   jnp.sum(h_share * mask_a, axis=1))
    sim_b_neg = c2dsr.discriminate(params["D_b_w"], d_b_b, hy_mean,
                                   jnp.sum(h_neg_b * mask_b, axis=1))

    loss_mi = (losses.bce_with_logits(sim_a_pos, True, valid)
               + losses.bce_with_logits(sim_a_neg, False, valid)
               + losses.bce_with_logits(sim_b_pos, True, valid)
               + losses.bce_with_logits(sim_b_neg, False, valid))

    # --- recommendation loss over the last len_rec positions ---------------
    R = cfg.len_rec
    hs = h_share[:, -R:, :]
    ha = hx[:, -R:, :]
    hb = hy[:, -R:, :]
    gt_share_a = batch["gt_share_a"][:, -R:]
    gt_share_b = batch["gt_share_b"][:, -R:]
    gt_a = batch["gt_a"][:, -R:]
    gt_b = batch["gt_b"][:, -R:]

    na, nb = spec.n_item_a, spec.n_item_b
    if valid is not None:
        # padded rows' targets become the ignore index: the CE kernels mask
        # them and the valid counts (incl. count-reweighting) stay exact
        vb = valid[:, None] > 0
        gt_share_a = jnp.where(vb, gt_share_a, na)
        gt_share_b = jnp.where(vb, gt_share_b, nb)
        gt_a = jnp.where(vb, gt_a, na)
        gt_b = jnp.where(vb, gt_b, nb)

    def domain_ce(w_key, b_key, h_dom, gt_share, gt_dom, n_real):
        """Both CE terms of one domain (share-tower and combined-tower,
        trainer.py:131-152) in a single pass over the classifier: rows are
        [hs | hs+h_dom] so the kernel streams the weight once."""
        h_cat = jnp.concatenate([hs, hs + h_dom], axis=1)       # [B, 2R, d]
        pad_cat = jnp.concatenate(
            [c2dsr.classify_pad(params, hs),
             c2dsr.classify_pad(params, h_dom)], axis=1)
        tgt_cat = jnp.concatenate([gt_share, gt_dom], axis=1)
        rows = pops.ce_rows(h_cat, params[w_key], params[b_key], pad_cat,
                            tgt_cat, n_real)
        l_share, n_share = losses.ce_mean_from_rows(
            rows[:, :R], gt_share, n_real)
        l_dom, _ = losses.ce_mean_from_rows(rows[:, R:], gt_dom, n_real)
        return l_share, n_share, l_dom

    l_share_a, n_share_a, l_a = domain_ce("cls_a_w", "cls_a_b", ha,
                                          gt_share_a, gt_a, na)
    l_share_b, n_share_b, l_b = domain_ce("cls_b_w", "cls_b_b", hb,
                                          gt_share_b, gt_b, nb)
    denom = float(R) * n_examples
    loss_share = (l_share_a * n_share_a / denom
                  + l_share_b * n_share_b / denom)
    loss_rec = loss_share + l_a + l_b

    loss = cfg.lambda_loss * loss_rec + (1.0 - cfg.lambda_loss) * loss_mi
    aux = {"loss": loss, "loss_rec": loss_rec, "loss_mi": loss_mi,
           "n_examples": n_examples}
    return loss, aux


def make_train_step(cfg: Config, spec: DataSpec, graphs: c2dsr.Graphs,
                    optimizer: optax.GradientTransformation,
                    base_rng: jax.Array, mesh=None):
    """Build the jitted train step.  graphs is closed over (device-resident).
    mesh + cfg.mesh_model > 1 routes table ops through explicit shard_map
    collectives (parallel/strategy.py)."""
    from c2dsr_tpu.parallel import strategy
    pops = strategy.make_ops(cfg, mesh)

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        rng = jax.random.fold_in(base_rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, graphs, batch, rng, cfg,
                                  spec, pops)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), aux

    return jax.jit(train_step, donate_argnums=(0,))


def init_state(params, optimizer) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))
