"""End-to-end one-step parity vs the ACTUAL reference code.

Imports the unmodified PyTorch reference from /root/reference (the same
machinery as bench/baseline_torch.py), builds its Trainer on a tiny
synthetic dataset, copies the torch model's parameters into our pytree,
feeds the reference's OWN first batch to both sides with dropout disabled,
and asserts:

  * the three reported losses (total / rec / mi, trainer.py:160) match,
  * every parameter gradient matches (reference ``.grad`` after
    ``loss.backward()`` vs our ``jax.value_and_grad`` of train/step.loss_fn),
  * our graph builder's normalized adjacency == the reference's
    (utils/graph.py:33-96) on the same train file.

This is the strongest quality-parity evidence available while the mount
lacks the real train splits: it exercises graph build + GCN + 3 towers +
infomax + 5-term rec CE end-to-end against the code that produced the
published numbers.  Bug-parity switches on: inverted padding mask (quirk 1).
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from c2dsr_tpu.config import Config, DataSpec, padded_sizes
from c2dsr_tpu.data import raw as raw_mod
from c2dsr_tpu.data import synthetic
from c2dsr_tpu.graph import build as graph_build
from c2dsr_tpu.model import c2dsr
from c2dsr_tpu.ops import spmm
from c2dsr_tpu.train import step as step_mod

torch = pytest.importorskip("torch")
REFERENCE = os.environ.get("C2DSR_REFERENCE", "/root/reference")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted")

NA, NB, LEN_MAX, BATCH = 50, 70, 15, 32


def _build_trainer(raw_dir: str, proc_dir: str, **over):
    """The unmodified reference Trainer on the given raw data."""
    args = SimpleNamespace(
        data="fk", dataset="Food-Kitchen", len_rec=10, use_raw=True,
        n_neg_sample=10, zip_ee=False, d_latent=32,
        disable_embed_l2=False, shared_item_embed=False, d_bias=False,
        n_gnn=1, dropout_gnn=0.0, n_attn=1, n_head=1, dropout_attn=0.0,
        norm_first=False, lr=1e-3, lr_decay=0.1, l2=5e-4, lr_gamma=0.5,
        lr_step=10, n_lr_decay=5, decay_epoch=5, max_grad_norm=5.0,
        len_max=LEN_MAX, lambda_loss=0.7, seed=3407, n_epoch=1,
        batch_size=BATCH, batch_size_eval=64, num_workers=0,
        es_patience=10, save_processed=False,
        path_raw=raw_dir, path_data=proc_dir,
        n_item_a=NA, n_item_b=NB, n_item=NA + NB + 1,
        idx_pad=NA + NB, device=torch.device("cpu"),
    )
    for k, v in over.items():
        setattr(args, k, v)

    sys.path.insert(0, REFERENCE)
    try:
        torch.manual_seed(3407)
        from trainer import Trainer  # reference module

        class _Noter:
            def log_msg(self, m):
                pass

        trainer = Trainer(args, _Noter())
    finally:
        sys.path.remove(REFERENCE)
    return trainer, args


@pytest.fixture(scope="module")
def ref_data(tmp_path_factory):
    """Synthetic raw data in reference TSV format + its DataSpec."""
    tmp = tmp_path_factory.mktemp("refparity")
    raw_dir = str(tmp / "raw")
    proc_dir = str(tmp / "proc")
    os.makedirs(proc_dir, exist_ok=True)
    spec = DataSpec(n_item_a=NA, n_item_b=NB, len_max=LEN_MAX)
    seqs = synthetic.generate_sequences(spec, 120, seed=7)
    for mode in ("train", "val", "test"):
        synthetic.write_reference_tsv(
            seqs, os.path.join(raw_dir, f"{mode}_new.txt"))
    synthetic.write_item_lists(spec, raw_dir)
    return raw_dir, proc_dir, spec


@pytest.fixture(scope="module")
def ref_setup(ref_data):
    """Reference Trainer on synthetic raw data + the paths used."""
    raw_dir, proc_dir, spec = ref_data
    trainer, args = _build_trainer(raw_dir, proc_dir)
    return trainer, args, raw_dir, spec


def _cfg(args) -> Config:
    return Config(data="fk", d_latent=args.d_latent, n_gnn=args.n_gnn,
                  dropout_gnn=0.0, n_attn=args.n_attn, n_head=args.n_head,
                  dropout_attn=0.0, len_rec=args.len_rec,
                  lambda_loss=args.lambda_loss, batch_size=args.batch_size,
                  bug_inverted_padding_mask=True, kernel_backend="xla")


def _t2n(t):
    return t.detach().cpu().numpy().astype(np.float32)


def _encoder_params(attn):
    layers = []
    for tl in attn.encoder.layers:
        layers.append({
            "w_qkv": _t2n(tl.self_attn.in_proj_weight).T,
            "b_qkv": _t2n(tl.self_attn.in_proj_bias),
            "w_out": _t2n(tl.self_attn.out_proj.weight).T,
            "b_out": _t2n(tl.self_attn.out_proj.bias),
            "w_ff1": _t2n(tl.linear1.weight).T,
            "b_ff1": _t2n(tl.linear1.bias),
            "w_ff2": _t2n(tl.linear2.weight).T,
            "b_ff2": _t2n(tl.linear2.bias),
            "ln1_scale": _t2n(tl.norm1.weight),
            "ln1_bias": _t2n(tl.norm1.bias),
            "ln2_scale": _t2n(tl.norm2.weight),
            "ln2_bias": _t2n(tl.norm2.bias),
        })
    return {"pos_emb": _t2n(attn.pos_emb.weight), "layers": layers,
            "lnf_scale": _t2n(attn.encoder.norm.weight),
            "lnf_bias": _t2n(attn.encoder.norm.bias)}


def _params_from_torch(model, cfg, spec, grad=False):
    """Map the reference C2DSR module (or its .grad tensors) to our pytree."""
    n_p, na_p, nb_p = padded_sizes(cfg, spec)

    def src(t):
        if not grad:
            return _t2n(t)
        return (np.zeros(tuple(t.shape), np.float32) if t.grad is None
                else _t2n(t.grad))

    def maybe_grad_module(fn, mod):
        if not grad:
            return fn(mod)
        # swap every tensor for its grad by monkey-view: simplest is to
        # rebuild with src(); encoder needs per-tensor access, do it inline
        raise NotImplementedError

    def pad_rows(a, n_rows):
        return np.concatenate(
            [a, np.zeros((n_rows - a.shape[0], a.shape[1]), np.float32)])

    def pad_cols(a, n_cols):
        return np.concatenate(
            [a, np.zeros((a.shape[0], n_cols - a.shape[1]), np.float32)],
            axis=1)

    def enc(attn):
        if not grad:
            return _encoder_params(attn)
        layers = []
        for tl in attn.encoder.layers:
            layers.append({
                "w_qkv": src(tl.self_attn.in_proj_weight).T,
                "b_qkv": src(tl.self_attn.in_proj_bias),
                "w_out": src(tl.self_attn.out_proj.weight).T,
                "b_out": src(tl.self_attn.out_proj.bias),
                "w_ff1": src(tl.linear1.weight).T,
                "b_ff1": src(tl.linear1.bias),
                "w_ff2": src(tl.linear2.weight).T,
                "b_ff2": src(tl.linear2.bias),
                "ln1_scale": src(tl.norm1.weight),
                "ln1_bias": src(tl.norm1.bias),
                "ln2_scale": src(tl.norm2.weight),
                "ln2_bias": src(tl.norm2.bias),
            })
        return {"pos_emb": src(attn.pos_emb.weight), "layers": layers,
                "lnf_scale": src(attn.encoder.norm.weight),
                "lnf_bias": src(attn.encoder.norm.bias)}

    p = {
        "embed_share": pad_rows(src(model.embed_i.weight), n_p),
        "attn_share": enc(model.attn_share),
        "attn_a": enc(model.attn_a),
        "attn_b": enc(model.attn_b),
        "cls_a_w": pad_cols(src(model.classifier_a.weight).T, na_p),
        "cls_a_b": np.concatenate(
            [src(model.classifier_a.bias),
             np.zeros(na_p - spec.n_item_a, np.float32)]),
        "cls_b_w": pad_cols(src(model.classifier_b.weight).T, nb_p),
        "cls_b_b": np.concatenate(
            [src(model.classifier_b.bias),
             np.zeros(nb_p - spec.n_item_b, np.float32)]),
        "cls_pad_w": src(model.classifier_pad.weight).T,
        "cls_pad_b": src(model.classifier_pad.bias),
        "D_a_w": src(model.D_a.weight)[0],
        "D_b_w": src(model.D_b.weight)[0],
    }
    if not cfg.shared_item_embed:
        # aliased tables (C2DSR.py:21-26): the reference's embed_i_a/b ARE
        # embed_i, so grads accumulate into the one table — matched by our
        # single embed_share param under cfg.shared_item_embed
        p["embed_a"] = pad_rows(src(model.embed_i_a.weight), n_p)
        p["embed_b"] = pad_rows(src(model.embed_i_b.weight), n_p)
    if cfg.d_bias:
        p["D_a_b"] = src(model.D_a.bias)
        p["D_b_b"] = src(model.D_b.bias)
    return jax.tree.map(jnp.asarray, p)


def test_graph_matches_reference(ref_setup):
    """Our D^-1 A adjacency (duplicate-edge weighting included) must equal
    the reference's make_graph output (utils/graph.py:33-96) exactly."""
    trainer, args, raw_dir, spec = ref_setup
    seqs = raw_mod.parse_interactions(os.path.join(raw_dir, "train_new.txt"))
    g_share, g_spec = graph_build.build_graphs(seqs, spec)

    for ours, ref in ((g_share, trainer.adj_share),
                      (g_spec, trainer.adj_specific)):
        ref = ref.coalesce()
        idx = ref.indices().numpy()
        val = ref.values().numpy()
        dense_ref = np.zeros((spec.n_item, spec.n_item), np.float64)
        dense_ref[idx[0], idx[1]] = val
        dense_ours = np.zeros_like(dense_ref)
        dense_ours[ours.rows, ours.cols] = ours.vals
        np.testing.assert_allclose(dense_ours, dense_ref, atol=1e-6)


def test_one_step_loss_and_grads_match_reference(ref_setup):
    trainer, args, raw_dir, spec = ref_setup
    _assert_one_step_parity(trainer, args, raw_dir, spec)


def test_one_step_parity_shared_embed_and_d_bias(ref_data):
    """Model variants round 2/3 flagged untested: shared_item_embed=True
    (three towers backprop into ONE aliased table, C2DSR.py:21-26) and
    d_bias=True (bias on the bilinear discriminators, C2DSR.py:46-55).
    Same one-step loss+grad parity as the default-config test."""
    raw_dir, proc_dir, spec = ref_data
    trainer, args = _build_trainer(raw_dir, proc_dir,
                                   shared_item_embed=True, d_bias=True)
    _assert_one_step_parity(trainer, args, raw_dir, spec)


def _assert_one_step_parity(trainer, args, raw_dir, spec):
    cfg = _cfg(args).with_(shared_item_embed=args.shared_item_embed,
                           d_bias=args.d_bias)
    model = trainer.model
    model.train()

    batch = next(iter(trainer.trainloader))
    names = ("seq_share", "seq_share_a", "seq_share_b", "pos", "pos_a",
             "pos_b", "gt_share_a", "gt_share_b", "gt_a", "gt_b",
             "gt_mask_a", "gt_mask_b", "seq_share_neg_a", "seq_share_neg_b")
    np_batch = {k: np.asarray(t.numpy(), dtype=np.int32)
                for k, t in zip(names, batch)}

    # ---- reference side: convolve + loss + backward (no step) -------------
    trainer.optimizer.zero_grad()
    model.convolve_graph()
    b = batch[0].shape[0]
    # replicate train_batch up to backward (trainer.py:91-157) without the
    # optimizer step so .grad is exactly d(loss)/d(param)
    loss_batch, loss_rec, loss_mi = _ref_losses(trainer, model, batch, b)
    loss_batch.backward()

    # ---- our side ----------------------------------------------------------
    seqs = raw_mod.parse_interactions(os.path.join(raw_dir, "train_new.txt"))
    g_share, g_spec = graph_build.build_graphs(seqs, spec)
    graphs = c2dsr.Graphs(share=spmm.device_graph(g_share),
                          specific=spmm.device_graph(g_spec))
    params = _params_from_torch(model, cfg, spec, grad=False)
    jb = {k: jnp.asarray(v) for k, v in np_batch.items()}

    (loss, aux), grads = jax.value_and_grad(
        step_mod.loss_fn, has_aux=True)(
            params, graphs, jb, jax.random.PRNGKey(0), cfg, spec)

    np.testing.assert_allclose(float(aux["loss_mi"]), float(loss_mi),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(aux["loss_rec"]), float(loss_rec),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(loss), float(loss_batch),
                               rtol=2e-5, atol=2e-6)

    ref_grads = _params_from_torch(model, cfg, spec, grad=True)
    flat_ours = jax.tree_util.tree_flatten_with_path(grads)[0]
    flat_ref = jax.tree.leaves(ref_grads)
    assert len(flat_ours) == len(flat_ref)
    for (path, go), gr in zip(flat_ours, flat_ref):
        go, gr = np.asarray(go), np.asarray(gr)
        assert go.shape == gr.shape, jax.tree_util.keystr(path)
        scale = max(1e-3, float(np.abs(gr).max()))
        np.testing.assert_allclose(
            go, gr, atol=3e-5 * scale, rtol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def _ref_losses(trainer, model, batch, n_batch):
    """trainer.train_batch's loss computation (trainer.py:91-156) verbatim
    semantics, stopping before backward/step so we control those."""
    import torch.nn.functional as F
    (seq_share, seq_share_a, seq_share_b, pos, pos_a, pos_b, gt_share_a,
     gt_share_b, gt_a, gt_b, gt_mask_a, gt_mask_b, seq_share_neg_a,
     seq_share_neg_b) = batch

    h_share_pos, hx_pos, hy_pos = model(seq_share, seq_share_a, seq_share_b,
                                        pos, pos_a, pos_b)
    mask_a = trainer.cal_mask(gt_mask_a)
    mask_b = trainer.cal_mask(gt_mask_b)
    hx_mean_pos = (hx_pos * mask_a).sum(1)
    hy_mean_pos = (hy_pos * mask_b).sum(1)
    sim_a_pos = model.D_a(hx_mean_pos, (h_share_pos * mask_b).sum(1))
    sim_a_neg = model.D_a(
        hx_mean_pos, (model.forward_share(seq_share_neg_a, pos) * mask_a).sum(1))
    sim_b_pos = model.D_b(hy_mean_pos, (h_share_pos * mask_a).sum(1))
    sim_b_neg = model.D_b(
        hy_mean_pos, (model.forward_share(seq_share_neg_b, pos) * mask_b).sum(1))
    ones = torch.ones(n_batch, 1)
    zeros = torch.zeros(n_batch, 1)
    loss_mi = (F.binary_cross_entropy_with_logits(sim_a_pos, ones)
               + F.binary_cross_entropy_with_logits(sim_a_neg, zeros)
               + F.binary_cross_entropy_with_logits(sim_b_pos, ones)
               + F.binary_cross_entropy_with_logits(sim_b_neg, zeros))

    R = trainer.len_rec
    h_share_rec = h_share_pos[:, -R:, :]
    h_a_rec = hx_pos[:, -R:]
    h_b_rec = hy_pos[:, -R:]
    gt_share_a = gt_share_a[:, -R:]
    gt_share_b = gt_share_b[:, -R:]
    gt_a = gt_a[:, -R:]
    gt_b = gt_b[:, -R:]
    na, nb = trainer.n_item_a, trainer.n_item_b
    scores_share_a = torch.cat((model.classifier_a(h_share_rec),
                                model.classifier_pad(h_share_rec)), dim=-1)
    scores_share_b = torch.cat((model.classifier_b(h_share_rec),
                                model.classifier_pad(h_share_rec)), dim=-1)
    scores_a = torch.cat((model.classifier_a(h_share_rec + h_a_rec),
                          model.classifier_pad(h_a_rec)), dim=-1)
    scores_b = torch.cat((model.classifier_b(h_share_rec + h_b_rec),
                          model.classifier_pad(h_b_rec)), dim=-1)
    loss_share_a = F.cross_entropy(scores_share_a.reshape(-1, na + 1),
                                   gt_share_a.reshape(-1), ignore_index=na)
    loss_share_b = F.cross_entropy(scores_share_b.reshape(-1, nb + 1),
                                   gt_share_b.reshape(-1), ignore_index=nb)
    loss_share = (loss_share_a * (gt_share_a != na).sum() / (R * n_batch)
                  + loss_share_b * (gt_share_b != nb).sum() / (R * n_batch))
    loss_a = F.cross_entropy(scores_a.reshape(-1, na + 1),
                             gt_a.reshape(-1), ignore_index=na)
    loss_b = F.cross_entropy(scores_b.reshape(-1, nb + 1),
                             gt_b.reshape(-1), ignore_index=nb)
    loss_rec = loss_share + loss_a + loss_b
    loss_batch = (trainer.lambda_loss * loss_rec
                  + (1 - trainer.lambda_loss) * loss_mi)
    return loss_batch, loss_rec, loss_mi
