"""Bridges to the PyTorch reference implementation (parity verification).

Everything here drives the UNMODIFIED reference at $C2DSR_REFERENCE
(default /root/reference) by import — no reference code is copied:

* :func:`build_reference_trainer` — construct the reference ``Trainer``
  (trainer.py:13-38) on a raw-data directory with an argparse-shaped
  namespace matching main.py:15-89's defaults.
* :func:`params_from_torch` — map the reference C2DSR module's parameters
  (or their ``.grad``s) onto this framework's params pytree, including the
  vocab-padding layout (config.padded_sizes).
* :func:`train_arrays_from_dataset` / :func:`eval_arrays_from_dataset` —
  export a reference ``CDSRDataset``'s preprocessed examples as packed
  numpy arrays in this framework's batch layout, so BOTH frameworks can be
  fed bit-identical inputs (incl. the reference's corrupted sequences and
  eval negative lists, whose RNG streams we deliberately do not reproduce —
  SURVEY.md section 7 "ship the exact negative lists as data").

Used by tests/test_reference_parity.py (one-step loss+grad parity) and
tools/parity_run.py (epoch-scale trajectory parity).
"""

from __future__ import annotations

import os
import sys
from types import SimpleNamespace
from typing import Dict

import numpy as np

REFERENCE = os.environ.get("C2DSR_REFERENCE", "/root/reference")

TRAIN_FIELDS = ("seq_share", "seq_share_a", "seq_share_b", "pos", "pos_a",
                "pos_b", "gt_share_a", "gt_share_b", "gt_a", "gt_b",
                "gt_mask_a", "gt_mask_b", "seq_share_neg_a",
                "seq_share_neg_b")
EVAL_FIELDS = ("seq_share", "seq_share_a", "seq_share_b", "pos", "pos_a",
               "pos_b", "idx_last_a", "idx_last_b", "xory_last", "gt_last",
               "list_neg")


def reference_args(raw_dir: str, proc_dir: str, n_item_a: int, n_item_b: int,
                   **overrides) -> SimpleNamespace:
    """The reference's argparse namespace with main.py:15-89 defaults."""
    import torch
    args = SimpleNamespace(
        data="fk", dataset="Food-Kitchen", len_rec=10, use_raw=True,
        n_neg_sample=999, zip_ee=False, d_latent=128,
        disable_embed_l2=False, shared_item_embed=False, d_bias=False,
        n_gnn=1, dropout_gnn=0.2, n_attn=1, n_head=1, dropout_attn=0.2,
        norm_first=False, lr=1e-3, lr_decay=0.1, l2=5e-4, lr_gamma=0.5,
        lr_step=10, n_lr_decay=5, decay_epoch=5, max_grad_norm=5.0,
        len_max=15, lambda_loss=0.7, seed=3407, n_epoch=1,
        batch_size=512, batch_size_eval=2048, num_workers=0,
        es_patience=10, save_processed=False,
        path_raw=raw_dir, path_data=proc_dir,
        n_item_a=n_item_a, n_item_b=n_item_b,
        n_item=n_item_a + n_item_b + 1, idx_pad=n_item_a + n_item_b,
        device=torch.device("cpu"),
    )
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def build_reference_trainer(args):
    """Import the reference and build its Trainer (seeded like main.py:92)."""
    import random

    import torch
    sys.path.insert(0, REFERENCE)
    try:
        # main.py:92-96 seeding (python random drives preprocessing sampling)
        random.seed(args.seed)
        torch.manual_seed(args.seed)
        np.random.seed(args.seed)
        from trainer import Trainer  # reference module

        class _Noter:
            def log_msg(self, m):
                pass

        return Trainer(args, _Noter())
    finally:
        sys.path.remove(REFERENCE)


def _t2n(t):
    return t.detach().cpu().numpy().astype(np.float32)


def params_from_torch(model, cfg, spec, grad: bool = False):
    """Map the reference C2DSR module (or its .grad tensors) to our pytree.

    Tables/classifiers are padded to config.padded_sizes with zero rows/cols
    (padding never receives gradient on either side).  Torch ``Linear``
    weights are [out, in] — transposed to this framework's [in, out].
    """
    import jax
    import jax.numpy as jnp

    from c2dsr_tpu.config import padded_sizes

    n_p, na_p, nb_p = padded_sizes(cfg, spec)

    def src(t):
        if not grad:
            return _t2n(t)
        return (np.zeros(tuple(t.shape), np.float32) if t.grad is None
                else _t2n(t.grad))

    def pad_rows(a, n_rows):
        return np.concatenate(
            [a, np.zeros((n_rows - a.shape[0], a.shape[1]), np.float32)])

    def pad_cols(a, n_cols):
        return np.concatenate(
            [a, np.zeros((a.shape[0], n_cols - a.shape[1]), np.float32)],
            axis=1)

    def enc(attn):
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
        # --shared_item_embed aliases all three tables (C2DSR.py:21-26); our
        # pytree then carries only embed_share (model/c2dsr.py:54-57)
        p["embed_a"] = pad_rows(src(model.embed_i_a.weight), n_p)
        p["embed_b"] = pad_rows(src(model.embed_i_b.weight), n_p)
    if cfg.d_bias:
        p["D_a_b"] = src(model.D_a.bias)
        p["D_b_b"] = src(model.D_b.bias)
    return jax.tree.map(jnp.asarray, p)


def _stack(ds, fields) -> Dict[str, np.ndarray]:
    cols = {k: [] for k in fields}
    for ex in ds.data:
        for k, v in zip(fields, ex):
            cols[k].append(v)
    out = {}
    for k, v in cols.items():
        a = np.asarray(v, dtype=np.int32)
        # the reference wraps eval scalars in 1-element lists
        # (dataloader.py:218-226)
        if a.ndim == 2 and a.shape[1] == 1 and k != "list_neg":
            a = a[:, 0]
        out[k] = a
    return out


def train_arrays_from_dataset(ds) -> Dict[str, np.ndarray]:
    """Reference CDSRDataset (train mode) -> our packed train arrays
    (14 fields, dataloader.py:159-160), preserving its corrupted
    sequences exactly."""
    return _stack(ds, TRAIN_FIELDS)


def eval_arrays_from_dataset(ds) -> Dict[str, np.ndarray]:
    """Reference CDSRDataset (val/test mode) -> our packed eval arrays
    (11 fields, dataloader.py:218-226), preserving its negative lists
    exactly."""
    return _stack(ds, EVAL_FIELDS)
