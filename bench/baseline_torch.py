"""Measure the PyTorch reference's training throughput (the bench baseline).

Drives the UNMODIFIED reference code at /root/reference (pure import, no
copying): generates synthetic Food-Kitchen-scale raw data in a temp dir,
builds the reference Trainer with ``use_raw``, and times its hot loop
(``model.convolve_graph() + trainer.train_batch(batch)``, trainer.py:47-49)
on CPU — the reference's only portable device here.

Writes bench_baseline.json {examples_per_s, n_items, batch_size, device}.
Run once; bench.py reads the cached result.
"""

from __future__ import annotations

import json
import os
import sys
import time
from types import SimpleNamespace

REFERENCE = os.environ.get("C2DSR_REFERENCE", "/root/reference")


def build_args(tmp: str, n_item_a: int, n_item_b: int, batch_size: int):
    return SimpleNamespace(
        data="fk", dataset="Food-Kitchen", len_rec=10, use_raw=True,
        n_neg_sample=999, zip_ee=False, d_latent=128,
        disable_embed_l2=False, shared_item_embed=False, d_bias=False,
        n_gnn=1, dropout_gnn=0.2, n_attn=1, n_head=1, dropout_attn=0.2,
        norm_first=False, lr=1e-3, lr_decay=0.1, l2=5e-4, lr_gamma=0.5,
        lr_step=10, n_lr_decay=5, decay_epoch=5, max_grad_norm=5.0,
        len_max=15, lambda_loss=0.7, seed=3407, n_epoch=1,
        batch_size=batch_size, batch_size_eval=2048, num_workers=0,
        es_patience=10, save_processed=False,
        path_raw=os.path.join(tmp, "raw"), path_data=os.path.join(tmp, "proc"),
        n_item_a=n_item_a, n_item_b=n_item_b,
    )


def main(n_users=4096, n_item_a=29207, n_item_b=34886, batch_size=512,
         n_batches=8, out="bench_baseline.json"):
    import tempfile

    import torch

    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from c2dsr_tpu.config import DataSpec
    from c2dsr_tpu.data import synthetic

    spec = DataSpec(n_item_a=n_item_a, n_item_b=n_item_b, len_max=15)
    tmp = tempfile.mkdtemp(prefix="c2dsr_ref_bench_")
    raw_dir = os.path.join(tmp, "raw")
    os.makedirs(os.path.join(tmp, "proc"), exist_ok=True)
    seqs = synthetic.generate_sequences(spec, n_users, seed=0)
    for mode in ("train", "val", "test"):
        synthetic.write_reference_tsv(seqs,
                                      os.path.join(raw_dir, f"{mode}_new.txt"))
    synthetic.write_item_lists(spec, raw_dir)

    args = build_args(tmp, n_item_a, n_item_b, batch_size)
    args.device = torch.device("cpu")

    from trainer import Trainer  # reference module

    class _Noter:
        def log_msg(self, m):
            print(m)

    trainer = Trainer(args, _Noter())
    it = iter(trainer.trainloader)
    trainer.model.train()

    # warmup
    batch = next(it)
    trainer.model.convolve_graph()
    trainer.train_batch(batch)

    n_ex = 0
    t0 = time.time()
    for _ in range(n_batches):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(trainer.trainloader)
            batch = next(it)
        trainer.model.convolve_graph()
        trainer.train_batch(batch)
        n_ex += batch[0].shape[0]
    dt = time.time() - t0
    result = {
        "examples_per_s": n_ex / dt,
        "n_items": n_item_a + n_item_b + 1,
        "batch_size": batch_size,
        "device": "cpu (torch reference)",
        "n_batches": n_batches,
        "torch_threads": torch.get_num_threads(),
    }
    print(json.dumps(result))
    with open(out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
