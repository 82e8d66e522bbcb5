"""Epoch-scale quality parity vs the ACTUAL PyTorch reference.

The strongest quality evidence buildable without the missing real splits
(SURVEY.md `.MISSING_LARGE_BLOBS`): run the UNMODIFIED reference
(main.py:110-148, trainer.py:40-83) and this framework over the SAME
synthetic corpus for several epochs with dropout disabled and the
bug-parity switches on, feeding both sides bit-identical preprocessed
examples (including the reference's own corrupted sequences and eval
negative lists, exported via c2dsr_tpu.utils.torch_port), and compare:

  * per-epoch training losses (total / rec / mi, the run_epoch means,
    trainer.py:50-57) across many optimizer steps + the StepLR decay
    (lr_step is shrunk so the schedule actually fires during the run);
  * per-epoch validation RANKS, element-wise, computed against the
    reference's exact negative lists (dataloader.py:216-226);
  * the derived metric tables (cal_score) both sides.

The reference's DataLoader shuffles; to keep both trajectories on the same
batch sequence this harness drives trainer.train_batch directly over an
unshuffled loader (batch order = dataset order on both sides) and calls
optimizer.zero_grad() once per epoch exactly like run_epoch (trainer.py:42)
— mirrored on our side by cfg.bug_epoch_grad_accum.

Writes PARITY_RUN.json.  Residual divergence sources: f32 summation order
(accumulates over optimizer steps) and score ties at eval.  Run with the
default backend="xla" + highest matmul precision for the tightest bound; a
second section records the TPU fast path (Pallas kernels, bf16 matmuls)
against the same oracle to quantify the production path's drift.

Usage: python tools/parity_run.py [--epochs 4] [--fast]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ref_epoch_losses(trainer, loader, sched):
    """One reference training epoch, run_epoch semantics (trainer.py:40-57)
    at fixed batch order; returns the epoch-mean (loss, rec, mi)."""
    trainer.model.train()
    trainer.optimizer.zero_grad()
    tot = np.zeros(3)
    n = 0
    for batch in loader:
        trainer.model.convolve_graph()
        lt, lr_, lm = trainer.train_batch(batch)
        b = batch[0].shape[0]
        tot += np.array([lt.item(), lr_.item(), lm.item()]) * b
        n += b
    sched.step()
    return tot / n


def _ref_eval_ranks(trainer):
    trainer.model.eval()
    import torch
    ra, rb = [], []
    with torch.no_grad():
        trainer.model.convolve_graph()
        for batch in trainer.valloader:
            a, b = trainer.evaluate_batch(batch)
            ra += a
            rb += b
    return ra, rb


def run(n_users=576, n_val=192, na=300, nb=400, d_latent=64, batch_size=64,
        n_epochs=4, lr_step=2, n_neg=99, seed=3407, backend="xla",
        compute_dtype="float32", highest_precision=True,
        pallas_interpret=False):
    import jax

    if highest_precision:
        jax.config.update("jax_default_matmul_precision", "highest")
    else:
        # reset in case a prior run() in this process raised it — the fast
        # path must measure PRODUCTION numerics (default precision)
        jax.config.update("jax_default_matmul_precision", "default")
    import jax.numpy as jnp

    from c2dsr_tpu import metrics
    from c2dsr_tpu.config import Config, DataSpec
    from c2dsr_tpu.data import raw as raw_mod
    from c2dsr_tpu.data import synthetic
    from c2dsr_tpu.evaluate import ranker
    from c2dsr_tpu.graph import build as graph_build
    from c2dsr_tpu.model import c2dsr
    from c2dsr_tpu.ops import spmm
    from c2dsr_tpu.train import optim, step as step_mod
    from c2dsr_tpu.utils import torch_port

    import torch
    from torch.utils.data import DataLoader

    spec = DataSpec(n_item_a=na, n_item_b=nb, len_max=15)
    tmp = tempfile.mkdtemp(prefix="c2dsr_parity_")
    raw_dir = os.path.join(tmp, "raw")
    os.makedirs(os.path.join(tmp, "proc"), exist_ok=True)
    train_seqs = synthetic.generate_sequences(spec, n_users, seed=11)
    val_seqs = synthetic.generate_sequences(spec, n_val, seed=12)
    synthetic.write_reference_tsv(train_seqs,
                                  os.path.join(raw_dir, "train_new.txt"))
    synthetic.write_reference_tsv(val_seqs,
                                  os.path.join(raw_dir, "val_new.txt"))
    synthetic.write_reference_tsv(val_seqs,
                                  os.path.join(raw_dir, "test_new.txt"))
    synthetic.write_item_lists(spec, raw_dir)

    # ---- reference side ----------------------------------------------------
    args = torch_port.reference_args(
        raw_dir, os.path.join(tmp, "proc"), na, nb,
        d_latent=d_latent, batch_size=batch_size, batch_size_eval=256,
        n_neg_sample=n_neg, dropout_gnn=0.0, dropout_attn=0.0,
        lr_step=lr_step, seed=seed)
    trainer = torch_port.build_reference_trainer(args)
    fixed_loader = DataLoader(trainer.trainloader.dataset,
                              batch_size=batch_size, shuffle=False,
                              num_workers=0)
    sched = torch.optim.lr_scheduler.StepLR(
        trainer.optimizer, step_size=lr_step, gamma=args.lr_gamma)

    train_arr = torch_port.train_arrays_from_dataset(
        trainer.trainloader.dataset)
    val_arr = torch_port.eval_arrays_from_dataset(trainer.valloader.dataset)
    n_tr = train_arr["seq_share"].shape[0]

    # ---- our side ----------------------------------------------------------
    cfg = Config(data="fk", d_latent=d_latent, dropout_gnn=0.0,
                 dropout_attn=0.0, lr_step=lr_step, batch_size=batch_size,
                 batch_size_eval=256, n_neg_sample=n_neg, eval_mode="sampled",
                 kernel_backend=backend, compute_dtype=compute_dtype,
                 pallas_interpret=pallas_interpret,
                 bug_inverted_padding_mask=True, bug_epoch_grad_accum=True)
    if pallas_interpret and jax.default_backend() != "tpu":
        # engage the fused-encoder kernel's interpreter too (its toggle is
        # process-local, ops/encoder_pallas.py:500)
        from c2dsr_tpu.ops import encoder_pallas
        encoder_pallas.st_interpret.set(True)
    seqs = raw_mod.parse_interactions(os.path.join(raw_dir, "train_new.txt"))
    g_share, g_spec = graph_build.build_graphs(seqs, spec)
    graphs = c2dsr.Graphs(share=spmm.device_graph(g_share),
                          specific=spmm.device_graph(g_spec))
    params = torch_port.params_from_torch(trainer.model, cfg, spec)
    n_batches = -(-n_tr // batch_size)
    optimizer = optim.make_optimizer(cfg, steps_per_epoch=n_batches)
    state = step_mod.init_state(params, optimizer)
    train_step = step_mod.make_train_step(cfg, spec, graphs, optimizer,
                                          jax.random.PRNGKey(0))
    convolve_eval, rank_step = ranker.make_eval_fns(cfg, spec, graphs)

    batches = []
    for s in range(0, n_tr, batch_size):
        e = min(s + batch_size, n_tr)
        batches.append({k: jnp.asarray(v[s:e]) for k, v in train_arr.items()})

    report = {"config": {
        "n_users": n_users, "n_val": n_val, "na": na, "nb": nb,
        "d_latent": d_latent, "batch_size": batch_size, "n_epochs": n_epochs,
        "lr_step": lr_step, "n_neg": n_neg, "n_train_examples": int(n_tr),
        "n_val_examples": int(val_arr["gt_last"].shape[0]),
        "backend": backend, "compute_dtype": compute_dtype,
        "highest_precision": highest_precision,
        "bug_parity": ["bug_inverted_padding_mask", "bug_epoch_grad_accum"],
        "dropout": 0.0}, "epochs": []}

    for epoch in range(1, n_epochs + 1):
        t0 = time.time()
        ref_losses = _ref_epoch_losses(trainer, fixed_loader, sched)
        ref_ra, ref_rb = _ref_eval_ranks(trainer)

        state = state._replace(
            opt_state=optim.reset_grad_accum(state.opt_state))
        tot = np.zeros(3)
        for b in batches:
            state, aux = train_step(state, b)
            nb_ = int(b["seq_share"].shape[0])
            tot += np.array([float(aux["loss"]), float(aux["loss_rec"]),
                             float(aux["loss_mi"])]) * nb_
        our_losses = tot / n_tr
        hi = convolve_eval(state.params)
        our_ra, our_rb = ranker.evaluate_split(state.params, hi, val_arr,
                                               rank_step, cfg, mode="sampled")

        agree_a = float(np.mean(np.array(ref_ra) == np.array(our_ra)))
        agree_b = float(np.mean(np.array(ref_rb) == np.array(our_rb)))
        # ranks that differ do so by score ties/noise; bound the displacement
        max_dr = int(max(
            np.abs(np.array(ref_ra) - np.array(our_ra)).max(initial=0),
            np.abs(np.array(ref_rb) - np.array(our_rb)).max(initial=0)))
        ref_score = metrics.cal_score(ref_ra, ref_rb, cfg.benchmark)
        our_score = metrics.cal_score(our_ra, our_rb, cfg.benchmark)

        row = {
            "epoch": epoch,
            "lr_ref": sched.get_last_lr()[0],
            "ref_loss": [round(x, 6) for x in ref_losses.tolist()],
            "our_loss": [round(x, 6) for x in our_losses.tolist()],
            "abs_loss_delta": [round(abs(a - b), 6) for a, b in
                               zip(ref_losses, our_losses)],
            "rank_agreement_a": round(agree_a, 4),
            "rank_agreement_b": round(agree_b, 4),
            "max_rank_displacement": max_dr,
            "ref_improve": round(ref_score[0], 6),
            "our_improve": round(our_score[0], 6),
            "metric_max_abs_delta": round(max(
                abs(a - b) for a, b in zip(ref_score[1:], our_score[1:])), 6),
            "wall_s": round(time.time() - t0, 1),
        }
        report["epochs"].append(row)
        print(json.dumps(row))

    return report


def run_stochastic(n_seeds=5, n_users=576, n_val=192, na=300, nb=400,
                   d_latent=64, batch_size=64, n_epochs=4, lr_step=2,
                   n_neg=99, dropout=0.2):
    """Dropout-ON distribution parity (round-5 verdict #6).

    The deterministic sections prove trajectory parity with dropout off;
    this proves the PRODUCTION stochastic dynamics (dropout 0.2, the
    reference's training default) land inside the reference's own
    seed-to-seed spread.  For each of ``n_seeds`` seeds: build the
    reference trainer (torch init + torch dropout stream), snapshot its
    INIT into our params (bit-identical starting point per pair), then
    train both sides on the same fixed batch order — the only difference
    within a pair is each side's dropout realization (torch RNG vs our
    rbg/threefry streams).  Reports per-epoch loss spread (min/max/mean
    across seeds per side) and final sampled metrics, with the containment
    checks recorded (our mean trajectory inside the reference's seed
    envelope widened by its own spread)."""
    import jax

    jax.config.update("jax_default_matmul_precision", "default")
    import jax.numpy as jnp

    from c2dsr_tpu import metrics
    from c2dsr_tpu.config import Config, DataSpec
    from c2dsr_tpu.data import raw as raw_mod
    from c2dsr_tpu.data import synthetic
    from c2dsr_tpu.evaluate import ranker
    from c2dsr_tpu.graph import build as graph_build
    from c2dsr_tpu.model import c2dsr
    from c2dsr_tpu.ops import spmm
    from c2dsr_tpu.train import optim, step as step_mod
    from c2dsr_tpu.utils import torch_port

    import torch
    from torch.utils.data import DataLoader

    spec = DataSpec(n_item_a=na, n_item_b=nb, len_max=15)
    tmp = tempfile.mkdtemp(prefix="c2dsr_parity_sto_")
    raw_dir = os.path.join(tmp, "raw")
    os.makedirs(os.path.join(tmp, "proc"), exist_ok=True)
    train_seqs = synthetic.generate_sequences(spec, n_users, seed=11)
    val_seqs = synthetic.generate_sequences(spec, n_val, seed=12)
    synthetic.write_reference_tsv(train_seqs,
                                  os.path.join(raw_dir, "train_new.txt"))
    synthetic.write_reference_tsv(val_seqs,
                                  os.path.join(raw_dir, "val_new.txt"))
    synthetic.write_reference_tsv(val_seqs,
                                  os.path.join(raw_dir, "test_new.txt"))
    synthetic.write_item_lists(spec, raw_dir)

    cfg = Config(data="fk", d_latent=d_latent, dropout_gnn=dropout,
                 dropout_attn=dropout, lr_step=lr_step,
                 batch_size=batch_size, batch_size_eval=256,
                 n_neg_sample=n_neg, eval_mode="sampled",
                 kernel_backend="auto", compute_dtype="auto",
                 bug_inverted_padding_mask=True, bug_epoch_grad_accum=True)
    seqs = raw_mod.parse_interactions(os.path.join(raw_dir, "train_new.txt"))
    g_share, g_spec = graph_build.build_graphs(seqs, spec)
    graphs = c2dsr.Graphs(share=spmm.device_graph(g_share),
                          specific=spmm.device_graph(g_spec))

    seeds = [3407 + 1000 * i for i in range(n_seeds)]
    ref_losses = []          # [seed][epoch] total loss
    our_losses = []
    ref_final = []           # final-epoch sampled improve
    our_final = []

    for s in seeds:
        args = torch_port.reference_args(
            raw_dir, os.path.join(tmp, "proc"), na, nb,
            d_latent=d_latent, batch_size=batch_size, batch_size_eval=256,
            n_neg_sample=n_neg, dropout_gnn=dropout, dropout_attn=dropout,
            lr_step=lr_step, seed=s)
        trainer = torch_port.build_reference_trainer(args)
        fixed_loader = DataLoader(trainer.trainloader.dataset,
                                  batch_size=batch_size, shuffle=False,
                                  num_workers=0)
        sched = torch.optim.lr_scheduler.StepLR(
            trainer.optimizer, step_size=lr_step, gamma=args.lr_gamma)
        params0 = torch_port.params_from_torch(trainer.model, cfg, spec)
        train_arr = torch_port.train_arrays_from_dataset(
            trainer.trainloader.dataset)
        val_arr = torch_port.eval_arrays_from_dataset(
            trainer.valloader.dataset)
        n_tr = train_arr["seq_share"].shape[0]
        batches = []
        for st in range(0, n_tr, batch_size):
            e = min(st + batch_size, n_tr)
            batches.append({k: jnp.asarray(v[st:e])
                            for k, v in train_arr.items()})

        # reference trajectory for this seed
        rl = []
        for _ in range(n_epochs):
            rl.append(float(_ref_epoch_losses(trainer, fixed_loader,
                                              sched)[0]))
        ra, rb = _ref_eval_ranks(trainer)
        ref_losses.append(rl)
        ref_final.append(float(metrics.cal_score(ra, rb, cfg.benchmark)[0]))

        # our trajectory from the SAME init, our dropout stream
        n_batches = -(-n_tr // batch_size)
        optimizer = optim.make_optimizer(cfg, steps_per_epoch=n_batches)
        state = step_mod.init_state(params0, optimizer)
        train_step = step_mod.make_train_step(
            cfg, spec, graphs, optimizer,
            jax.random.key(s, impl=cfg.resolved_train_prng()))
        convolve_eval, rank_step = ranker.make_eval_fns(cfg, spec, graphs)
        ol = []
        for _ in range(n_epochs):
            state = state._replace(
                opt_state=optim.reset_grad_accum(state.opt_state))
            tot, n = 0.0, 0
            for b in batches:
                state, aux = train_step(state, b)
                nb_ = int(b["seq_share"].shape[0])
                tot += float(aux["loss"]) * nb_
                n += nb_
            ol.append(tot / n)
        hi = convolve_eval(state.params)
        oa, ob = ranker.evaluate_split(state.params, hi, val_arr, rank_step,
                                       cfg, mode="sampled")
        our_losses.append(ol)
        our_final.append(float(metrics.cal_score(oa, ob, cfg.benchmark)[0]))
        print(f"seed {s}: ref loss {['%.4f' % x for x in rl]} "
              f"final {ref_final[-1]:.4f} | ours "
              f"{['%.4f' % x for x in ol]} final {our_final[-1]:.4f}",
              flush=True)

    ref_arr = np.array(ref_losses)       # [seeds, epochs]
    our_arr = np.array(our_losses)
    spread = ref_arr.max(0) - ref_arr.min(0)
    # containment: our per-epoch mean inside the reference envelope widened
    # by half its own spread (the envelope of N samples underestimates the
    # population range)
    lo = ref_arr.min(0) - 0.5 * spread
    hi_ = ref_arr.max(0) + 0.5 * spread
    mean_in = bool(np.all((our_arr.mean(0) >= lo)
                          & (our_arr.mean(0) <= hi_)))
    fin_lo = min(ref_final) - 0.5 * (max(ref_final) - min(ref_final))
    fin_hi = max(ref_final) + 0.5 * (max(ref_final) - min(ref_final))
    fin_in = bool(fin_lo <= float(np.mean(our_final)) <= fin_hi)

    return {
        "config": {"n_seeds": n_seeds, "seeds": seeds, "dropout": dropout,
                   "n_users": n_users, "d_latent": d_latent,
                   "n_epochs": n_epochs, "backend": "auto (production)",
                   "pairing": "per-seed identical torch init + data; only "
                              "the dropout streams differ within a pair"},
        "ref_loss_by_seed": [[round(x, 5) for x in r] for r in ref_losses],
        "our_loss_by_seed": [[round(x, 5) for x in r] for r in our_losses],
        "ref_loss_mean": [round(x, 5) for x in ref_arr.mean(0)],
        "our_loss_mean": [round(x, 5) for x in our_arr.mean(0)],
        "ref_loss_spread": [round(x, 5) for x in spread],
        "ref_final_improve_by_seed": [round(x, 5) for x in ref_final],
        "our_final_improve_by_seed": [round(x, 5) for x in our_final],
        "our_mean_loss_inside_ref_envelope": mean_in,
        "our_mean_final_improve_inside_ref_envelope": fin_in,
    }


def main():
    fast = "--fast" in sys.argv
    stochastic_only = "--stochastic" in sys.argv
    n_epochs = 2 if fast else 4
    for i, a in enumerate(sys.argv):
        if a == "--epochs":
            n_epochs = int(sys.argv[i + 1])

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY_RUN.json")
    if stochastic_only and os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    else:
        out = {"oracle": "unmodified PyTorch reference at /root/reference, "
                         "f32 CPU, driven by this harness"}
        out["xla_f32"] = run(n_epochs=n_epochs)
        if not fast:
            # production TPU path (Pallas kernels; bf16 MXU matmuls inside
            # the fused CE) against the same oracle — quantifies fast-path
            # drift
            out["default_fast_path"] = run(n_epochs=n_epochs,
                                           backend="auto",
                                           compute_dtype="auto",
                                           highest_precision=False)
    if stochastic_only or not fast:
        # plain --fast (quick smoke) skips this section; --stochastic
        # always runs it, and --stochastic --fast shrinks it to 2 seeds
        out["stochastic_dropout_on"] = run_stochastic(
            n_epochs=n_epochs, n_seeds=2 if fast else 5)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
