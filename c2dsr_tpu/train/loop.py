"""Experiment driver: epoch loop, model selection, early stop.

Reproduces main.py:100-148 — per epoch: train over all batches (graph
propagation inside each step), validate with ranking, compute the improvement
scalar, keep the test metrics from the best-validation epoch, early-stop
after ``es_patience`` non-improving epochs.  Adds what the reference lacks:
throughput counters, checkpoint save-on-best + resume (cfg.resume restores
params/opt-state/step AND the best-validation bookkeeping, continuing from
the best epoch's state), first-epoch ``jax.profiler`` tracing
(cfg.profile_dir), and a NaN-failfast debug mode (cfg.debug_nans).

Loss accumulation stays ON DEVICE across the epoch (one host sync at the
epoch boundary) so step dispatch overlaps execution — a per-step ``float()``
would serialize host and device every batch.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from c2dsr_tpu.config import Config, DataSpec
from c2dsr_tpu import checkpoint as ckpt_mod
from c2dsr_tpu import metrics as metrics_mod
from c2dsr_tpu.data.pipeline import BatchIterator
from c2dsr_tpu.evaluate import ranker
from c2dsr_tpu.model import c2dsr, params as params_mod
from c2dsr_tpu.noter import Noter
from c2dsr_tpu.train import optim, step as step_mod


class Experiment:
    """Owns data splits, graphs, model state, and the jitted step functions."""

    def __init__(self, cfg: Config, spec: DataSpec, graphs: c2dsr.Graphs,
                 train_data: Dict[str, np.ndarray],
                 val_data: Dict[str, np.ndarray],
                 test_data: Dict[str, np.ndarray],
                 noter: Optional[Noter] = None,
                 ckpt_path: Optional[str] = None):
        self.cfg, self.spec, self.graphs = cfg, spec, graphs
        self.noter = noter
        self.ckpt_path = ckpt_path
        # multi-host: every process computes the same permutation and feeds
        # its contiguous slice of each global batch (parallel/distributed.py)
        self._pc = jax.process_count()
        self._pi = jax.process_index()
        self.train_iter = BatchIterator(train_data, cfg.batch_size,
                                        shuffle=True, seed=cfg.seed,
                                        process_index=self._pi,
                                        process_count=self._pc)
        self.val_data, self.test_data = val_data, test_data
        self.n_tr = self.train_iter.n

        steps_per_epoch = max(len(self.train_iter), 1)
        self.optimizer = optim.make_optimizer(cfg, steps_per_epoch)
        key = jax.random.PRNGKey(cfg.seed)
        k_init, _ = jax.random.split(key)
        # step/dropout stream: hardware-friendly PRNG on TPU (the per-step
        # full-table GNN dropout is threefry-bound otherwise)
        self.k_step = jax.random.key(cfg.seed + 1,
                                     impl=cfg.resolved_train_prng())
        params = params_mod.init_params(k_init, cfg, spec)
        self.state = step_mod.init_state(params, self.optimizer)

        # multi-chip: build the mesh, shard state by the parallel/mesh.py
        # rules, and route table ops through explicit collectives
        self.mesh = None
        if cfg.mesh_data * cfg.mesh_model > 1:
            from c2dsr_tpu.parallel import mesh as mesh_mod
            self.mesh = mesh_mod.make_mesh(cfg.mesh_data, cfg.mesh_model)
            self.state = jax.device_put(
                self.state, mesh_mod.state_shardings(self.state, self.mesh))
            if cfg.mesh_model > 1:
                # precompute the all-to-all SpMM schedules for both graphs
                from c2dsr_tpu.config import padded_sizes
                from c2dsr_tpu.ops import spmm as spmm_mod
                n_p = padded_sizes(cfg, spec)[0]
                self.graphs = graphs = c2dsr.Graphs(
                    share=spmm_mod.attach_a2a_plan(graphs.share, n_p,
                                                   cfg.mesh_model),
                    specific=spmm_mod.attach_a2a_plan(graphs.specific, n_p,
                                                      cfg.mesh_model))

        self.train_step = step_mod.make_train_step(
            cfg, spec, graphs, self.optimizer, self.k_step, mesh=self.mesh)
        self.convolve_eval, self.rank_step = ranker.make_eval_fns(
            cfg, spec, graphs, mesh=self.mesh)
        self._reset_accum = jax.jit(optim.reset_grad_accum)
        self._profiled = False
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)

        # resume: restore TrainState + best-validation bookkeeping
        self._start_epoch = 0
        self._best = {"imp_val_best": -1.0, "res_test": [0.0] * 13,
                      "es_counter": 0}
        if ckpt_path and cfg.resume and ckpt_mod.exists(ckpt_path):
            restored = ckpt_mod.restore(ckpt_path, template=self.state)
            self.state = step_mod.TrainState(*restored)
            if self.mesh is not None:
                from c2dsr_tpu.parallel import mesh as mesh_mod
                self.state = jax.device_put(
                    self.state,
                    mesh_mod.state_shardings(self.state, self.mesh))
            meta = ckpt_mod.load_meta(ckpt_path)
            self._start_epoch = int(meta.get("epoch", 0))
            for k in self._best:
                if k in meta:
                    self._best[k] = meta[k]
            if self.noter:
                self.noter.log_msg(
                    f"[Info] resumed from {ckpt_path} at epoch "
                    f"{self._start_epoch} (best improvement "
                    f"{self._best['imp_val_best']:.4f})")

    # ----- phases ----------------------------------------------------------
    def run_train_epoch(self):
        t0 = time.time()
        # device-resident epoch totals: [loss, rec, mi] example-weighted sums
        # + the real example count (one host sync at the epoch boundary)
        tot = jnp.zeros(4, jnp.float32)
        if self.cfg.bug_epoch_grad_accum:
            # reference parity: optimizer.zero_grad() once per epoch
            # (trainer.py:42) — clear the running gradient sum
            self.state = self.state._replace(
                opt_state=self._reset_accum(self.state.opt_state))
        profiling = bool(self.cfg.profile_dir) and not self._profiled
        if profiling:
            jax.profiler.start_trace(self.cfg.profile_dir)
        try:
            for batch in self.train_iter.epoch():
                if self._pc > 1:
                    from c2dsr_tpu.parallel import mesh as mesh_mod
                    batch = mesh_mod.global_batch(batch, self.mesh)
                self.state, aux = self.train_step(self.state, batch)
                # real (unpadded) example count: device scalar from the step
                # when the pipeline emits a validity mask, else the batch dim
                bs = aux.get("n_examples", batch["seq_share"].shape[0])
                tot = tot + jnp.stack([aux["loss"] * bs,
                                       aux["loss_rec"] * bs,
                                       aux["loss_mi"] * bs, bs * 1.0])
        finally:
            if profiling:
                jax.block_until_ready(tot)
                jax.profiler.stop_trace()
                self._profiled = True
        tot = np.asarray(tot)               # the single host sync
        dt = time.time() - t0
        if self.cfg.debug_nans and not np.isfinite(tot).all():
            raise FloatingPointError(
                f"non-finite training loss: {tot.tolist()}")
        n = float(tot[3])
        loss_tr, loss_rec, loss_mi = (tot[:3] / max(n, 1.0)).tolist()
        if self.noter:
            self.noter.log_train(loss_tr, loss_rec, loss_mi, dt,
                                 examples_per_s=n / max(dt, 1e-9))
        return loss_tr, loss_rec, loss_mi

    def run_eval(self, data) -> tuple:
        hi = self.convolve_eval(self.state.params)
        to_global = None
        if self._pc > 1:
            from c2dsr_tpu.parallel import mesh as mesh_mod

            def to_global(chunk):
                b = next(iter(chunk.values())).shape[0]
                k = b // self._pc
                lo = self._pi * k
                return mesh_mod.global_batch(
                    {kk: v[lo:lo + k] for kk, v in chunk.items()}, self.mesh)

        return ranker.evaluate_split(self.state.params, hi, data,
                                     self.rank_step, self.cfg,
                                     to_global=to_global)

    # ----- full experiment -------------------------------------------------
    def run(self) -> Dict[str, object]:
        cfg = self.cfg
        imp_val_best = float(self._best["imp_val_best"])
        res_test_imp = list(self._best["res_test"])
        es_counter = int(self._best["es_counter"])
        epoch = self._start_epoch
        for epoch in range(self._start_epoch + 1, cfg.n_epoch + 1):
            if self.noter:
                self.noter.log_msg(f"\n[Epoch {epoch}]")
            self.run_train_epoch()
            ranks_a, ranks_b = self.run_eval(self.val_data)
            res_val = metrics_mod.cal_score(ranks_a, ranks_b, cfg.benchmark)
            if self.noter:
                self.noter.log_evaluate("valid", res_val)

            if res_val[0] > imp_val_best:
                imp_val_best = res_val[0]
                ranks_a, ranks_b = self.run_eval(self.test_data)
                res_test_imp = metrics_mod.cal_score(ranks_a, ranks_b,
                                                     cfg.benchmark)
                if self.noter:
                    self.noter.log_evaluate("test", res_test_imp)
                es_counter = 0
                if self.ckpt_path:
                    ckpt_mod.save(self.ckpt_path, self.state,
                                  meta={"epoch": epoch,
                                        "imp_val_best": imp_val_best,
                                        "res_test": list(res_test_imp),
                                        "es_counter": es_counter})
            else:
                es_counter += 1
                if self.noter:
                    self.noter.log_msg(
                        f"\t| es    | {es_counter} / {cfg.es_patience} |")
                if es_counter >= cfg.es_patience:
                    break

        if self.ckpt_path:
            ckpt_mod.wait()      # join the last async save-on-best commit
        if self.noter:
            self.noter.log_final_result(epoch, imp_val_best, res_test_imp)
        return {"epoch": epoch, "imp_val_best": imp_val_best,
                "res_test": res_test_imp}
