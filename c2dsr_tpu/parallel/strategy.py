"""Parallel op strategy: how the model's table-size-dependent ops execute.

The model/step/eval code calls these four ops through a strategy object, so
the same code runs single-chip (LocalOps: plain gathers/matmuls, Pallas CE
on TPU) or table-sharded (ShardedOps: explicit shard_map collectives from
parallel/embed.py and parallel/sharded_loss.py).  Everything else — the
attention towers, discriminators, optimizer — is batch-data-parallel and
needs no strategy: GSPMD shards it along the batch axis automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from c2dsr_tpu.config import Config
from c2dsr_tpu.ops import backend as backend_mod
from c2dsr_tpu.ops import losses as losses_mod
from c2dsr_tpu.ops import spmm as spmm_mod


@dataclasses.dataclass(frozen=True)
class LocalOps:
    """Single-device (or pure-DP) implementations."""

    cfg: Config

    def lookup(self, table: jax.Array, ids: jax.Array) -> jax.Array:
        return table[ids]

    def _interpret(self) -> bool:
        """Pallas interpreter toggle: lets the production kernel path run on
        CPU (fast-path parity tests); never engages on real TPU."""
        return self.cfg.pallas_interpret and jax.default_backend() != "tpu"

    def spmm_propagate(self, graph: spmm_mod.CooDevice, h: jax.Array,
                      n_layers: int, dropout: float, rng,
                      out_flag: jax.Array | None = None) -> jax.Array:
        return spmm_mod.gcn_propagate(
            graph, h, n_layers, dropout, rng,
            backend=backend_mod.resolve(self.cfg),
            interpret=self._interpret(),
            gather_dtype=jnp.dtype(self.cfg.resolved_compute_dtype()),
            out_flag=out_flag)

    def _cls(self, w: jax.Array) -> jax.Array:
        """Classifier streaming dtype (cfg.classifier_dtype): bf16 halves
        the [d, V] weight's HBM traffic; master params stay f32 and the
        cast's autodiff returns an f32 cotangent to the optimizer."""
        if self.cfg.resolved_classifier_dtype() == "bfloat16":
            return w.astype(jnp.bfloat16)
        return w

    def ce_rows(self, h, w, b, pad_logit, targets, n_real: int) -> jax.Array:
        if backend_mod.resolve(self.cfg) == "pallas":
            from c2dsr_tpu.ops import fused_ce
            return fused_ce.fused_rec_ce_rows(h, self._cls(w), b, pad_logit,
                                              targets, n_real,
                                              interpret=self._interpret())
        logits = jnp.einsum("brd,dv->brv", h, w,
                            preferred_element_type=jnp.float32) + b
        return losses_mod.rec_ce_row_losses(logits, pad_logit, targets,
                                            n_real)

    def full_rank(self, h, w, b, gt, n_real: int) -> jax.Array:
        w = self._cls(w)
        scores = jnp.matmul(h.astype(w.dtype), w,
                            preferred_element_type=jnp.float32) + b
        if scores.shape[-1] > n_real:
            scores = jnp.where(jnp.arange(scores.shape[-1]) < n_real,
                               scores, -jnp.inf)
        gt_score = jnp.take_along_axis(scores, gt[:, None], axis=1)
        return jnp.sum(scores > gt_score, axis=1).astype(jnp.int32) + 1

    def gather_scores(self, h, w, b, ids) -> jax.Array:
        """scores[i, k] = h_i . w[:, ids[i,k]] + b[ids[i,k]].

        Full matmul + gather: the [B, V] score block is cheaper than
        materializing [d, B, K] gathered columns and rides the MXU."""
        w = self._cls(w)
        scores = jnp.matmul(h.astype(w.dtype), w,
                            preferred_element_type=jnp.float32) + b
        return jnp.take_along_axis(scores, ids, axis=1)


@dataclasses.dataclass(frozen=True)
class ShardedOps(LocalOps):
    """Row-sharded tables / vocab-sharded classifiers over mesh axis
    'model', batch sharded over 'data'."""

    mesh: Mesh = None
    batch_spec: P = P("data")

    def lookup(self, table, ids):
        from c2dsr_tpu.parallel import embed
        if self.cfg.lookup_mode == "a2a":
            return embed.a2a_lookup_replicated(table, ids, self.mesh,
                                               batch_spec=self.batch_spec)
        return embed.sharded_lookup(table, ids, self.mesh,
                                    ids_spec=self.batch_spec)

    def spmm_propagate(self, graph, h, n_layers, dropout, rng,
                       out_flag=None):
        # out_flag ignored: the row-sharded propagation is collective-bound,
        # not gather-bound, and stays dense (values identical either way)
        from c2dsr_tpu.parallel import embed
        h_sum = h
        cur = h
        for i in range(n_layers):
            if rng is not None and dropout > 0.0:
                key = jax.random.fold_in(rng, i)
                keep = jax.random.bernoulli(key, 1.0 - dropout, cur.shape)
                cur = jnp.where(keep, cur / (1.0 - dropout), 0.0)
            if getattr(graph, "a2a_plan", None) is not None:
                # scalable path: precomputed all_to_all schedule, per-device
                # traffic O(unique-sources/M * d) instead of the masked-psum
                # path's O(nnz * d) replicated broadcast
                cur = embed.sharded_spmm_a2a(graph.a2a_plan, cur, self.mesh)
            else:
                cur = embed.sharded_spmm(graph.rows, graph.cols, graph.vals,
                                         cur, self.mesh)
            h_sum = h_sum + cur
        return h_sum / (n_layers + 1)

    def ce_rows(self, h, w, b, pad_logit, targets, n_real):
        from c2dsr_tpu.parallel import sharded_loss
        use_pallas, interpret = backend_mod.use_sharded_pallas_ce(self.cfg)
        if use_pallas:
            return sharded_loss.sharded_rec_ce_rows_pallas(
                h, self._cls(w), b, pad_logit, targets, n_real, self.mesh,
                batch_spec=self.batch_spec, interpret=interpret)
        return sharded_loss.sharded_rec_ce_rows(
            h, w, b, pad_logit, targets, n_real, self.mesh,
            batch_spec=self.batch_spec)

    def full_rank(self, h, w, b, gt, n_real):
        from c2dsr_tpu.parallel import sharded_eval
        return sharded_eval.sharded_full_rank(
            h, w, b, gt, n_real, self.mesh, batch_spec=self.batch_spec)

    def gather_scores(self, h, w, b, ids):
        from c2dsr_tpu.parallel import sharded_eval
        return sharded_eval.sharded_gather_scores(
            h, w, b, ids, self.mesh, batch_spec=self.batch_spec)


def make_ops(cfg: Config, mesh: Optional[Mesh] = None):
    if mesh is not None and cfg.mesh_model > 1:
        return ShardedOps(cfg=cfg, mesh=mesh)
    return LocalOps(cfg=cfg)
