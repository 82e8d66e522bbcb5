"""Distributed full-itemset ranking over the vocab-sharded classifier.

rank = #(scores > gt_score) + 1 (trainer.py:174,179), computed as a local
count per vocab shard + psum — the full score row never exists on any
single device.  This is where the reference's per-example Python eval loop
(trainer.py:167-180) becomes a two-collective batched kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def sharded_full_rank(h: jax.Array, w: jax.Array, b: jax.Array,
                      gt: jax.Array, n_real: int, mesh: Mesh,
                      axis: str = "model", batch_spec: P = P()) -> jax.Array:
    """h: [B, d]; w: [d, V_p] sharded P(None, axis); b: [V_p] sharded;
    gt: [B] (domain-local ids).  batch_spec = sharding of the batch dim.
    Returns ranks [B] co-sharded with the batch."""

    def kernel(h_, w_, b_, gt_):
        Vs = w_.shape[1]
        ax = jax.lax.axis_index(axis)
        scores = h_ @ w_ + b_                               # [B, Vs]
        col = ax * Vs + jnp.arange(Vs)
        scores = jnp.where(col < n_real, scores, -jnp.inf)

        t_local = gt_ - ax * Vs
        t_ok = (t_local >= 0) & (t_local < Vs)
        g = jnp.take_along_axis(
            scores, jnp.clip(t_local, 0, Vs - 1)[:, None], axis=1)[:, 0]
        g = jax.lax.psum(jnp.where(t_ok, g, 0.0), axis)     # gt score

        cnt = jnp.sum(scores > g[:, None], axis=1)
        return jax.lax.psum(cnt, axis).astype(jnp.int32) + 1

    hspec = P(*batch_spec)
    return shard_map(kernel, mesh=mesh,
                     in_specs=(hspec, P(None, axis), P(axis), hspec),
                     out_specs=hspec)(h, w, b, gt)


def sharded_gather_scores(h: jax.Array, w: jax.Array, b: jax.Array,
                          ids: jax.Array, mesh: Mesh, axis: str = "model",
                          batch_spec: P = P()) -> jax.Array:
    """scores[i, k] = h_i . w[:, ids[i, k]] + b[ids[i, k]] over the
    vocab-sharded classifier (sampled-negative eval): each shard scores the
    candidate ids it owns, combined with a psum."""

    def kernel(h_, w_, b_, ids_):
        Vs = w_.shape[1]
        ax = jax.lax.axis_index(axis)
        local = ids_ - ax * Vs
        ok = (local >= 0) & (local < Vs)
        lc = jnp.clip(local, 0, Vs - 1)
        cols = jnp.take(w_, lc, axis=1)               # [d, B, K]
        s = jnp.einsum("bd,dbk->bk", h_, cols) + jnp.take(b_, lc)
        return jax.lax.psum(jnp.where(ok, s, 0.0), axis)

    hspec = P(*batch_spec)
    return shard_map(kernel, mesh=mesh,
                     in_specs=(hspec, P(None, axis), P(axis), hspec),
                     out_specs=hspec)(h, w, b, ids)


def sharded_topk(h: jax.Array, w: jax.Array, b: jax.Array, k: int,
                 n_real: int, mesh: Mesh, axis: str = "model"):
    """Distributed top-k over the sharded itemset: local top-k per shard,
    all_gather the (M*k) candidates, reduce to global top-k.  Returns
    (values [B, k], global indices [B, k])."""

    def kernel(h_, w_, b_):
        Vs = w_.shape[1]
        ax = jax.lax.axis_index(axis)
        scores = h_ @ w_ + b_
        col = ax * Vs + jnp.arange(Vs)
        scores = jnp.where(col < n_real, scores, -jnp.inf)
        v, i = jax.lax.top_k(scores, k)                     # [B, k] local
        gi = i + ax * Vs
        v_all = jax.lax.all_gather(v, axis, axis=1)         # [B, M, k]
        i_all = jax.lax.all_gather(gi, axis, axis=1)
        B = v_all.shape[0]
        v_all = v_all.reshape(B, -1)
        i_all = i_all.reshape(B, -1)
        vg, sel = jax.lax.top_k(v_all, k)
        ig = jnp.take_along_axis(i_all, sel, axis=1)
        return vg, ig

    # every shard computes the identical final top-k after the all_gather;
    # replication can't be statically inferred, hence check_vma=False
    return shard_map(kernel, mesh=mesh,
                     in_specs=(P(), P(None, axis), P(axis)),
                     out_specs=(P(), P()), check_vma=False)(h, w, b)
