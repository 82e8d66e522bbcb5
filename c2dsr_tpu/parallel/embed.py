"""Row-sharded embedding table operations (shard_map + explicit collectives).

The reference uses a plain single-device ``nn.Embedding`` (models/C2DSR.py:
20-26).  Here the (padded) item tables are row-sharded over the ``model``
mesh axis and looked up with explicit collectives; XLA only has to schedule
them.  Two strategies:

* ``sharded_lookup`` — owner-masked partial gather + psum.  Each shard
  gathers the rows it owns (zeros elsewhere) and the partials are summed
  over the model axis.  Traffic per device: ``n_ids * d`` (one psum), which
  is optimal when the same ids are needed by every shard — exactly our
  case, since activations downstream are model-replicated.  Fully
  differentiable: the psum transposes to identity and the masked gather
  transposes to a scatter-add into the owning shard.

* ``all_to_all_lookup`` — bucket-by-owner exchange for the DLRM-style
  regime where each shard holds *different* ids (batch sharded over the
  model axis too).  Ids are routed to their owning shard with a fixed
  per-destination capacity, gathered locally, and routed back.  Overflow
  beyond the capacity (pathological imbalance) falls back to the masked
  psum path, so the op is always exact.

Row-sharded GCN propagation (``sharded_spmm``) lives here too: each shard
owns a row block of the adjacency and produces its row block of the output;
source rows are fetched via the same masked-gather + psum pattern.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _owner_local(ids: jax.Array, shard_rows: int, axis: str):
    """(local_row, owned_mask) for this shard."""
    ax = jax.lax.axis_index(axis)
    local = ids - ax * shard_rows
    ok = (local >= 0) & (local < shard_rows)
    return jnp.clip(local, 0, shard_rows - 1), ok


def sharded_lookup(table: jax.Array, ids: jax.Array, mesh: Mesh,
                   axis: str = "model",
                   ids_spec: P = P()) -> jax.Array:
    """table [N_p, d] sharded P(axis, None); ids with sharding ``ids_spec``
    (replicated over `axis`; typically P() standalone or P("data") inside
    the data-parallel train step) -> rows co-sharded with ids."""

    def kernel(tbl, ids_):
        local, ok = _owner_local(ids_, tbl.shape[0], axis)
        rows = tbl[local]
        rows = jnp.where(ok[..., None], rows, 0.0)
        return jax.lax.psum(rows, axis)

    out_spec = P(*ids_spec, *(None,) * (ids.ndim + 1 - len(ids_spec)))
    return shard_map(kernel, mesh=mesh,
                     in_specs=(P(axis, None), ids_spec),
                     out_specs=out_spec)(table, ids)


def all_to_all_lookup(table: jax.Array, ids: jax.Array, mesh: Mesh,
                      axis: str = "model",
                      capacity_factor: float = 2.0) -> jax.Array:
    """DLRM-style exchange: ids are SHARDED over `axis` (each shard asks for
    its own id set); returns rows with the same sharding as ids.

    table [N_p, d] sharded P(axis, None); ids [n] sharded P(axis).
    Per-destination capacity = ceil(n_local/M * capacity_factor); ids that
    overflow a bucket are resolved exactly through a masked-psum fallback.
    """
    n_shards = mesh.shape[axis]

    def kernel(tbl, ids_):
        S = tbl.shape[0]
        flat = ids_.reshape(-1)
        n_local = flat.shape[0]
        cap = max(1, int(-(-n_local // n_shards) * capacity_factor))
        owner = jnp.clip(flat // S, 0, n_shards - 1)

        # position of each id within its destination bucket
        onehot = jax.nn.one_hot(owner, n_shards, dtype=jnp.int32)  # [n, M]
        pos_in_bucket = jnp.cumsum(onehot, axis=0) - onehot        # [n, M]
        slot = jnp.sum(pos_in_bucket * onehot, axis=1)             # [n]
        fits = slot < cap

        # build request buffers [M, cap] of local row indices at the owner
        send = jnp.zeros((n_shards, cap), jnp.int32)
        # overflowing ids scatter to slot == cap, out of bounds on purpose:
        # mode="drop" discards them instead of overwriting a valid slot
        idx = (owner, jnp.where(fits, slot, cap))
        send = send.at[idx].set(flat - owner * S, mode="drop")

        # route requests to owners; each shard now holds [M, cap] asks
        asks = jax.lax.all_to_all(send, axis, 0, 0, tiled=False)
        rows = tbl[jnp.clip(asks, 0, S - 1)]                       # [M, cap, d]
        # route results back to the requesters
        rows = jax.lax.all_to_all(rows, axis, 0, 0, tiled=False)

        # scatter received rows into id order
        got = rows[owner, jnp.minimum(slot, cap - 1)]              # [n, d]
        got = jnp.where(fits[:, None], got, 0.0)

        # exact overflow fallback for ids that missed their bucket: publish
        # every shard's miss set (all_gather keeps each source shard's
        # requests in its own slot, so owner contributions to slot (m, i)
        # never collide), let owners fill rows, combine with psum, then read
        # back this shard's slot.
        need = jnp.logical_not(fits)
        my_ax = jax.lax.axis_index(axis)
        all_ids = jax.lax.all_gather(jnp.where(need, flat, 0), axis)  # [M, n]
        all_need = jax.lax.all_gather(need, axis)                     # [M, n]
        local, ok = _owner_local(all_ids, S, axis)
        fb_all = jnp.where((ok & all_need)[..., None], tbl[local], 0.0)
        fb_all = jax.lax.psum(fb_all, axis)                           # [M, n, d]
        got = got + jnp.where(need[:, None], fb_all[my_ax], 0.0)
        return got.reshape(*ids_.shape, tbl.shape[1])

    return shard_map(kernel, mesh=mesh,
                     in_specs=(P(axis, None), P(axis)),
                     out_specs=P(axis))(table, ids)


def sharded_spmm(rows: jax.Array, cols: jax.Array, vals: jax.Array,
                 table: jax.Array, mesh: Mesh, axis: str = "model"
                 ) -> jax.Array:
    """Row-sharded adjacency propagation: out[r] = sum_c A[r,c] table[c].

    ``rows``/``cols``/``vals`` are replicated COO arrays (row-sorted);
    ``table`` is sharded P(axis, None).  Each shard computes the edge
    contributions whose DESTINATION row it owns; source rows it does not own
    arrive through the same masked-gather + psum as sharded_lookup.  Output
    sharding matches the table (P(axis, None)).
    """

    def kernel(tbl, r, c, v):
        S = tbl.shape[0]
        ax = jax.lax.axis_index(axis)
        # fetch source rows (replicated result via psum of owned partials)
        src_local, src_ok = _owner_local(c, S, axis)
        src = jnp.where(src_ok[:, None], tbl[src_local], 0.0)
        src = jax.lax.psum(src, axis)                      # [nnz, d]
        # accumulate into destination rows owned by this shard
        dst = r - ax * S
        dst_ok = (dst >= 0) & (dst < S)
        contrib = src * v[:, None]
        contrib = jnp.where(dst_ok[:, None], contrib, 0.0)
        return jax.ops.segment_sum(
            contrib, jnp.clip(dst, 0, S - 1), num_segments=S,
            indices_are_sorted=True)

    return shard_map(kernel, mesh=mesh,
                     in_specs=(P(axis, None), P(), P(), P()),
                     out_specs=P(axis, None))(table, rows, cols, vals)
