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

Row-sharded GCN propagation lives here too, in two flavors:

* ``sharded_spmm`` — masked-gather + psum of a full ``[nnz, d]`` buffer.
  Simple and exact, but the psum replicates nnz*d floats to EVERY device
  per hop: fine for small graphs, unusable at the 10M-item scale.

* ``sharded_spmm_a2a`` — the scalable path.  The graph is STATIC, so the
  communication schedule is precomputed on the host (``plan_spmm_a2a``):
  edges are partitioned by destination row block, each source shard knows
  exactly which of its rows every destination shard needs (deduplicated),
  and one ``all_to_all`` per hop moves only those rows.  Per-device traffic
  drops from O(nnz*d) replicated to O(unique-sources/M * d) point-to-point
  on ICI.  Fully differentiable: the all_to_all transposes to the reverse
  all_to_all and the send-gather to a scatter-add into the owning shard.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


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


def _a2a_exchange(tbl, ids_, axis: str, n_shards: int,
                  capacity_factor: float):
    """Shard-local body of the bucket-by-owner exchange (ids sharded over
    ``axis``; returns this shard's rows).  Runs inside a shard_map."""
    S = tbl.shape[0]
    flat = ids_.reshape(-1)
    n_local = flat.shape[0]
    got = _a2a_exchange_flat(tbl, flat, n_local, S, axis, n_shards,
                             capacity_factor)
    return got.reshape(*ids_.shape, tbl.shape[1])


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
        return _a2a_exchange(tbl, ids_, axis, n_shards, capacity_factor)

    return shard_map(kernel, mesh=mesh,
                     in_specs=(P(axis, None), P(axis)),
                     out_specs=P(axis))(table, ids)


def a2a_lookup_replicated(table: jax.Array, ids: jax.Array, mesh: Mesh,
                          axis: str = "model", batch_spec: P = P("data"),
                          capacity_factor: float = 2.0) -> jax.Array:
    """Tower-lookup strategy built on the all-to-all exchange
    (cfg.lookup_mode="a2a"): the flattened id set is sharded over BOTH mesh
    axes (each device requests only its slice), routed to owners over the
    model axis, and the returned rows are all-gathered over the model axis
    so the result is co-sharded with ``ids`` (batch over 'data', replicated
    over 'model') — the layout the attention towers consume.

    vs the masked-psum path (``sharded_lookup``): per-device a2a traffic is
    O(n_ids/M * d) + one all_gather of O(n_ids * d); the psum path moves
    O(n_ids * d) through one psum.  On ICI both are one collective deep;
    the a2a path wins when the gather itself (table row reads) dominates,
    since each device gathers only 1/M of the rows.

    ids [..., n]: total id count must divide by the full mesh size (true
    for all training shapes: B * L with B a mesh-size multiple).
    """
    n_shards = mesh.shape[axis]
    batch_axes = tuple(a for a in batch_spec if a is not None)

    def kernel(tbl, ids_):
        got = _a2a_exchange(tbl, ids_.reshape(-1), axis, n_shards,
                            capacity_factor)
        return jax.lax.all_gather(got, axis, axis=0, tiled=True)

    flat = ids.reshape(-1)
    # check_vma=False: the all_gather over `axis` makes the result invariant
    # over the model axis, which the varying-mesh-axes tracker cannot see
    out = shard_map(kernel, mesh=mesh,
                    in_specs=(P(axis, None), P((*batch_axes, axis))),
                    out_specs=P((*batch_axes,), None),
                    check_vma=False)(table, flat)
    return out.reshape(*ids.shape, table.shape[1])


def _a2a_exchange_flat(tbl, flat, n_local, S, axis, n_shards,
                       capacity_factor):
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
    return got


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


class SpmmPlan(NamedTuple):
    """Precomputed all-to-all schedule for one static adjacency.

    With M = n_shards, S = n_rows // M, cap = max unique source rows any
    (dest, src) shard pair exchanges, E = max edges any dest shard owns:

    send_idx [M, M, cap] : send_idx[t, s] = local rows shard t ships to s
    edge_ptr [M, E]      : per dest shard, index of each edge's source row
                           in the received [M*cap, d] buffer
    edge_dst [M, E]      : per dest shard, local destination row
    edge_val [M, E]      : edge weights (0 on padding)
    """

    send_idx: jax.Array
    edge_ptr: jax.Array
    edge_dst: jax.Array
    edge_val: jax.Array
    n_rows: int
    n_shards: int


def plan_spmm_a2a(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                  n_rows: int, n_shards: int) -> SpmmPlan:
    """Build the static exchange schedule (host-side, once per graph).

    ``n_rows`` is the PADDED table row count and must be divisible by
    ``n_shards`` (config.padded_sizes guarantees it for the tables).
    """
    assert n_rows % n_shards == 0, (n_rows, n_shards)
    M, S = n_shards, n_rows // n_shards
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.float32)

    od = rows // S                              # dest shard per edge
    order = np.lexsort((rows, od))              # group by dest shard, sorted
    r, c, v, od = rows[order], cols[order], vals[order], od[order]

    # unique (dest shard, source row) pairs, ascending
    key = od * n_rows + c
    uniq, inv = np.unique(key, return_inverse=True)
    u_s = uniq // n_rows                        # dest shard of the pair
    u_c = uniq % n_rows                         # global source row
    u_t = u_c // S                              # owner shard of the source
    st = u_s * M + u_t                          # non-decreasing
    first = np.searchsorted(st, np.arange(M * M))
    counts = np.diff(np.append(first, len(st)))
    cap = max(8, int(-(-max(1, counts.max()) // 8) * 8))
    pos = np.arange(len(u_c)) - first[st]       # slot within (s, t) bucket

    send_idx = np.zeros((M, M, cap), np.int32)
    send_idx[u_t, u_s, pos] = (u_c - u_t * S).astype(np.int32)

    # per-dest-shard edge arrays, padded to the max count; padding points at
    # (dst = S-1, val = 0) so segment ids stay sorted
    nnz_per = np.bincount(od, minlength=M)
    E = max(8, int(-(-max(1, nnz_per.max()) // 8) * 8))
    starts = np.concatenate([[0], np.cumsum(nnz_per)[:-1]])
    within = np.arange(len(r)) - starts[od]
    edge_ptr = np.zeros((M, E), np.int32)
    edge_dst = np.full((M, E), S - 1, np.int32)
    edge_val = np.zeros((M, E), np.float32)
    edge_ptr[od, within] = (u_t[inv] * cap + pos[inv]).astype(np.int32)
    edge_dst[od, within] = (r - od * S).astype(np.int32)
    edge_val[od, within] = v
    return SpmmPlan(send_idx=jnp.asarray(send_idx),
                    edge_ptr=jnp.asarray(edge_ptr),
                    edge_dst=jnp.asarray(edge_dst),
                    edge_val=jnp.asarray(edge_val),
                    n_rows=int(n_rows), n_shards=M)


def sharded_spmm_a2a(plan: SpmmPlan, table: jax.Array, mesh: Mesh,
                     axis: str = "model") -> jax.Array:
    """``adj @ table`` with the precomputed all-to-all schedule.

    table [n_rows, d] sharded P(axis, None) -> output with the same
    sharding.  One all_to_all per call; everything else is local
    gather / multiply / segment-sum.
    """
    assert table.shape[0] == plan.n_rows, (table.shape, plan.n_rows)

    def kernel(tbl, si, ep, ed, ev):
        si, ep, ed, ev = si[0], ep[0], ed[0], ev[0]
        buf = tbl[si]                                     # [M, cap, d]
        buf = jax.lax.all_to_all(buf, axis, 0, 0)         # rows from each src
        src = buf.reshape(-1, tbl.shape[1])[ep]           # [E, d]
        contrib = src * ev[:, None].astype(src.dtype)
        return jax.ops.segment_sum(contrib, ed, num_segments=tbl.shape[0],
                                   indices_are_sorted=True)

    return shard_map(kernel, mesh=mesh,
                     in_specs=(P(axis, None), P(axis), P(axis), P(axis),
                               P(axis)),
                     out_specs=P(axis, None))(
        table, plan.send_idx, plan.edge_ptr, plan.edge_dst, plan.edge_val)
