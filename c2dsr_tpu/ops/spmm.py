"""Sparse matrix-times-dense-table propagation (the GCN hot op).

The reference runs ``torch.spmm(adj, h)`` over the FULL item table every
training batch (models/encoders.py:42-48, trainer.py:48).  Here the graph is
a row-sorted COO (see ``graph/build.py``) and propagation is expressed as a
gather + weighted segment-sum, which XLA lowers to fused gather/scatter on
TPU.  A Pallas CSR row-block kernel provides the TPU fast path for large
tables (``ops/spmm_pallas.py``).

All functions are pure and differentiable (gradients flow into ``h`` exactly
as in the reference, where the loss backprops through the propagated table).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CooDevice(NamedTuple):
    """Device-resident COO graph. rows sorted ascending; n static.

    bk_fwd/bk_bwd are the Pallas kernel's packed layouts (A and A^T,
    ops/spmm_pallas.py); None when built with blocked=False.
    a2a_plan is the precomputed all-to-all exchange schedule for the
    row-sharded regime (parallel/embed.py plan_spmm_a2a); attach with
    ``attach_a2a_plan`` when mesh_model > 1.
    """

    rows: jax.Array   # int32 [nnz]
    cols: jax.Array   # int32 [nnz]
    vals: jax.Array   # float32 [nnz]
    n: int            # static
    bk_fwd: object = None
    bk_bwd: object = None
    a2a_plan: object = None


def attach_a2a_plan(graph: "CooDevice", n_rows_padded: int,
                    n_shards: int) -> "CooDevice":
    """Precompute the sharded-SpMM exchange schedule for this graph.

    ``n_rows_padded`` = the (padded) table row count the propagation runs
    over (config.padded_sizes), so the plan's row blocks line up with the
    table sharding."""
    from c2dsr_tpu.parallel import embed
    plan = embed.plan_spmm_a2a(np.asarray(graph.rows), np.asarray(graph.cols),
                               np.asarray(graph.vals), n_rows_padded,
                               n_shards)
    return graph._replace(a2a_plan=plan)


def device_graph(g, blocked: bool = True, r_block: int | None = None,
                 e_block: int | None = None) -> CooDevice:
    """Upload a host CooGraph (graph/build.py) to device arrays.

    Pads nnz to a multiple of 1024 with zero-weight self-loops on row/col 0
    so downstream kernels see aligned shapes.  blocked=True also packs the
    Pallas fast-path layouts for A and A^T.
    """
    nnz = int(g.rows.shape[0])
    pad = (-nnz) % 1024
    rows = np.concatenate([g.rows, np.zeros(pad, np.int32)])
    cols = np.concatenate([g.cols, np.zeros(pad, np.int32)])
    vals = np.concatenate([g.vals, np.zeros(pad, np.float32)])
    order = np.argsort(rows, kind="stable")
    bk_fwd = bk_bwd = None
    if blocked:
        from c2dsr_tpu.ops import spmm_pallas
        kw = {}
        if r_block is not None:
            kw["r_block"] = r_block
        if e_block is not None:
            kw["e_block"] = e_block
        bk_fwd = spmm_pallas.prep(g.rows, g.cols, g.vals, int(g.n), **kw)
        bk_bwd = spmm_pallas.prep(g.cols, g.rows, g.vals, int(g.n), **kw)
    return CooDevice(rows=jnp.asarray(rows[order]), cols=jnp.asarray(cols[order]),
                     vals=jnp.asarray(vals[order]), n=int(g.n),
                     bk_fwd=bk_fwd, bk_bwd=bk_bwd)


def spmm(graph: CooDevice, h: jax.Array) -> jax.Array:
    """``adj @ h`` for a row-normalized COO adjacency.

    h: [n, d] dense table.  Returns [n, d].
    """
    gathered = h[graph.cols] * graph.vals[:, None].astype(h.dtype)
    # num_segments follows the (possibly padded) table, not graph.n: padded
    # rows simply receive zero (no edges reference them).
    return jax.ops.segment_sum(
        gathered, graph.rows, num_segments=h.shape[0],
        indices_are_sorted=True)


def gcn_propagate(graph: CooDevice, h: jax.Array, n_layers: int,
                  dropout: float, rng: jax.Array | None,
                  backend: str = "xla", interpret: bool = False,
                  gather_dtype=jnp.float32,
                  out_flag: jax.Array | None = None) -> jax.Array:
    """LightGCN-style propagation: mean of all layer outputs incl. the input
    (models/encoders.py:42-48).  Dropout before each spmm in train mode.

    backend="pallas" routes each hop through the blocked MXU kernel
    (ops/spmm_pallas.py) when the graph carries packed layouts and the
    feature dim is lane-aligned; otherwise falls back to gather+segment-sum.
    gather_dtype=bfloat16 (Pallas path only) halves the [nnz, d] gather
    round-trip — see spmm_pallas.blocked_spmm_impl.

    out_flag (Pallas path, training): 0/1 f32 row marker of the rows the
    caller will READ from the result — batch-sparse propagation
    (spmm_pallas.make_blocked_spmm_flagged).  Applied to the LAST hop only
    (earlier hops feed later hops' gathers at arbitrary rows, so they stay
    dense); unmarked rows of the result are garbage the caller must not
    read.  Exact on every marked row.
    """
    step = lambda x: spmm(graph, x)
    flag_step = None
    if backend == "pallas" and graph.bk_fwd is not None:
        from c2dsr_tpu.ops import spmm_pallas
        if spmm_pallas.supports(h.shape[1]):
            step = spmm_pallas.make_blocked_spmm(graph.bk_fwd, graph.bk_bwd,
                                                 interpret, gather_dtype)
            if out_flag is not None:
                flag_step = spmm_pallas.make_blocked_spmm_flagged(
                    graph.bk_fwd, graph.bk_bwd, interpret, gather_dtype)
    h_sum = h
    cur = h
    for i in range(n_layers):
        if rng is not None and dropout > 0.0:
            key = jax.random.fold_in(rng, i)
            keep = jax.random.bernoulli(key, 1.0 - dropout, cur.shape)
            cur = jnp.where(keep, cur / (1.0 - dropout), 0.0).astype(cur.dtype)
        if flag_step is not None and i == n_layers - 1:
            cur = flag_step(cur, out_flag)
        else:
            cur = step(cur)
        h_sum = h_sum + cur
    return h_sum / (n_layers + 1)
