"""Pallas TPU kernel for the GCN graph propagation (adj @ h).

The reference runs ``torch.spmm(adj, h)`` over the FULL item table every
training batch (models/encoders.py:42-48, trainer.py:48).  The portable XLA
path (ops/spmm.py) lowers to gather + scatter-add; on TPU the scatter
serializes and runs ~40x off memory speed-of-light.  This kernel removes
the scatter entirely:

* Host prep (once per graph): pack the row-sorted COO into fixed-size edge
  chunks, each chunk owned by one 256-row output block.  Every output block
  gets at least one (possibly all-padding) chunk so every output tile is
  written.
* XLA stage (per call): ``gathered = h[cols] * vals`` — one fused gather,
  no scatter.
* Pallas stage: grid over chunks; each step builds a {0,1} one-hot
  [R, E] in VMEM from the chunk's local row ids and reduces the chunk with
  a single MXU matmul ``onehot @ gathered``, accumulating into the output
  block across consecutive chunks of the same block (flash-style revisit).

The backward pass is ``A^T @ g`` — the same kernel over a transpose-prepped
chunking, wired up with ``jax.custom_vjp`` (vals are graph constants, only
``h`` takes a gradient).

Numerics: f32 end-to-end; differs from the XLA path only in summation
order.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_BLOCK = 256   # output rows per block
E_BLOCK = 128   # edges per chunk (small blocks keep per-row-block padding low)


class BlockedCoo(NamedTuple):
    """One propagation direction, packed for the kernel (see ``prep``)."""

    cols: jax.Array     # int32 [n_chunk * E] flat gather indices
    vals: jax.Array     # f32   [n_chunk * E] edge weights (0 on padding)
    rowloc: jax.Array   # int32 [n_chunk, E] row id local to the row block
    rb: jax.Array       # int32 [n_chunk]    output row-block per chunk
    dest: jax.Array     # int32 [n_chunk * E] global output row per edge
    n_rows: int         # table rows this prep was built for
    n_rows_pad: int     # n_rows rounded up to r_block
    r_block: int = R_BLOCK   # output rows per block this prep was packed for
    e_block: int = E_BLOCK   # edges per chunk this prep was packed for


def prep(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
         n_rows: int, r_block: int = R_BLOCK, e_block: int = E_BLOCK
         ) -> BlockedCoo:
    """Pack a COO (any order) into per-row-block edge chunks (host, once)."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.float32)
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    n_rows_pad = -(-n_rows // r_block) * r_block
    n_blocks = n_rows_pad // r_block
    rb_of_edge = rows // r_block
    idx = np.arange(n_blocks)
    starts = np.searchsorted(rb_of_edge, idx, side="left")
    ends = np.searchsorted(rb_of_edge, idx, side="right")
    c_cols, c_vals, c_rloc, c_rb = [], [], [], []
    for b in range(n_blocks):
        s, e = int(starts[b]), int(ends[b])
        cnt = e - s
        # sort the block's edges by column: the gather stage then reads
        # near-sequential table rows within each chunk (the one-hot reduce
        # is order-independent within a row block)
        o = np.argsort(cols[s:e], kind="stable")
        n_ch = max(1, -(-cnt // e_block))
        pad = n_ch * e_block - cnt
        c_cols.append(np.pad(cols[s:e][o], (0, pad)).reshape(n_ch, e_block))
        c_vals.append(np.pad(vals[s:e][o], (0, pad)).reshape(n_ch, e_block))
        c_rloc.append(np.pad(rows[s:e][o] - b * r_block,
                             (0, pad)).reshape(n_ch, e_block))
        c_rb.extend([b] * n_ch)
    rloc = np.concatenate(c_rloc)
    rb_arr = np.array(c_rb)
    dest = (rloc + rb_arr[:, None] * r_block).reshape(-1)
    return BlockedCoo(
        cols=jnp.asarray(np.concatenate(c_cols).reshape(-1), jnp.int32),
        vals=jnp.asarray(np.concatenate(c_vals).reshape(-1), jnp.float32),
        rowloc=jnp.asarray(rloc, jnp.int32),
        rb=jnp.asarray(rb_arr, jnp.int32),
        dest=jnp.asarray(dest, jnp.int32),
        n_rows=int(n_rows), n_rows_pad=int(n_rows_pad),
        r_block=int(r_block), e_block=int(e_block))


def _kernel(rb_ref, rowloc_ref, gathered_ref, out_ref, *, r_block: int):
    i = pl.program_id(0)
    prev = rb_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, rb_ref[i] != prev)

    e_block = rowloc_ref.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (r_block, e_block), 0)
    onehot = (iota == rowloc_ref[0]).astype(gathered_ref.dtype)   # [R, E]
    # f32 buffers: HIGHEST precision + f32 accumulate — the op is
    # bandwidth-bound, extra MXU passes are free, and it matches the XLA
    # segment-sum path at ~1e-6.  bf16 buffers (gather_dtype): Mosaic only
    # allows DEFAULT precision, which is exact here anyway — the one-hot
    # lhs is exactly representable and accumulation stays f32, so error is
    # bounded by bf16 rounding of the gathered values.
    precision = (jax.lax.Precision.HIGHEST
                 if gathered_ref.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    part = jnp.dot(onehot, gathered_ref[:],
                   preferred_element_type=jnp.float32,
                   precision=precision)                       # [R, d]

    @pl.when(first)
    def _():
        out_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + part


def blocked_spmm_impl(bk: BlockedCoo, h: jax.Array,
                      interpret: bool = False,
                      gather_dtype=jnp.float32,
                      flag: jax.Array | None = None,
                      flag_on: str = "dest") -> jax.Array:
    """``adj @ h`` for a prepped graph.  h: [n_rows, d] f32 -> [n_rows, d].

    gather_dtype=bfloat16 halves the [nnz, d] intermediate's HBM round-trip
    (the dominant traffic; the XLA gather runs ~4x off peak on random rows)
    — ~40% faster per hop at FK scale, error bounded by bf16 rounding of
    the gathered values (accumulation stays f32).

    flag: optional f32 [>= n_rows] 0/1 row marker enabling BATCH-SPARSE
    propagation.  Edges are masked (gather index -> row 0, weight -> 0)
    when the marked row test fails, so the masked gather reads one hot tile
    instead of scattered HBM rows:
      * flag_on="dest": mask edges whose OUTPUT row is unmarked — exact for
        every marked output row; unmarked rows hold garbage that callers
        must never read (training reads only batch rows).
      * flag_on="src": mask edges whose GATHERED row is unmarked — exact
        when unmarked rows of ``h`` are zero (a backward cotangent that is
        only nonzero on batch rows).
    """
    assert h.shape[0] == bk.n_rows, (h.shape, bk.n_rows)
    d = h.shape[1]
    n_chunk = bk.rb.shape[0]
    e_block = bk.rowloc.shape[1]
    cols, vals = bk.cols, bk.vals
    if flag is not None:
        if flag.shape[0] < bk.n_rows_pad:   # dest ids reach n_rows_pad - 1
            flag = jnp.concatenate(
                [flag, jnp.zeros(bk.n_rows_pad - flag.shape[0], flag.dtype)])
        probe = bk.dest if flag_on == "dest" else bk.cols
        member = flag[probe] > 0.0
        cols = jnp.where(member, cols, 0)
        vals = jnp.where(member, vals, 0.0)
    if jnp.dtype(gather_dtype) == jnp.float32:
        gathered = (h[cols] * vals[:, None].astype(h.dtype)
                    ).astype(jnp.float32)
    else:
        # cast the table ONCE (n*d/2 write), gather the smaller rows
        gathered = (h.astype(gather_dtype)[cols]
                    * vals[:, None].astype(gather_dtype))

    r_block = bk.r_block
    out = pl.pallas_call(
        lambda rb, rl, g, o: _kernel(rb, rl, g, o, r_block=r_block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunk,),
            in_specs=[
                # [n_chunk, 1, E] int32: block (1, 1, E) keeps the trailing
                # two dims equal to the array's (TPU block-shape rule)
                pl.BlockSpec((1, 1, e_block), lambda i, rb: (i, 0, 0)),
                pl.BlockSpec((e_block, d), lambda i, rb: (i, 0)),
            ],
            out_specs=pl.BlockSpec((r_block, d), lambda i, rb: (rb[i], 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bk.n_rows_pad, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunk * r_block * e_block * d,
            bytes_accessed=4 * (n_chunk * e_block * d + bk.n_rows_pad * d),
            transcendentals=0),
        interpret=interpret,
    )(bk.rb, bk.rowloc[:, None, :], gathered)
    return out[:bk.n_rows]


def _apply(bk: BlockedCoo, h: jax.Array, interpret: bool,
           gather_dtype=jnp.float32, flag=None, flag_on="dest") -> jax.Array:
    """Run the kernel on a table that may carry extra (edge-free) pad rows
    beyond the graph dim (vocab_pad_multiple in model/params.py): slice the
    prepped rows, propagate, zero-pad back (pad rows have no edges in
    either direction, so their output and gradient are exactly zero)."""
    n = h.shape[0]
    out = blocked_spmm_impl(bk, h[:bk.n_rows].astype(jnp.float32), interpret,
                            gather_dtype, flag, flag_on)
    if n > bk.n_rows:
        out = jnp.concatenate(
            [out, jnp.zeros((n - bk.n_rows, h.shape[1]), out.dtype)])
    return out


def make_blocked_spmm(fwd: BlockedCoo, bwd: BlockedCoo,
                      interpret: bool = False, gather_dtype=jnp.float32):
    """Differentiable ``h -> adj @ h``; grad uses the transpose prep."""

    @jax.custom_vjp
    def f(h):
        return _apply(fwd, h, interpret, gather_dtype)

    def f_fwd(h):
        return _apply(fwd, h, interpret, gather_dtype), None

    def f_bwd(_, g):
        return (_apply(bwd, g, interpret, gather_dtype),)

    f.defvjp(f_fwd, f_bwd)
    return f


def make_blocked_spmm_flagged(fwd: BlockedCoo, bwd: BlockedCoo,
                              interpret: bool = False,
                              gather_dtype=jnp.float32):
    """Batch-sparse differentiable ``(h, flag) -> adj @ h``.

    ``flag`` is a 0/1 f32 row marker of the rows the TRAINING step will
    read downstream (the batch's lookup ids).  Both gather directions mask
    dead edges to one hot table row, cutting the random-HBM traffic of the
    per-batch graph propagation (trainer.py:48 reference semantics) to the
    batch's neighborhood:

      forward : output restricted to flagged rows (others hold garbage the
                caller must never read — and autodiff guarantees their
                cotangent is zero, since unread values get no gradient);
      backward: the cotangent is nonzero ONLY on flagged rows, so edges
                gathering from unflagged rows contribute exactly zero and
                are masked; the produced dL/dh stays DENSE and exact.

    Every value the step actually consumes is bit-identical to the dense
    path (tests/test_ops.py spmm cases; tests/test_train.py::test_batch_sparse_gnn_step_equality)."""

    @jax.custom_vjp
    def f(h, flag):
        return _apply(fwd, h, interpret, gather_dtype, flag, "dest")

    def f_fwd(h, flag):
        return f(h, flag), flag

    def f_bwd(flag, g):
        return (_apply(bwd, g, interpret, gather_dtype, flag, "src"),
                jnp.zeros_like(flag))

    f.defvjp(f_fwd, f_bwd)
    return f


def supports(d: int) -> bool:
    """The MXU path wants lane-aligned feature dims."""
    return d % 128 == 0
