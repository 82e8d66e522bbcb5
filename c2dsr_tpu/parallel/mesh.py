"""Device mesh and sharding rules.

The reference is strictly single-device (main.py:72-75); everything here is
new engineering.  Mesh layout: a 2-D ``(data, model)`` mesh —

* ``data``  : batch-axis data parallelism (DP); gradients are combined by
  XLA-inserted all-reduces over this axis.
* ``model`` : parameter sharding for the big itemset-dimension tensors:
  the three item-embedding tables (row-sharded over items) and the
  classifier weight/bias (vocab-sharded over output classes).  Lookups and
  logits over these shardings make XLA insert all-gathers / reduce-scatters
  on ICI; the explicit shard_map all-to-all lookup lives in
  parallel/embed.py.

Everything small (attention towers, discriminators, optimizer scalars) is
replicated.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 1, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {need} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


# --- sharding rules ---------------------------------------------------------

_MODEL_SHARDED_ROWS = ("embed_share", "embed_a", "embed_b")
_MODEL_SHARDED_COLS = ("cls_a_w", "cls_b_w")
_MODEL_SHARDED_VEC = ("cls_a_b", "cls_b_b")


def param_spec(path: str) -> P:
    """PartitionSpec for a parameter, by its top-level name."""
    if path in _MODEL_SHARDED_ROWS:
        return P("model", None)       # rows (items) sharded
    if path in _MODEL_SHARDED_COLS:
        return P(None, "model")       # output classes sharded
    if path in _MODEL_SHARDED_VEC:
        return P("model")
    return P()                        # replicated


def params_shardings(params: Any, mesh: Mesh):
    """NamedSharding pytree matching a params dict."""

    def one(name, leaf):
        return jax.tree.map(
            lambda _: NamedSharding(mesh, param_spec(name)), leaf)

    return {name: one(name, leaf) for name, leaf in params.items()}


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard along the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def global_batch(local: Any, mesh: Mesh):
    """Assemble a global data-sharded batch from per-process local slices.

    ``local`` is this process's contiguous slice of the global batch
    (pipeline.BatchIterator process sharding); the concatenation across
    processes in process order IS the global batch — exactly the layout
    P('data') induces, since make_mesh reshapes jax.devices() (which sorts
    by process).  The global shape is passed explicitly (local rows x
    process count): letting JAX infer it can misread a ragged batch whose
    local row count happens to divide the data axis as already-global."""
    sh = batch_sharding(mesh)
    pc = jax.process_count()

    def to_global(v):
        v = np.asarray(v)
        gshape = (v.shape[0] * pc,) + v.shape[1:]
        return jax.make_array_from_process_local_data(sh, v, gshape)

    return jax.tree.map(to_global, local)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def state_shardings(state, mesh: Mesh):
    """Sharding pytree for a full TrainState (params + optimizer moments).

    Optimizer moment trees (mu/nu/nu_max of amsgrad) mirror the params dict,
    so the same name-based rule applies: any leaf whose tree path passes
    through a top-level param name gets that param's spec, when the leaf rank
    can carry it; everything else (counts, scalars) is replicated.
    """
    sharded_names = set(_MODEL_SHARDED_ROWS) | set(_MODEL_SHARDED_COLS) \
        | set(_MODEL_SHARDED_VEC)

    def rule(path, leaf):
        name = None
        for k in path:
            key = getattr(k, "key", None)
            if key in sharded_names:
                name = key
        spec = param_spec(name) if name else P()
        ndim = getattr(leaf, "ndim", 0)
        if len(spec) > ndim:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, state)
