"""Batched ranking evaluation.

The reference evaluates with a per-example Python loop (trainer.py:167-180) —
its whole eval phase is CPU-bound.  Here ranking is a batched scores matmul
plus a vectorized rank-count, jitted end-to-end:

  rank = #(candidate scores > gt score) + 1        (trainer.py:174,179)

Two protocols:
  * "sampled": rank against the 999 preprocessed negatives (reference
    default, dataloader.py:216-226).
  * "full": rank against the entire domain itemset (the headline mode;
    supersedes the reference's truncated-B-pool quirk).

Eval examples are pre-partitioned by ground-truth domain on the host, so each
jitted step computes only its domain's classifier matmul, like the reference
— but over the whole batch at once.  The vocab-sharded multi-chip variant
lives in parallel/sharded_eval.py.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from c2dsr_tpu.config import Config, DataSpec
from c2dsr_tpu.model import c2dsr


def _last_hidden(params, hi, batch, cfg, spec, domain: str, pops=None):
    h_share, hx, hy = c2dsr.forward(
        params, hi, batch["seq_share"], batch["seq_share_a"],
        batch["seq_share_b"], batch["pos"], batch["pos_a"], batch["pos_b"],
        cfg, spec, rng=None, pops=pops)
    L = h_share.shape[1]
    b_idx = jnp.arange(h_share.shape[0])
    h_share_last = h_share[:, -1, :]
    if domain == "a":
        # -1 sentinel wraps to the last position, matching torch negative
        # indexing in the reference (trainer.py:172).
        idx = batch["idx_last_a"] % L
        h_dom_last = hx[b_idx, idx]
    else:
        idx = batch["idx_last_b"] % L
        h_dom_last = hy[b_idx, idx]
    return h_share_last + h_dom_last


def _rank_kernel(params, hi, batch, cfg: Config, spec: DataSpec,
                 domain: str, mode: str, pops) -> jax.Array:
    h = _last_hidden(params, hi, batch, cfg, spec, domain, pops)
    if domain == "a":
        w, b, n_real = params["cls_a_w"], params["cls_a_b"], spec.n_item_a
    else:
        w, b, n_real = params["cls_b_w"], params["cls_b_b"], spec.n_item_b
    gt = batch["gt_last"].astype(jnp.int32)
    if mode == "sampled":
        # score only [gt | negatives] (rank = #(neg > gt score) + 1,
        # trainer.py:174,179); negative ids are always real classes
        ids = jnp.concatenate([gt[:, None], batch["list_neg"]], axis=1)
        s = pops.gather_scores(h, w, b, ids)
        return jnp.sum(s[:, 1:] > s[:, :1], axis=1).astype(jnp.int32) + 1
    return pops.full_rank(h, w, b, gt, n_real)


def make_eval_fns(cfg: Config, spec: DataSpec, graphs: c2dsr.Graphs,
                  mesh=None):
    """Returns (convolve_eval, rank_step) jitted callables.

    convolve_eval(params) -> Propagated (deterministic, once per eval phase —
    the reference also convolves once before the val loop, trainer.py:65).
    rank_step(params, hi, batch, domain, mode) -> ranks [B].
    """
    from c2dsr_tpu.parallel import strategy
    pops = strategy.make_ops(cfg, mesh)

    @jax.jit
    def convolve_eval(params):
        return c2dsr.convolve_graph(params, graphs, cfg, spec, rng=None,
                                    pops=pops)

    # ranks come back replicated so every process can read them directly
    # (multi-host: np.asarray works on fully-replicated global arrays)
    kw = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        kw["out_shardings"] = NamedSharding(mesh, P())

    @functools.partial(jax.jit, static_argnames=("domain", "mode"), **kw)
    def rank_step(params, hi, batch, domain: str, mode: str):
        return _rank_kernel(params, hi, batch, cfg, spec, domain, mode, pops)

    return convolve_eval, rank_step


def partition_by_domain(data: Dict[str, np.ndarray]
                        ) -> Dict[str, Dict[str, np.ndarray]]:
    """Split a packed eval split into per-domain example groups."""
    xory = data["xory_last"]
    out = {}
    for name, val in (("a", 0), ("b", 1)):
        sel = xory == val
        out[name] = {k: v[sel] for k, v in data.items()}
    return out


def _batches(group: Dict[str, np.ndarray], batch_size: int):
    n = group["seq_share"].shape[0]
    for s in range(0, n, batch_size):
        e = min(s + batch_size, n)
        chunk = {k: v[s:e] for k, v in group.items()}
        pad = batch_size - (e - s)
        if pad:
            chunk = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                     for k, v in chunk.items()}
        yield chunk, e - s


def evaluate_split(params, hi, data: Dict[str, np.ndarray], rank_step,
                   cfg: Config, mode: str | None = None, to_global=None
                   ) -> Tuple[List[int], List[int]]:
    """Rank every eval example; returns (ranks_a, ranks_b) as Python lists,
    the exact interface of the reference's evaluate loop (trainer.py:62-71).

    ``to_global`` (multi-host): maps a host-replicated numpy chunk to a
    global data-sharded batch (every process holds the full eval split and
    feeds its slice; ranks come back replicated from rank_step)."""
    mode = mode or cfg.eval_mode
    groups = partition_by_domain(data)
    ranks = {"a": [], "b": []}
    for dom in ("a", "b"):
        for chunk, n_real in _batches(groups[dom], cfg.batch_size_eval):
            if to_global is not None:
                chunk = to_global(chunk)
            r = rank_step(params, hi, chunk, dom, mode)
            ranks[dom].extend(np.asarray(r)[:n_real].tolist())
    return ranks["a"], ranks["b"]
