"""Food-Kitchen-scale synthetic corpus + graphs for the benchmarks.

Item counts match the real FK datasets (paper Table 1) and the user count
matches the REAL train-set size (34,117 — BASELINE.md), so graph density /
SpMM cost is honest, not flattered by a thin synthetic graph.  Built once
and cached under bench_cache/.
"""

from __future__ import annotations

import os

import numpy as np

N_ITEM_A, N_ITEM_B = 29207, 34886        # Food-Kitchen (paper Table 1)
N_USERS = 34117                          # real FK train-set size
LEN_MAX = 15
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_cache")


def spec():
    from c2dsr_tpu.config import DataSpec
    return DataSpec(n_item_a=N_ITEM_A, n_item_b=N_ITEM_B, len_max=LEN_MAX)


def _seqs(sp):
    from c2dsr_tpu.data import synthetic
    return synthetic.generate_sequences(sp, N_USERS, seed=0)


def load_train():
    from c2dsr_tpu.data import preprocess
    sp = spec()
    os.makedirs(CACHE, exist_ok=True)
    f = os.path.join(CACHE, f"train_{N_USERS}_{sp.n_item}.npz")
    if os.path.exists(f):
        with np.load(f) as z:
            return {k: z[k] for k in z.files}
    train = preprocess.preprocess_train(_seqs(sp), sp, seed=0)
    np.savez(f, **train)
    return train


def load_or_build():
    """Both graphs as raw arrays {s_*, p_*, n}."""
    from c2dsr_tpu.graph import build
    sp = spec()
    os.makedirs(CACHE, exist_ok=True)
    gf = os.path.join(CACHE, f"graph_{N_USERS}_{sp.n_item}.npz")
    if os.path.exists(gf):
        with np.load(gf) as z:
            return {k: z[k] for k in z.files}
    gs, gp = build.build_graphs(_seqs(sp), sp)
    g = {"s_rows": gs.rows, "s_cols": gs.cols, "s_vals": gs.vals,
         "p_rows": gp.rows, "p_cols": gp.cols, "p_vals": gp.vals,
         "n": np.int64(sp.n_item)}
    np.savez(gf, **g)
    return g
