"""Graph builder tests vs hand-derived adjacency (utils/graph.py:33-96)."""

import numpy as np

from c2dsr_tpu.config import DataSpec
from c2dsr_tpu.graph import build

SPEC = DataSpec(n_item_a=5, n_item_b=7, len_max=8)   # n_item = 13


def _dense(g):
    return g.to_dense()


def test_share_and_specific_edges():
    seqs = [[1, 7, 2, 11, 3], [1, 2, 7]]
    share, specific = build.build_graphs(seqs, SPEC)

    ds = _dense(share)
    # user 1 pre-edges: 1->7, 7->2, 2->11, 11->3; user 2: 1->2, 2->7
    assert ds[1, 7] == 0.5 and ds[1, 2] == 0.5           # row 1 normalized
    assert ds[7, 2] == 1.0
    assert ds[2, 11] == 0.5 and ds[2, 7] == 0.5
    assert ds[11, 3] == 1.0
    assert ds.sum() == 4.0                                # 4 nonzero rows

    dp = _dense(specific)
    # A-chains: 1->2 (both users), 2->3; B-chain: 7->11
    assert dp[1, 2] == 1.0            # duplicates coalesced then normalized
    assert dp[2, 3] == 1.0
    assert dp[7, 11] == 1.0


def test_duplicate_edges_weighted():
    # reference's dedup is a no-op (utils/graph.py:59-80) -> duplicate
    # transitions accumulate weight before row normalization
    seqs = [[1, 2], [1, 2], [1, 3]]
    share, _ = build.build_graphs(seqs, SPEC)
    ds = _dense(share)
    np.testing.assert_allclose(ds[1, 2], 2.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(ds[1, 3], 1.0 / 3.0, rtol=1e-6)


def test_rows_sorted_for_segment_sum():
    seqs = [[3, 1, 2, 7, 6, 11]]
    share, specific = build.build_graphs(seqs, SPEC)
    for g in (share, specific):
        assert np.all(np.diff(g.rows) >= 0)
        # row sums are 1 for rows with outgoing edges
        d = _dense(g)
        rs = d.sum(1)
        nz = rs > 0
        np.testing.assert_allclose(rs[nz], 1.0, rtol=1e-6)
