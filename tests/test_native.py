"""Native C++ data layer vs the pure-Python golden implementation."""

import os
import tempfile

import numpy as np
import pytest

from c2dsr_tpu import native
from c2dsr_tpu.config import DataSpec
from c2dsr_tpu.data import preprocess, raw, synthetic
from c2dsr_tpu.graph import build

nat = native.load()
pytestmark = pytest.mark.skipif(nat is None, reason="no C++ toolchain")

SPEC = DataSpec(n_item_a=50, n_item_b=70, len_max=15)


def _seqs_to_flat(seqs):
    offsets = np.zeros(len(seqs) + 1, np.int64)
    items = []
    for i, s in enumerate(seqs):
        items.extend(s)
        offsets[i + 1] = len(items)
    return offsets, np.asarray(items, np.int32)


@pytest.fixture(scope="module")
def corpus():
    return synthetic.generate_sequences(SPEC, 200, seed=5)


def test_parse_matches_python(corpus):
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "train_new.txt")
        synthetic.write_reference_tsv(corpus, path)
        offsets, items = nat.parse_interactions(path)
        py = raw.parse_interactions(path)
        assert len(offsets) - 1 == len(py)
        for i, s in enumerate(py):
            np.testing.assert_array_equal(items[offsets[i]:offsets[i + 1]], s)


def test_build_edges_matches_python(corpus):
    offsets, items = _seqs_to_flat(corpus)
    share_e, spec_e = nat.build_edges(offsets, items, SPEC.n_item_a)
    g_share, g_spec = build.build_graphs(corpus, SPEC)
    n_share = build._coalesce_row_normalize(share_e.astype(np.int64), SPEC.n_item)
    n_spec = build._coalesce_row_normalize(spec_e.astype(np.int64), SPEC.n_item)
    np.testing.assert_array_equal(n_share.rows, g_share.rows)
    np.testing.assert_array_equal(n_share.cols, g_share.cols)
    np.testing.assert_allclose(n_share.vals, g_share.vals, rtol=1e-6)
    np.testing.assert_array_equal(n_spec.rows, g_spec.rows)
    np.testing.assert_allclose(n_spec.vals, g_spec.vals, rtol=1e-6)


def test_train_examples_match_python(corpus):
    offsets, items = _seqs_to_flat(corpus)
    out = nat.preprocess_train(offsets, items, SPEC.n_item_a, SPEC.n_item_b,
                               SPEC.len_max, seed=7)
    py = preprocess.preprocess_train(corpus, SPEC, seed=7)
    assert out.shape[0] == py["seq_share"].shape[0]

    deterministic = {
        0: "seq_share", 1: "seq_share_a", 2: "seq_share_b", 3: "pos",
        4: "pos_a", 5: "pos_b", 6: "gt_share_a", 7: "gt_share_b",
        8: "gt_a", 9: "gt_b", 10: "gt_mask_a", 11: "gt_mask_b",
    }
    for f, name in deterministic.items():
        np.testing.assert_array_equal(out[:, f], py[name], err_msg=name)

    # corrupted sequences are random but structurally constrained:
    # same-domain slots keep the original item; other-domain slots get a
    # uniform same-domain replacement (dataloader.py:80,85)
    seq = out[:, 0]
    na, pad = SPEC.n_item_a, SPEC.idx_pad
    neg_a, neg_b = out[:, 12], out[:, 13]
    is_a = (seq < na)
    is_b = (seq >= na) & (seq != pad)
    np.testing.assert_array_equal(neg_a[is_a], seq[is_a])
    np.testing.assert_array_equal(neg_b[is_b], seq[is_b])
    assert ((neg_a[is_b] >= na) & (neg_a[is_b] < pad)).all()
    assert ((neg_b[is_a] >= 0) & (neg_b[is_a] < na)).all()
    np.testing.assert_array_equal(neg_a[seq == pad], pad)
    np.testing.assert_array_equal(neg_b[seq == pad], pad)


def test_eval_examples_match_python(corpus):
    offsets, items = _seqs_to_flat(corpus)
    seqs, scalars, negs = nat.preprocess_eval(
        offsets, items, SPEC.n_item_a, SPEC.n_item_b, SPEC.len_max,
        n_neg=20, seed=9)
    py = preprocess.preprocess_evaluate(corpus, SPEC, n_neg_sample=20, seed=9)
    assert seqs.shape[0] == py["seq_share"].shape[0]
    for f, name in enumerate(("seq_share", "seq_share_a", "seq_share_b",
                              "pos", "pos_a", "pos_b")):
        np.testing.assert_array_equal(seqs[:, f], py[name], err_msg=name)
    for c, name in enumerate(("idx_last_a", "idx_last_b", "xory_last",
                              "gt_last")):
        np.testing.assert_array_equal(scalars[:, c], py[name], err_msg=name)

    # negatives: distinct, in-pool, gt excluded
    pools = np.where(scalars[:, 2] == 0, SPEC.n_item_a, SPEC.n_item_b)
    for i in range(seqs.shape[0]):
        row = negs[i]
        assert len(set(row.tolist())) == 20
        assert (row >= 0).all() and (row < pools[i]).all()
        assert scalars[i, 3] not in row


def test_native_speedup(corpus):
    """Native preprocessing should beat Python comfortably (sanity only)."""
    import time
    big = synthetic.generate_sequences(SPEC, 3000, seed=6)
    offsets, items = _seqs_to_flat(big)
    t0 = time.time()
    nat.preprocess_train(offsets, items, SPEC.n_item_a, SPEC.n_item_b,
                         SPEC.len_max, seed=1)
    t_nat = time.time() - t0
    t0 = time.time()
    preprocess.preprocess_train(big, SPEC, seed=1)
    t_py = time.time() - t0
    assert t_nat < t_py, (t_nat, t_py)
