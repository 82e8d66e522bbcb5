"""Golden-file tests of preprocessing semantics (dataloader.py:60-228).

The expected values below are hand-derived from the reference semantics for
a 5-item/7-item toy domain pair (na=5, nb=7, n_item=13, pad=12, len_max=8).
"""

import numpy as np
import pytest

from c2dsr_tpu.config import DataSpec
from c2dsr_tpu.data import preprocess

SPEC = DataSpec(n_item_a=5, n_item_b=7, len_max=8)
# shared ids: A = 0..4, B = 5..11, pad = 12


def _train_one(seq):
    return preprocess.preprocess_train([seq], SPEC, seed=0)


def test_train_example_golden():
    out = _train_one([1, 7, 2, 11, 3])
    assert out["seq_share"].shape == (1, 8)
    np.testing.assert_array_equal(out["seq_share"][0],
                                  [12, 12, 12, 12, 1, 7, 2, 11])
    np.testing.assert_array_equal(out["seq_share_a"][0],
                                  [12, 12, 12, 12, 1, 12, 2, 12])
    # B tower: final B position re-padded because overall next item (3) is
    # not in domain B (dataloader.py:121-128)
    np.testing.assert_array_equal(out["seq_share_b"][0],
                                  [12, 12, 12, 12, 12, 7, 12, 12])
    np.testing.assert_array_equal(out["pos"][0], [0, 0, 0, 0, 1, 2, 3, 4])
    np.testing.assert_array_equal(out["pos_a"][0], [0, 0, 0, 0, 1, 0, 2, 0])
    np.testing.assert_array_equal(out["pos_b"][0], [0, 0, 0, 0, 0, 1, 0, 0])
    np.testing.assert_array_equal(out["gt_share_a"][0], [5, 5, 5, 5, 5, 2, 5, 3])
    np.testing.assert_array_equal(out["gt_share_b"][0], [7, 7, 7, 7, 2, 7, 6, 7])
    np.testing.assert_array_equal(out["gt_a"][0], [5, 5, 5, 5, 2, 5, 3, 5])
    np.testing.assert_array_equal(out["gt_b"][0], [7, 7, 7, 7, 7, 6, 7, 7])
    np.testing.assert_array_equal(out["gt_mask_a"][0], [0, 0, 0, 0, 1, 0, 1, 0])
    np.testing.assert_array_equal(out["gt_mask_b"][0], [0, 0, 0, 0, 0, 1, 0, 0])


def test_train_corrupted_sequences_ranges():
    out = _train_one([1, 7, 2, 11, 3])
    neg_a = out["seq_share_neg_a"][0]
    neg_b = out["seq_share_neg_b"][0]
    # A-corrupt keeps A items, randomizes B slots into [na, idx_pad)
    assert neg_a[4] == 1 and neg_a[6] == 2
    assert 5 <= neg_a[5] < 12 and 5 <= neg_a[7] < 12
    # B-corrupt keeps B items, randomizes A slots into [0, na)
    assert neg_b[5] == 7 and neg_b[7] == 11
    assert 0 <= neg_b[4] < 5 and 0 <= neg_b[6] < 5
    np.testing.assert_array_equal(neg_a[:4], [12] * 4)
    np.testing.assert_array_equal(neg_b[:4], [12] * 4)


def test_train_drops_user_without_domain_gt():
    # only one A item -> no A ground truth -> dropped (dataloader.py:115-116)
    out = _train_one([1, 7])
    assert out["seq_share"].shape[0] == 0


def test_train_strict_b_boundary_quirk():
    # gt_last == n_item_a (first B item) fails the strict '>' in-domain test
    # for B (dataloader.py:123) -> single-B-position user gets dropped.
    out = _train_one([7, 1, 5])
    assert out["seq_share"].shape[0] == 0


def test_eval_example_golden():
    out = preprocess.preprocess_evaluate([[1, 7, 2, 11, 3]], SPEC,
                                         n_neg_sample=3, seed=0)
    np.testing.assert_array_equal(out["seq_share"][0],
                                  [12, 12, 12, 12, 1, 7, 2, 11])
    np.testing.assert_array_equal(out["seq_share_a"][0],
                                  [12, 12, 12, 12, 1, 12, 2, 12])
    np.testing.assert_array_equal(out["seq_share_b"][0],
                                  [12, 12, 12, 12, 12, 7, 12, 11])
    assert out["idx_last_a"][0] == 6
    assert out["idx_last_b"][0] == 7
    assert out["xory_last"][0] == 0
    assert out["gt_last"][0] == 3
    neg = out["list_neg"][0]
    assert len(set(neg.tolist())) == 3
    assert all(0 <= x < 5 and x != 3 for x in neg)


def test_eval_domain_b_negative_pools():
    seq = [1, 7, 2, 11]          # gt_last = 11 -> B, local id 6
    full = preprocess.preprocess_evaluate([seq], SPEC, n_neg_sample=4, seed=0)
    assert full["xory_last"][0] == 1 and full["gt_last"][0] == 6
    assert all(0 <= x < 7 and x != 6 for x in full["list_neg"][0])
    # reference bug-parity: pool truncated to [0, nb - na) = [0, 2)
    # (dataloader.py:222-224); with gt excluded only {0, 1} remain
    bug = preprocess.preprocess_evaluate([seq], SPEC, n_neg_sample=1, seed=0,
                                         bug_truncated_b_neg_pool=True)
    assert all(0 <= x < 2 for x in bug["list_neg"][0])


def test_eval_idx_last_sentinel_when_domain_absent():
    # all-A history with B gt: idx_last_b must be -1 (dataloader.py:204-213)
    out = preprocess.preprocess_evaluate([[1, 2, 3, 6]], SPEC,
                                         n_neg_sample=3, seed=0)
    assert out["xory_last"][0] == 1
    assert out["idx_last_b"][0] == -1
    assert out["idx_last_a"][0] == 7


def test_use_raw_forces_rebuild(tmp_path):
    """--use_raw must bypass a stale cache and rewrite it (main.py:23)."""
    from c2dsr_tpu.data import synthetic
    raw_dir = str(tmp_path / "raw")
    cache_dir = str(tmp_path / "proc")
    seqs = synthetic.generate_sequences(SPEC, 20, seed=5)
    synthetic.write_reference_tsv(seqs, raw_dir + "/train_new.txt")

    out1 = preprocess.load_or_build_split(raw_dir, cache_dir, "train", SPEC,
                                          seed=0)
    # poison the cache: without use_raw the stale cache is served
    stale = {k: np.zeros_like(v) for k, v in out1.items()}
    np.savez_compressed(cache_dir + "/train.std.npz", **stale)
    served = preprocess.load_or_build_split(raw_dir, cache_dir, "train",
                                            SPEC, seed=0)
    assert not np.array_equal(served["seq_share"], out1["seq_share"])
    # use_raw rebuilds from text AND rewrites the cache
    rebuilt = preprocess.load_or_build_split(raw_dir, cache_dir, "train",
                                             SPEC, seed=0, use_raw=True)
    np.testing.assert_array_equal(rebuilt["seq_share"], out1["seq_share"])
    again = preprocess.load_or_build_split(raw_dir, cache_dir, "train",
                                           SPEC, seed=0)
    np.testing.assert_array_equal(again["seq_share"], out1["seq_share"])
