"""Metric closed-form tests (utils/metrics.py:4-31 semantics)."""

import numpy as np

from c2dsr_tpu import metrics


def test_cal_metrics_closed_form():
    ranks = [1, 5, 6, 20, 21, 100]
    hr5, hr20, mrr5, mrr20, ndcg5, ndcg20 = metrics.cal_metrics(ranks)
    n = len(ranks)
    assert hr5 == 2 / n
    assert hr20 == 4 / n
    np.testing.assert_allclose(mrr5, (1 + 1 / 5) / n)
    np.testing.assert_allclose(mrr20, (1 + 1 / 5 + 1 / 6 + 1 / 20) / n)
    np.testing.assert_allclose(
        ndcg5, (1 / np.log2(2) + 1 / np.log2(6)) / n)
    np.testing.assert_allclose(
        ndcg20,
        (1 / np.log2(2) + 1 / np.log2(6) + 1 / np.log2(7) + 1 / np.log2(21)) / n)


def test_cal_score_improvement():
    # perfect ranks -> all metrics 1.0 -> improvement = mean(1/b - 1)
    bench = [0.5, 0.5, 0.25, 0.25]
    res = metrics.cal_score([1, 1], [1, 1], bench)
    np.testing.assert_allclose(res[0], np.mean([1.0, 1.0, 3.0, 3.0]))
    assert res[1] == 1.0 and res[7] == 1.0
