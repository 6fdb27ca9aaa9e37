"""Metric functions vs a brute-force per-user oracle.

The oracle follows the reference formulas (`/root/reference/src/utils/
metrics.py:12-118`) literally, including the NDCG idcg clamping and the MAP
min(m, N) normalization, so these tests pin exact numeric parity.
"""

import numpy as np
import pytest

from recommendar_systems_tpu.utils.metrics import (
    map_,
    ndcg_,
    precision_,
    recall2_,
    recall_,
)


def _oracle_ndcg(pos_index, pos_len):
    n, K = pos_index.shape
    out = np.zeros((n, K))
    for u in range(n):
        idcg_len = min(pos_len[u], K)
        idcg = np.cumsum(1.0 / np.log2(np.arange(2, K + 2)))
        idcg[idcg_len:] = idcg[idcg_len - 1]
        dcg = np.cumsum(np.where(pos_index[u], 1.0 / np.log2(np.arange(2, K + 2)), 0))
        out[u] = dcg / idcg
    return out.mean(axis=0)


def _oracle_map(pos_index, pos_len):
    n, K = pos_index.shape
    out = np.zeros((n, K))
    for u in range(n):
        pre = np.cumsum(pos_index[u]) / np.arange(1, K + 1)
        sum_pre = np.cumsum(pre * pos_index[u])
        lens = min(pos_len[u], K)
        ranges = np.arange(1, K + 1)
        ranges[lens:] = ranges[lens - 1]
        out[u] = sum_pre / ranges
    return out.mean(axis=0)


@pytest.fixture
def random_hits():
    rng = np.random.default_rng(0)
    pos_index = rng.random((50, 20)) < 0.2
    pos_len = rng.integers(1, 40, size=50)
    # make hits consistent: no more hits than positives
    for u in range(50):
        extra = pos_index[u].sum() - pos_len[u]
        if extra > 0:
            on = np.where(pos_index[u])[0]
            pos_index[u, on[:extra]] = False
    return pos_index, pos_len.astype(np.int64)


def test_recall(random_hits):
    pos_index, pos_len = random_hits
    expected = (np.cumsum(pos_index, 1) / pos_len[:, None]).mean(0)
    np.testing.assert_allclose(recall_(pos_index, pos_len), expected)


def test_recall2(random_hits):
    pos_index, pos_len = random_hits
    expected = np.cumsum(pos_index, 1).sum(0) / pos_len.sum()
    np.testing.assert_allclose(recall2_(pos_index, pos_len), expected)


def test_ndcg_matches_oracle(random_hits):
    pos_index, pos_len = random_hits
    np.testing.assert_allclose(
        ndcg_(pos_index, pos_len), _oracle_ndcg(pos_index, pos_len), rtol=1e-12
    )


def test_map_matches_oracle(random_hits):
    pos_index, pos_len = random_hits
    np.testing.assert_allclose(
        map_(pos_index, pos_len), _oracle_map(pos_index, pos_len), rtol=1e-12
    )


def test_precision(random_hits):
    pos_index, pos_len = random_hits
    expected = (np.cumsum(pos_index, 1) / np.arange(1, 21)).mean(0)
    np.testing.assert_allclose(precision_(pos_index, pos_len), expected)


def test_perfect_ranking_gives_one():
    # user with 3 positives, all ranked top-3
    pos_index = np.array([[True, True, True, False, False]])
    pos_len = np.array([3])
    assert ndcg_(pos_index, pos_len)[4] == pytest.approx(1.0)
    assert recall_(pos_index, pos_len)[4] == pytest.approx(1.0)
