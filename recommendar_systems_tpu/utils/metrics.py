"""Top-k ranking metrics, numerically identical to the reference.

Every function takes the boolean hit matrix ``pos_index`` of shape
``[n_users, max_k]`` (entry ``(u, r)`` is True iff the item ranked ``r`` for
user ``u`` is in the ground truth) and the per-user ground-truth sizes
``pos_len`` of shape ``[n_users]``, and returns a length-``max_k`` vector of
the metric at every cutoff — the same contract as the reference
(`/root/reference/src/utils/metrics.py:12-118`).  Implementations here are
fully vectorized (the reference uses per-row Python loops for the NDCG/MAP
tail clamping).
"""

from __future__ import annotations

import numpy as np


def recall_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    """Per-user recall@k averaged over users (reference `metrics.py:12-15`)."""
    rec = np.cumsum(pos_index, axis=1) / pos_len.reshape(-1, 1)
    return rec.mean(axis=0)


def recall2_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    """Global recall: summed hits over summed positives (`metrics.py:18-27`)."""
    rec_cum = np.cumsum(pos_index, axis=1)
    return rec_cum.sum(axis=0) / pos_len.sum()


def ndcg_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    """Binary-relevance NDCG@k (`metrics.py:30-63`).

    IDCG@k uses ``min(pos_len, k)`` ideal hits; past that index the ideal DCG
    is held constant (the reference clamps with a per-row loop; here the clamp
    is a vectorized gather of the shared cumulative-gain vector).
    """
    max_k = pos_index.shape[1]
    gains = 1.0 / np.log2(np.arange(2, max_k + 2, dtype=np.float64))
    ideal_cum = np.cumsum(gains)  # [max_k]
    idcg_len = np.minimum(pos_len, max_k)
    # idcg[u, j] = ideal_cum[min(j, idcg_len[u]-1)]
    clamp = np.minimum(
        np.arange(max_k)[None, :], np.maximum(idcg_len - 1, 0)[:, None]
    )
    idcg = ideal_cum[clamp]
    dcg = np.cumsum(np.where(pos_index, gains[None, :], 0.0), axis=1)
    return (dcg / idcg).mean(axis=0)


def map_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    """MAP@k with min(m, N) normalization (`metrics.py:66-89`)."""
    max_k = pos_index.shape[1]
    ranks = np.arange(1, max_k + 1, dtype=np.float64)
    pre = np.cumsum(pos_index, axis=1) / ranks[None, :]
    sum_pre = np.cumsum(pre * pos_index.astype(np.float64), axis=1)
    actual_len = np.minimum(pos_len, max_k)
    denom = np.minimum(ranks[None, :], np.maximum(actual_len, 1)[:, None])
    return (sum_pre / denom).mean(axis=0)


def precision_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    """Precision@k averaged over users (`metrics.py:92-105`)."""
    rec = np.cumsum(pos_index, axis=1) / np.arange(1, pos_index.shape[1] + 1)
    return rec.mean(axis=0)


metrics_dict = {
    "ndcg": ndcg_,
    "recall": recall_,
    "recall2": recall2_,
    "precision": precision_,
    "map": map_,
}
