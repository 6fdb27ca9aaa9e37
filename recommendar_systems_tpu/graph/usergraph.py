"""User-user co-occurrence graph (DualGNN / DRAGON / MENTOR).

The reference precomputes a ``user_graph_dict.npy`` offline
(`/root/reference/preprocessing/dualgnn-gen-u-u-matrix.py:14-41`: weight of
(u, u') = number of co-interacted items, neighbors sorted by weight desc)
and samples the top-k per epoch (`dualgnn.py:207-250` — deterministic
truncation to k, short lists padded by repeating random own-neighbors, empty
lists zero-weighted).

Here the same graph is built once per dataset with one sparse matmul
(C = R R^T) and truncated to a fixed-k [U, k] index/weight pair; softmax or
mean weighting matches `dualgnn.py:228-246`.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp
from scipy import sparse as sp


def build_user_topk_cooccurrence(
    u: np.ndarray,
    i: np.ndarray,
    n_users: int,
    n_items: int,
    k: int,
    weight_mode: str = "softmax",
    seed: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (idx [U, k] int32, weights [U, k] float32).

    Empty-neighborhood users get zero weights (their aggregation is zero,
    matching `dualgnn.py:215-219`).
    """
    rng = np.random.default_rng(seed)

    # native C++ path: per-user neighbor counting (native/recsys_native.cpp)
    try:
        import native

        nat = native.cooccurrence_topk(
            np.asarray(u), np.asarray(i), n_users, n_items, k
        ) if native.available() else None
    except ImportError:
        nat = None
    if nat is not None:
        idx_n, w_n = nat
        idx = np.maximum(idx_n, 0).astype(np.int32)
        if weight_mode == "softmax":
            masked = np.where(idx_n >= 0, w_n, -np.inf)
            ex = np.exp(masked - masked.max(axis=1, keepdims=True))
            ex = np.where(np.isfinite(ex), ex, 0.0)
            denom = ex.sum(axis=1, keepdims=True)
            w = np.where(denom > 0, ex / np.maximum(denom, 1e-12), 0.0).astype(
                np.float32
            )
        else:
            w = np.where(idx_n >= 0, 1.0 / k, 0.0).astype(np.float32)
        # pad short rows by repeating a random own neighbor (same as below)
        for uu in range(n_users):
            n_real = int((idx_n[uu] >= 0).sum())
            if 0 < n_real < k:
                pad = rng.integers(0, n_real, k - n_real)
                idx[uu, n_real:] = idx[uu, pad]
                # weights: recompute softmax over padded raw counts
                if weight_mode == "softmax":
                    raw = np.concatenate([w_n[uu, :n_real], w_n[uu, pad]])
                    ex = np.exp(raw - raw.max())
                    w[uu] = (ex / ex.sum()).astype(np.float32)
        return jnp.asarray(idx), jnp.asarray(w)

    R = sp.csr_matrix(
        (np.ones(len(u), np.float32), (u, i)), shape=(n_users, n_items)
    )
    C = (R @ R.T).tocsr()
    C.setdiag(0)
    C.eliminate_zeros()

    idx = np.zeros((n_users, k), dtype=np.int32)
    w = np.zeros((n_users, k), dtype=np.float32)
    for uu in range(n_users):
        s, e = C.indptr[uu], C.indptr[uu + 1]
        cols = C.indices[s:e]
        vals = C.data[s:e]
        if len(cols) == 0:
            continue
        order = np.argsort(-vals, kind="stable")
        cols, vals = cols[order], vals[order]
        if len(cols) >= k:
            sel_c, sel_v = cols[:k], vals[:k]
        else:
            # pad by repeating random own neighbors (`dualgnn.py:220-227`)
            pad = rng.integers(0, len(cols), k - len(cols))
            sel_c = np.concatenate([cols, cols[pad]])
            sel_v = np.concatenate([vals, vals[pad]])
        idx[uu] = sel_c
        if weight_mode == "softmax":
            ex = np.exp(sel_v - sel_v.max())
            w[uu] = ex / ex.sum()
        else:  # mean
            w[uu] = 1.0 / k
    return jnp.asarray(idx), jnp.asarray(w)


def user_graph_aggregate(features, idx, weights):
    """h_u = sum_j w_uj * features[idx_uj]  (`dualgnn.py:252-266`)."""
    neigh = features[idx]  # [U, k, d]
    return jnp.einsum("uk,ukd->ud", weights, neigh)
