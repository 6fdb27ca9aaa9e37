"""Item-item kNN modality graphs: blockwise similarity + top-k, with caching.

The reference builds these by materializing the full n_items x n_items cosine
similarity and calling dense ``torch.topk``
(`/root/reference/src/utils/utils.py:119-184`, used by FREEDOM/MGCN/SMORE/
LATTICE/DRAGON/PGL), caching the result to ``.pt`` files in the dataset dir
(`smore.py:46-72`).  Here the similarity is computed in row blocks (MXU
matmuls, never materializing the full matrix) and the result is an exact-k
ELL adjacency; caches are ``.npz`` files keyed by modality/k/norm.

Normalization parity with `utils.py:139-152` (``get_sparse_laplacian``):
degrees are *row sums of the top-k values*, 'sym' scales each edge by
``d_r^-1/2 * d_c^-1/2``, 'rw' by ``d_r^-1``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from recommendar_systems_tpu.graph.sparse import ELL, DenseMat, dense_asarray, dense_ok


def build_sim_topk(
    feats: jnp.ndarray, k: int, block: int = 2048
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k cosine similarity per row (includes the self edge, like the
    reference's dense topk).  Returns (idx [n,k], val [n,k])."""
    f = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
    n = f.shape[0]

    # the full feature matrix rides as a jit ARGUMENT: as a closure
    # constant it inlines into the axon remote-compile request, which the
    # tunnel rejects past ~100s of MB (1 GB at elec's 63k x 4096 — the
    # same wall documented for serving tables in CLAUDE.md)
    @jax.jit
    def one_block(fb, fullf):
        sim = fb @ fullf.T  # [block, n]
        val, idx = jax.lax.top_k(sim, k)
        return idx.astype(jnp.int32), val

    idxs, vals = [], []
    for start in range(0, n, block):
        fb = jax.lax.dynamic_slice_in_dim(f, min(start, max(n - block, 0)), min(block, n))
        if n <= block:
            fb = f
        i, v = one_block(fb, f)
        if start + block > n and n > block:
            # the last block was shifted back to keep a static shape; trim overlap
            overlap = start + block - n
            i, v = i[overlap:], v[overlap:]
        idxs.append(i)
        vals.append(v)
    return jnp.concatenate(idxs, 0), jnp.concatenate(vals, 0)


def knn_normalized_ell(
    idx: jnp.ndarray,
    val: jnp.ndarray,
    n: int,
    norm_type: str = "sym",
    weighted: bool = True,
) -> ELL:
    """Normalize top-k edges into an ELL adjacency (`utils.py:139-152`).

    ``weighted=False`` reproduces the FREEDOM variant
    (`freedom.py:85-103`): edges carry weight 1 before normalization, and
    both endpoint degrees come from the row-sum vector (k + 1e-7 for every
    row), so every kept edge gets value ``1/(k + 1e-7)``.
    """
    if not weighted:
        k = idx.shape[1]
        w = jnp.full_like(val, 1.0 / (k + 1e-7))
        return ELL(idx=idx.astype(jnp.int32), val=w, n_cols=n)
    # degrees = row sums of kept edge weights (scatter_add by row in the
    # reference == plain row sum in exact-k ELL)
    deg = val.sum(axis=1)
    if norm_type == "sym":
        d_inv_sqrt = jnp.where(deg > 0, deg ** -0.5, 0.0)
        w = d_inv_sqrt[:, None] * val * d_inv_sqrt[idx]
    elif norm_type == "rw":
        d_inv = jnp.where(deg > 0, 1.0 / deg, 0.0)
        w = d_inv[:, None] * val
    else:
        w = val
    return ELL(idx=idx.astype(jnp.int32), val=w, n_cols=n)


def build_knn_ell(
    feats,
    k: int,
    norm_type: str = "sym",
    weighted: bool = True,
    cache_dir: Optional[str] = None,
    cache_key: Optional[str] = None,
    block: int = 2048,
    dense: Optional[bool] = None,
):
    """Build (or load from cache) a normalized kNN graph from features.

    Returns a ``DenseMat`` when the n x n block fits the densify threshold
    (MXU matmul propagation beats gather-sum by ~5x on TPU at these sizes);
    ``dense=False`` forces ELL for callers that address edge slots.
    The on-disk cache always stores the ELL form."""
    feats = jnp.asarray(feats)

    def _maybe_dense(ell: ELL):
        n = ell.n_rows
        if dense or (dense is None and dense_ok(n, n)):
            m = np.zeros((n, n), np.float32)
            np.add.at(
                m,
                (np.repeat(np.arange(n), ell.k), np.asarray(ell.idx).ravel()),
                np.asarray(ell.val).ravel(),
            )
            return DenseMat(dense_asarray(m))
        return ell

    path = None
    if cache_dir and cache_key:
        w_tag = "w" if weighted else "u"
        # shape in the key: a cache written for one catalog must never be
        # read for another (same dataset name, different size)
        shape_tag = f"{feats.shape[0]}x{feats.shape[1]}"
        path = os.path.join(
            cache_dir, f"knn_{cache_key}_{shape_tag}_k{k}_{norm_type}{w_tag}.npz"
        )
        if os.path.isfile(path):
            z = np.load(path)
            return _maybe_dense(ELL(
                idx=jnp.asarray(z["idx"]), val=jnp.asarray(z["val"]), n_cols=int(z["n"])
            ))
    idx, val = build_sim_topk(feats, k, block=block)
    ell = knn_normalized_ell(idx, val, feats.shape[0], norm_type, weighted=weighted)
    if cache_dir and cache_key:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(
            path,
            idx=np.asarray(ell.idx),
            val=np.asarray(ell.val),
            n=feats.shape[0],
        )
    return _maybe_dense(ell)
