"""Randomized sparse SVD via SpMM power iteration.

Replaces the reference's SuperLU-backed `sparsesvd` (`pgl.py:19,140`) with a
TPU-native randomized range finder (Halko et al. 2011): k+p Gaussian probes,
q power iterations of ``A (A^T .)`` through the sparse SpMM, a QR
re-orthogonalization per iteration, and a small dense SVD of the projected
matrix.  Everything is MXU matmuls + one [k+p, k+p]-ish host-free SVD.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def randomized_svd(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    rmatvec: Callable[[jnp.ndarray], jnp.ndarray],
    n_rows: int,
    n_cols: int,
    k: int,
    oversample: int = 8,
    n_iter: int = 4,
    key: jax.Array | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k SVD of an implicitly-defined matrix.

    Args:
        matvec: X [n_cols, r] -> A @ X [n_rows, r]
        rmatvec: Y [n_rows, r] -> A^T @ Y [n_cols, r]
    Returns:
        (U [n_rows, k], s [k], V [n_cols, k]) with A ~= U diag(s) V^T.
    """
    key = key if key is not None else jax.random.key(0)
    r = k + oversample
    omega = jax.random.normal(key, (n_cols, r), dtype=jnp.float32)
    y = matvec(omega)
    q, _ = jnp.linalg.qr(y)
    for _ in range(n_iter):
        z = rmatvec(q)
        q, _ = jnp.linalg.qr(z)
        y = matvec(q)
        q, _ = jnp.linalg.qr(y)
    b = rmatvec(q).T  # [r, n_cols]
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = q @ ub
    return u[:, :k], s[:k], vt[:k].T
