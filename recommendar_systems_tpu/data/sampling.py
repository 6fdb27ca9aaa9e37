"""On-device negative sampling.

Replaces the reference's per-interaction Python rejection loop
(`/root/reference/src/utils/dataloader.py:267-275`, which resamples until the
candidate is not in the user's positive set) with a fully vectorized,
jit-compatible sampler: draw ``n_tries`` uniform candidates per slot at once,
test membership against the per-user positive CSR with a fixed-depth binary
search, and keep the first non-positive candidate.  With catalog sparsity
>99% the probability that all tries collide is ~1e-30, matching the
rejection loop's semantics for practical purposes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_from_csr(
    rng: jax.Array,
    ids: jnp.ndarray,
    indptr: jnp.ndarray,
    indices: jnp.ndarray,
    invalid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One uniform sample from each id's CSR row (0 for empty/invalid rows).

    Used for the neighborhood-loss positive samples (reference
    `dataloader.py:277-305`: random same-neighborhood item; ids with no
    neighbors — or flagged invalid, e.g. >80% catalog coverage — yield 0).
    """
    lo = indptr[ids]
    deg = indptr[ids + 1] - lo
    r = jax.random.randint(rng, ids.shape, 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    offset = jnp.where(deg > 0, r % jnp.maximum(deg, 1), 0)
    picked = indices[jnp.clip(lo + offset, 0, indices.shape[0] - 1)]
    valid = deg > 0
    if invalid_mask is not None:
        valid = valid & ~invalid_mask[ids]
    return jnp.where(valid, picked, 0).astype(jnp.int32)


def csr_membership(
    pos_indptr: jnp.ndarray,
    pos_items: jnp.ndarray,
    users: jnp.ndarray,
    candidates: jnp.ndarray,
    n_steps: int = 32,
) -> jnp.ndarray:
    """Return a bool array: candidates[k] in positives(users[k]).

    ``pos_items`` must be sorted within each CSR row.  Uses a fixed
    ``n_steps``-iteration binary search per element (static shapes; 2^32
    covers any nnz we will ever see).
    """
    lo = pos_indptr[users]          # [B] inclusive
    hi = pos_indptr[users + 1]      # [B] exclusive

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        # guard empty ranges: clamp mid into valid index space
        mid_c = jnp.clip(mid, 0, pos_items.shape[0] - 1)
        v = pos_items[mid_c]
        go_right = v < candidates
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where(go_right, hi, mid)
        alive = lo < hi
        return (jnp.where(alive, new_lo, lo), jnp.where(alive, new_hi, hi))

    lo_f, _ = jax.lax.fori_loop(0, n_steps, body, (lo, hi))
    idx = jnp.clip(lo_f, 0, pos_items.shape[0] - 1)
    found = (lo_f < pos_indptr[users + 1]) & (pos_items[idx] == candidates)
    return found


def sample_negatives(
    rng: jax.Array,
    users: jnp.ndarray,
    n_items: int,
    pos_indptr: jnp.ndarray,
    pos_items: jnp.ndarray,
    n_neg: int = 1,
    n_tries: int = 32,  # kept for API compat; the sampler is exact
    n_steps: int = 32,  # search depth; >= ceil(log2(max_row_len + 1))
) -> jnp.ndarray:
    """Sample negatives *exactly* uniformly over each user's non-positive items.

    Where the reference rejection-samples until it leaves the positive set
    (`dataloader.py:267-275`), this draws a rank ``r`` uniform over the
    complement size ``M_u = n_items - |pos_u|`` and converts it to the r-th
    non-positive item with one fixed-depth binary search:

    the answer is ``r + j*`` where ``j*`` is the number of positives ``p_j``
    with ``p_j - j <= r`` (``g(j) = p_j - j`` is strictly increasing within a
    sorted duplicate-free row, so ``j*`` is a searchsorted on ``g``).

    No retries, no collision probability, identical distribution.
    Returns shape ``[B]`` when ``n_neg == 1`` else ``[B, n_neg]``.

    ``n_steps`` bounds the search depth: each iteration is a tiny
    latency-bound [B] gather on TPU, so callers should pass
    ``ceil(log2(max positives per user + 1))`` (trainer does) rather than
    the worst-case 32.
    """
    B = users.shape[0]
    total = B * n_neg
    u_rep = jnp.repeat(users, n_neg) if n_neg > 1 else users
    lo = pos_indptr[u_rep]
    hi = pos_indptr[u_rep + 1]
    row_len = hi - lo
    comp = jnp.maximum(n_items - row_len, 1)  # complement size M_u
    r = jax.random.randint(rng, (total,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32) % comp

    # binary search for j* = #(j : pos[lo+j] - j <= r) over j in [0, row_len)
    def body(_, state):
        a, b = state  # search window [a, b) over j
        mid = (a + b) // 2
        mid_c = jnp.clip(lo + mid, 0, pos_items.shape[0] - 1)
        g = pos_items[mid_c] - mid
        go_right = g <= r
        new_a = jnp.where(go_right, mid + 1, a)
        new_b = jnp.where(go_right, b, mid)
        alive = a < b
        return (jnp.where(alive, new_a, a), jnp.where(alive, new_b, b))

    zeros = jnp.zeros_like(row_len)
    j_star, _ = jax.lax.fori_loop(0, n_steps, body, (zeros, row_len))
    neg = (r + j_star).astype(jnp.int32)
    if n_neg > 1:
        neg = neg.reshape(B, n_neg)
    return neg
