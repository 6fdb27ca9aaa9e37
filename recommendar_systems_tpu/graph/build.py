"""Host-side adjacency construction (vectorized numpy, one-time cost).

The reference builds its normalized bipartite adjacency through a scipy dok
dict fill in a Python loop (`/root/reference/src/models/lightgcn.py:77-103`,
seconds-to-minutes for the large catalogs) and re-does it inside every model.
Here construction is a handful of vectorized numpy ops emitting row-sorted
static-shape COO buffers once per dataset.

Math parity:
- ``build_norm_adj``: A over N = U + I nodes with the two bipartite blocks,
  degree ``d = rowsum(A>0) + 1e-7``, values ``d_r^-1/2 * d_c^-1/2``
  (exactly `lightgcn.py:96-100`).
- ``build_norm_ui``: the normalized U x I block R-hat with the same degrees,
  used by MGCN/SMORE for the user-side view (`mgcn.py:109-136`).
- ``build_edge_info``: per u-i edge list and symmetric-normalized edge values
  used for degree-sensitive edge dropout (`freedom.py:158-164`).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from recommendar_systems_tpu.graph.sparse import (
    COO, BitBip, DenseBip, DenseMat, dense_asarray, dense_ok,
    fused_bip_enabled, use_bit_adj,
)


def _pack_from_edges(
    u: np.ndarray, i: np.ndarray, n_users: int, n_items: int
) -> np.ndarray | None:
    """int32 bit planes [Up, Ip/32] from a DEDUPLICATED u-i edge list, built
    directly (no dense f32 intermediate — at elec scale that block would be
    ~50 GB of host RAM).  Returns None when duplicate edges exist (counts > 1
    cannot pack to one bit; callers fall back to int8 storage)."""
    from recommendar_systems_tpu.ops.bitbip import pad_cols

    if len(np.unique(u.astype(np.int64) * n_items + i)) != len(u):
        return None
    up = _pad_to(n_users, 256)
    ip = pad_cols(n_items)
    packed = np.zeros((up, ip // 32), np.uint32)
    np.bitwise_or.at(
        packed,
        (u, i // 32),
        np.uint32(1) << (i % 32).astype(np.uint32),
    )
    return packed.view(np.int32)


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


# tile granularities of the fused-bip padded u-i block (ops/fused_bip.py
# grid tiles); the single source of truth for every consumer that must
# predict the padded storage shape (e.g. SMOREDiffX's dense soft-R state)
FUSED_ROW_TILE = 256
FUSED_COL_TILE = 128


def fused_pad_shape(n_users: int, n_items: int) -> tuple:
    """(Up, Ip) tile-padded shape of the fused dense u-i adjacency block."""
    return _pad_to(n_users, FUSED_ROW_TILE), _pad_to(n_items, FUSED_COL_TILE)


def _dense_block(
    r: np.ndarray, c: np.ndarray, v: np.ndarray, n_rows: int, n_cols: int
) -> np.ndarray:
    """Accumulate an edge list into a dense f32 block (duplicates add,
    matching segment_sum over duplicate COO entries)."""
    m = np.zeros((n_rows, n_cols), dtype=np.float32)
    np.add.at(m, (r, c), v)
    return m


def _degrees(u: np.ndarray, i: np.ndarray, n_users: int, n_items: int):
    du = np.bincount(u, minlength=n_users).astype(np.float64)
    di = np.bincount(i, minlength=n_items).astype(np.float64)
    return du, di


def build_norm_adj(
    u: np.ndarray, i: np.ndarray, n_users: int, n_items: int,
    dense: bool | None = None, factored: bool | None = None,
):
    """Symmetric-normalized (U+I)x(U+I) bipartite adjacency.

    Returns a ``DenseBip`` (MXU matmul propagation) when the dense [U, I]
    block fits the densify threshold, else row-sorted COO.  ``dense=False``
    forces COO for callers that need edge-slot access (per-epoch dropout).

    When the fused kernel is enabled (``factored`` defaults to that flag),
    the dense block is stored FACTORED: the per-edge value
    1/sqrt(deg_u * deg_i) separates exactly, so storage is the int8 count
    matrix plus f32 row/col scales — half the HBM bytes of bf16, zero
    quantization error.  ``factored=False`` keeps plain dense values for
    callers that edit the block elementwise (SELFCF's adjacency dropout).
    """
    u = np.asarray(u, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    du, di = _degrees(u, i, n_users, n_items)
    inv_u = np.power(du + 1e-7, -0.5)
    inv_i = np.power(di + 1e-7, -0.5)
    vals_ui = (inv_u[u] * inv_i[i]).astype(np.float32)
    if (
        dense is not False
        and (factored is None or factored)
        and use_bit_adj(n_users, n_items, nnz=len(u))
    ):
        # bit-packed storage reaches past the f32 densify threshold (the
        # bits are 32x smaller), so large catalogs stay on the MXU path
        packed = _pack_from_edges(u, i, n_users, n_items)
        if packed is not None:
            from recommendar_systems_tpu.ops.bitbip import pad_cols

            up, ip = packed.shape[0], pad_cols(n_items)
            r = np.zeros(up, np.float32)
            r[:n_users] = inv_u.astype(np.float32)
            c = np.zeros(ip, np.float32)
            c[:n_items] = inv_i.astype(np.float32)
            return BitBip(
                jnp.asarray(packed),
                dims=(n_users, n_items),
                row_scale=jnp.asarray(r),
                col_scale=jnp.asarray(c),
            )
    if dense or (dense is None and dense_ok(n_users, n_items)):
        if fused_bip_enabled():
            # tile-padded storage for the fused one-pass propagation kernel
            # (ops/fused_bip.py); zero rows/cols are numerically inert
            up, ip = fused_pad_shape(n_users, n_items)
            if factored is None or factored:
                counts = _dense_block(u, i, np.ones(len(u), np.float32), up, ip)
                assert counts.max() < 127, "int8 count overflow"
                r = np.zeros(up, np.float32)
                r[:n_users] = inv_u.astype(np.float32)
                c = np.zeros(ip, np.float32)
                c[:n_items] = inv_i.astype(np.float32)
                return DenseBip(
                    jnp.asarray(counts.astype(np.int8)),
                    dims=(n_users, n_items),
                    row_scale=jnp.asarray(r),
                    col_scale=jnp.asarray(c),
                )
            return DenseBip(
                dense_asarray(_dense_block(u, i, vals_ui, up, ip)),
                dims=(n_users, n_items),
            )
        return DenseBip(dense_asarray(_dense_block(u, i, vals_ui, n_users, n_items)))

    rows = np.concatenate([u, i + n_users])
    cols = np.concatenate([i + n_users, u])
    vals = np.concatenate([vals_ui, vals_ui])
    order = np.lexsort((cols, rows))
    n = n_users + n_items
    return COO(
        rows=jnp.asarray(rows[order], dtype=jnp.int32),
        cols=jnp.asarray(cols[order], dtype=jnp.int32),
        vals=jnp.asarray(vals[order]),
        n_rows=n,
        n_cols=n,
    )


def build_norm_ui(
    u: np.ndarray, i: np.ndarray, n_users: int, n_items: int,
    dense: bool | None = None,
):
    """Normalized U x I interaction block R-hat (DenseMat or row-sorted COO)."""
    u = np.asarray(u, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    du, di = _degrees(u, i, n_users, n_items)
    inv_u = np.power(du + 1e-7, -0.5)
    inv_i = np.power(di + 1e-7, -0.5)
    vals = (inv_u[u] * inv_i[i]).astype(np.float32)
    if dense or (dense is None and dense_ok(n_users, n_items)):
        return DenseMat(dense_asarray(_dense_block(u, i, vals, n_users, n_items)))
    order = np.lexsort((i, u))
    return COO(
        rows=jnp.asarray(u[order], dtype=jnp.int32),
        cols=jnp.asarray(i[order], dtype=jnp.int32),
        vals=jnp.asarray(vals[order]),
        n_rows=n_users,
        n_cols=n_items,
    )


def build_norm_adj_and_r(
    u: np.ndarray, i: np.ndarray, n_users: int, n_items: int,
    dense: bool | None = None,
):
    """(norm_adj, R-hat) pair sharing storage when possible.

    R-hat = D_u^-1/2 M D_i^-1/2 is exactly norm_adj's u-i block
    (`mgcn.py:109-136`, `smore.py:176-199`), so when the adjacency
    densifies into factored int8-count form the R block is an alias of the
    same HBM buffers (``ui_view``) instead of a second dense f32 copy.
    """
    from recommendar_systems_tpu.graph.sparse import BitBip, DenseBip, ui_view

    norm_adj = build_norm_adj(u, i, n_users, n_items, dense=dense)
    r_hat = (
        ui_view(norm_adj)
        if isinstance(norm_adj, (DenseBip, BitBip))
        else None
    )
    if r_hat is None:
        r_hat = build_norm_ui(u, i, n_users, n_items, dense=dense)
    return norm_adj, r_hat


def build_mean_adj(
    u: np.ndarray, i: np.ndarray, n_users: int, n_items: int,
    dense: bool | None = None,
):
    """Row-normalized (U+I) bipartite adjacency D^-1 A, no self loops.

    This is torch-geometric's ``aggr='mean'`` message passing over the
    symmetric interaction edge list (MMGCN `mmgcn.py:32,191-213`).
    """
    u = np.asarray(u, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    n = n_users + n_items
    rows = np.concatenate([u, i + n_users])
    cols = np.concatenate([i + n_users, u])
    deg = np.bincount(rows, minlength=n).astype(np.float64)
    with np.errstate(divide="ignore"):
        d_inv = np.where(deg > 0, 1.0 / deg, 0.0)
    vals = d_inv[rows].astype(np.float32)
    if dense is not False and use_bit_adj(n_users, n_items, nnz=len(u)):
        packed = _pack_from_edges(u, i, n_users, n_items)
        if packed is not None:
            from recommendar_systems_tpu.ops.bitbip import pad_cols

            up, ip = packed.shape[0], pad_cols(n_items)
            r = np.zeros(up, np.float32)
            r[:n_users] = d_inv[:n_users].astype(np.float32)
            c = np.zeros(ip, np.float32)
            c[:n_items] = d_inv[n_users:].astype(np.float32)
            return BitBip(
                jnp.asarray(packed),
                dims=(n_users, n_items),
                row_scale=jnp.asarray(r),
                col_scale=jnp.asarray(c),
                row_norm=True,
            )
    if dense or (dense is None and dense_ok(n_users, n_items)):
        # factored: D^-1 A = row-normalizer applied on the OUTPUT side of
        # the int8 count matmul (row_norm=True) — one int8 block instead of
        # two dense value blocks
        counts = _dense_block(u, i, np.ones(len(u), np.float32),
                              n_users, n_items)
        assert counts.max() < 127, "int8 count overflow"
        return DenseBip(
            jnp.asarray(counts.astype(np.int8)),
            row_scale=jnp.asarray(d_inv[:n_users].astype(np.float32)),
            col_scale=jnp.asarray(d_inv[n_users:].astype(np.float32)),
            row_norm=True,
        )
    order = np.lexsort((cols, rows))
    return COO(
        rows=jnp.asarray(rows[order], dtype=jnp.int32),
        cols=jnp.asarray(cols[order], dtype=jnp.int32),
        vals=jnp.asarray(vals[order]),
        n_rows=n,
        n_cols=n,
    )


def build_rw_adj_selfloop(
    u: np.ndarray, i: np.ndarray, n_users: int, n_items: int,
    dense: bool | None = None,
):
    """Row-normalized (U+I) adjacency WITH self-loops: D^-1 (A + I).

    LATTICE's u-i graph normalization (`lattice.py:105-125`: ``d_inv =
    rowsum^-1`` over ``adj + eye``).
    """
    u = np.asarray(u, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    n = n_users + n_items
    rows = np.concatenate([u, i + n_users, np.arange(n)])
    cols = np.concatenate([i + n_users, u, np.arange(n)])
    deg = np.bincount(rows, minlength=n).astype(np.float64)
    with np.errstate(divide="ignore"):
        d_inv = np.where(deg > 0, 1.0 / deg, 0.0)
    vals = d_inv[rows].astype(np.float32)
    if dense or (dense is None and dense_ok(n_users, n_items)):
        counts = _dense_block(u, i, np.ones(len(u), np.float32),
                              n_users, n_items)
        assert counts.max() < 127, "int8 count overflow"
        return DenseBip(
            jnp.asarray(counts.astype(np.int8)),
            diag=jnp.asarray(vals[2 * len(u):]),
            row_scale=jnp.asarray(d_inv[:n_users].astype(np.float32)),
            col_scale=jnp.asarray(d_inv[n_users:].astype(np.float32)),
            row_norm=True,
        )
    order = np.lexsort((cols, rows))
    return COO(
        rows=jnp.asarray(rows[order], dtype=jnp.int32),
        cols=jnp.asarray(cols[order], dtype=jnp.int32),
        vals=jnp.asarray(vals[order]),
        n_rows=n,
        n_cols=n,
    )


def build_edge_info(
    u: np.ndarray, i: np.ndarray, n_users: int, n_items: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(edges [2, E], sym-normalized edge values [E]) for u-i edges.

    Matches the reference's `get_edge_info` + `_normalize_adj_m`
    (`freedom.py:147-164`): values are 1/sqrt(deg_u * deg_i) per edge.
    """
    u = np.asarray(u, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    du, di = _degrees(u, i, n_users, n_items)
    vals = (np.power(du[u] + 1e-7, -0.5) * np.power(di[i] + 1e-7, -0.5)).astype(
        np.float32
    )
    return np.stack([u, i]).astype(np.int32), vals


def sym_coo_with_perm(
    u: np.ndarray, i: np.ndarray, n_users: int, n_items: int
):
    """Symmetric (U+I) COO from u-i edges plus the slot permutation.

    Returns ``(coo, perm)`` where ``coo`` is row-sorted with placeholder
    values and ``perm`` maps positions in ``concat([ui_vals, iu_vals])`` to
    the sorted slot order — so per-epoch edge dropout (FREEDOM
    `freedom.py:130-145`, LayerGCN `layergcn.py:51-70`) can recompute values
    on device as ``coo.with_values(concat([v, v])[perm])`` with static
    shapes (dropped edges become zero-valued slots).
    """
    u = np.asarray(u, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    rows = np.concatenate([u, i + n_users])
    cols = np.concatenate([i + n_users, u])
    order = np.lexsort((cols, rows))
    n = n_users + n_items
    coo = COO(
        rows=jnp.asarray(rows[order], dtype=jnp.int32),
        cols=jnp.asarray(cols[order], dtype=jnp.int32),
        vals=jnp.zeros(len(order), dtype=jnp.float32),
        n_rows=n,
        n_cols=n,
    )
    return coo, jnp.asarray(order, dtype=jnp.int32)


def coo_from_ui_edges(
    u: np.ndarray,
    i: np.ndarray,
    vals_ui: np.ndarray,
    n_users: int,
    n_items: int,
) -> COO:
    """Symmetrize u-i edges (with per-edge values) into the (U+I) node space."""
    rows = np.concatenate([u, i + n_users])
    cols = np.concatenate([i + n_users, u])
    vals = np.concatenate([vals_ui, vals_ui]).astype(np.float32)
    order = np.lexsort((cols, rows))
    n = n_users + n_items
    return COO(
        rows=jnp.asarray(rows[order], dtype=jnp.int32),
        cols=jnp.asarray(cols[order], dtype=jnp.int32),
        vals=jnp.asarray(vals[order]),
        n_rows=n,
        n_cols=n,
    )
