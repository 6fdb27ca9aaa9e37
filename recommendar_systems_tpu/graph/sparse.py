"""Static-shape sparse graph containers and SpMM.

The reference does all graph propagation through `torch.sparse.mm` over COO
tensors built from scipy (`/root/reference/src/models/lightgcn.py:117-130`,
`smore.py:289-318`) or through torch-geometric scatter/gather message
passing.  On TPU both collapse onto two static-shape primitives:

- ``COO``: sorted-by-row coordinate lists; SpMM = gather rows of the dense
  operand by column index, scale by edge value, and ``segment_sum`` into
  destination rows (`jax.ops.segment_sum` with ``indices_are_sorted`` lowers
  to an efficient XLA scatter-add).
- ``ELL``: fixed-degree neighbor lists ``[n, k]`` (exact fit for kNN modality
  graphs where every row has exactly ``k`` neighbors); SpMM = batched gather
  + weighted sum, which XLA fuses into a single pass.
- ``DenseBip``/``DenseMat``: fully materialized adjacency blocks whose SpMM
  is a plain MXU matmul — the fastest path on TPU whenever the dense block
  fits the ``set_dense_threshold`` budget (gather/scatter runs ~20 GB/s
  effective on this hardware; the MXU streams dense operands at HBM speed).

Both are registered pytrees so they can be closed over or passed through
``jit`` boundaries, and padding entries are encoded as zero-valued edges so
shapes never depend on data.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class COO:
    """Row-sorted COO sparse matrix with static nnz (padding via zero vals)."""

    rows: jnp.ndarray  # [nnz] int32, sorted ascending
    cols: jnp.ndarray  # [nnz] int32
    vals: jnp.ndarray  # [nnz] float32 (0 for padding entries)
    n_rows: int
    n_cols: int

    def tree_flatten(self):
        return (self.rows, self.cols, self.vals), (self.n_rows, self.n_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        rows, cols, vals = children
        return cls(rows, cols, vals, aux[0], aux[1])

    @property
    def nnz(self) -> int:
        return int(self.rows.shape[0])

    def with_values(self, vals: jnp.ndarray) -> "COO":
        return COO(self.rows, self.cols, vals, self.n_rows, self.n_cols)

    def transpose_unsorted(self) -> "COO":
        """Transpose without re-sorting (segment_sum still correct, slower)."""
        return COO(self.cols, self.rows, self.vals, self.n_cols, self.n_rows)


@jax.tree_util.register_pytree_node_class
@dataclass
class ELL:
    """Fixed-degree adjacency: each row has exactly ``k`` (possibly zero-
    weighted) neighbors.  Natural format for kNN item-item graphs
    (reference builds these densely at `utils.py:171-184`)."""

    idx: jnp.ndarray  # [n, k] int32 neighbor ids
    val: jnp.ndarray  # [n, k] float32 edge weights
    n_cols: int

    def tree_flatten(self):
        return (self.idx, self.val), (self.n_cols,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    @property
    def n_rows(self) -> int:
        return int(self.idx.shape[0])

    @property
    def k(self) -> int:
        return int(self.idx.shape[1])

    def with_values(self, val: jnp.ndarray) -> "ELL":
        return ELL(self.idx, val, self.n_cols)


@jax.tree_util.register_pytree_node_class
@dataclass
class LowRank:
    """Low-rank adjacency ``L @ R^T`` (n x n via two [n, k] factors).

    Used for PGL's global SVD-filtered graph (`pgl.py:138-154`): instead of
    materializing and thresholding the dense product of singular triplets,
    the factorized form is kept exact and SpMM is two MXU matmuls.
    """

    left: jnp.ndarray   # [n, k]
    right: jnp.ndarray  # [m, k]

    def tree_flatten(self):
        return (self.left, self.right), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1])

    @property
    def n_rows(self) -> int:
        return int(self.left.shape[0])

    @property
    def n_cols(self) -> int:
        return int(self.right.shape[0])


def spmm_lowrank(adj: LowRank, x: jnp.ndarray) -> jnp.ndarray:
    return adj.left @ (adj.right.T @ x)


# ---------------------------------------------------------------------------
# Dense adjacency.
#
# TPU gather/scatter over irregular indices runs ~20 GB/s effective on the
# SpMM hot path (tools/microbench_spmm2.py), while a dense matmul rides the
# MXU at memory speed.  For the catalog sizes the reference ships (U x I up
# to a few hundred MB dense) the TPU-native move is to materialize the
# normalized interaction block ONCE and propagate with plain matmuls: R @ X
# is ~20-40x faster than gather+segment_sum at baby/sports scale.  Builders
# densify automatically when the dense bytes fit under ``_DENSE_THRESHOLD``
# (large catalogs keep the static-shape sparse path).
# ---------------------------------------------------------------------------

_DENSE_THRESHOLD = int(1.5e9)  # bytes of f32 storage; 0 disables


def set_dense_threshold(n_bytes: int) -> None:
    """Densify adjacencies whose f32 storage fits in ``n_bytes`` (0 = never).
    Must be called before graphs are built."""
    global _DENSE_THRESHOLD
    _DENSE_THRESHOLD = int(n_bytes)


def dense_ok(n_rows: int, n_cols: int, copies: int = 1) -> bool:
    return _DENSE_THRESHOLD > 0 and 4 * n_rows * n_cols * copies <= _DENSE_THRESHOLD


# Storage dtype of densified adjacency blocks.  bfloat16 halves the HBM
# traffic of the propagation matmuls (the dominant per-step cost once the
# dense path is active) at ~0.4% relative error on the normalized edge
# values; accumulation stays f32 either way.
_DENSE_DTYPE = jnp.float32


def set_dense_dtype(dtype) -> None:
    """jnp.float32 (default) or jnp.bfloat16.  Must be called before graphs
    are built."""
    global _DENSE_DTYPE
    _DENSE_DTYPE = dtype


def dense_asarray(m) -> jnp.ndarray:
    return jnp.asarray(m, dtype=_DENSE_DTYPE)


def _mm(a: jnp.ndarray, b: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """Matmul honoring the mixed-precision knobs with f32 accumulation."""
    if _SPMM_DTYPE is not None:
        a = a.astype(_SPMM_DTYPE)
        b = b.astype(_SPMM_DTYPE)
    elif a.dtype == jnp.bfloat16:
        b = b.astype(jnp.bfloat16)
    return jnp.matmul(a, b, preferred_element_type=jnp.float32).astype(out_dtype)


@jax.tree_util.register_pytree_node_class
@dataclass
class DenseMat:
    """Dense adjacency block [n, m]; SpMM is one MXU matmul."""

    mat: jnp.ndarray

    def tree_flatten(self):
        return (self.mat,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def n_rows(self) -> int:
        return int(self.mat.shape[0])

    @property
    def n_cols(self) -> int:
        return int(self.mat.shape[1])


@jax.tree_util.register_pytree_node_class
@dataclass
class DenseBip:
    """Dense (U+I)-node bipartite adjacency stored as its blocks.

    ``A = [[diag_u, ur], [iu, diag_i]]`` where ``iu`` defaults to ``ur.T``
    (symmetric normalization) and the diagonal defaults to zero.  SpMM is
    two block matmuls — the transpose fuses into the dot_general, so the
    symmetric case stores only [U, I].

    ``dims`` carries the LOGICAL (U, I) when ``ur`` is stored tile-padded
    for the fused Pallas propagation kernel (ops/fused_bip.py); zero rows /
    columns contribute nothing, so padded and unpadded storage are
    numerically identical.

    FACTORED storage: the symmetric normalization 1/sqrt(deg_u * deg_i)
    (reference `lightgcn.py:96-100`) separates EXACTLY per edge, so
    ``A = diag(row_scale) @ M @ diag(col_scale)`` where ``M`` is the int8
    interaction COUNT matrix — half the HBM bytes of bf16 with zero
    quantization error.  When ``row_scale``/``col_scale`` are set, ``ur``
    holds M (int8) and SpMM composes the scales around the matmul.

    ``row_norm=True`` reinterprets the scales as ROW normalizers applied on
    the output side only: ``top = row_scale * (M @ xi)``,
    ``bot = col_scale * (M.T @ xu)`` — the exact factored form of the
    row-normalized (mean / random-walk) adjacencies D^-1 A used by
    MMGCN/LATTICE/MVGAE, which otherwise need TWO dense value blocks.
    """

    ur: jnp.ndarray                 # [U, I] (possibly padded; int8 M if factored)
    iu: jnp.ndarray | None = None   # [I, U]; None -> ur.T
    diag: jnp.ndarray | None = None  # [U+I] self-loop weights; None -> 0
    dims: tuple | None = None        # logical (U, I); None -> physical shape
    row_scale: jnp.ndarray | None = None  # [U] f32 (padded length)
    col_scale: jnp.ndarray | None = None  # [I] f32 (padded length)
    row_norm: bool = False           # scales are output-side row normalizers

    def tree_flatten(self):
        children = [self.ur]
        aux = [self.iu is not None, self.diag is not None, self.dims,
               self.row_scale is not None, self.row_norm]
        if self.iu is not None:
            children.append(self.iu)
        if self.diag is not None:
            children.append(self.diag)
        if self.row_scale is not None:
            children.append(self.row_scale)
            children.append(self.col_scale)
        return tuple(children), tuple(aux)

    @classmethod
    def tree_unflatten(cls, aux, children):
        has_iu, has_diag = aux[0], aux[1]
        dims = aux[2] if len(aux) > 2 else None
        has_scales = aux[3] if len(aux) > 3 else False
        row_norm = aux[4] if len(aux) > 4 else False
        it = iter(children[1:])
        return cls(
            children[0],
            next(it) if has_iu else None,
            next(it) if has_diag else None,
            dims,
            next(it) if has_scales else None,
            next(it) if has_scales else None,
            row_norm,
        )

    @property
    def n_users(self) -> int:
        return self.dims[0] if self.dims else int(self.ur.shape[0])

    @property
    def n_items(self) -> int:
        return self.dims[1] if self.dims else int(self.ur.shape[1])

    @property
    def n_rows(self) -> int:
        return self.n_users + self.n_items

    n_cols = n_rows


def spmm_densemat(adj: DenseMat, x: jnp.ndarray) -> jnp.ndarray:
    return _mm(adj.mat, x, x.dtype)


@jax.tree_util.register_pytree_node_class
@dataclass
class DenseUI:
    """Rectangular U x I block sharing a ``DenseBip``'s factored storage.

    The normalized interaction block R-hat = D_u^-1/2 M D_i^-1/2 (reference
    `mgcn.py:109-136`, `smore.py:176-199`) has EXACTLY the values of the
    symmetric bipartite adjacency's u-i block, so models that consume both
    (SMORE/MGCN user lift through R) can alias one int8 count matrix in HBM
    instead of carrying a second dense f32 copy: build via ``ui_view``.
    """

    mat: jnp.ndarray                # [Up, Ip] int8 M (factored) or values
    dims: tuple | None = None       # logical (U, I)
    row_scale: jnp.ndarray | None = None  # [Up] f32
    col_scale: jnp.ndarray | None = None  # [Ip] f32

    def tree_flatten(self):
        children = [self.mat]
        aux = (self.dims, self.row_scale is not None)
        if self.row_scale is not None:
            children += [self.row_scale, self.col_scale]
        return tuple(children), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        dims, has_scales = aux
        return cls(
            children[0], dims,
            children[1] if has_scales else None,
            children[2] if has_scales else None,
        )

    @property
    def n_rows(self) -> int:
        return self.dims[0] if self.dims else int(self.mat.shape[0])

    @property
    def n_cols(self) -> int:
        return self.dims[1] if self.dims else int(self.mat.shape[1])


def ui_view(adj) -> "DenseUI | BitUI | None":
    """Alias a symmetric factored adjacency's u-i block as a rectangular
    R-hat view (same HBM buffers).  None when the storage isn't factored."""
    if isinstance(adj, BitBip):
        if adj.row_norm:
            return None
        return BitUI(adj.bits, adj.dims, adj.row_scale, adj.col_scale)
    if (adj.iu is not None or adj.row_scale is None
            or adj.diag is not None or adj.row_norm):
        return None
    return DenseUI(adj.ur, adj.dims or tuple(map(int, adj.ur.shape)),
                   adj.row_scale, adj.col_scale)


def raw_ui_view(adj) -> "DenseUI | BitUI | None":
    """Alias a factored adjacency's u-i COUNT block as the RAW interaction
    matrix R (values = interaction counts, no normalization) — same HBM
    buffers, no scales.  LGMRec's MGE lift is ``R_raw @ item_feats / deg``
    (reference `lgmrec.py:103-113`); 5-core data is deduplicated so counts
    are exactly the reference's 0/1 entries.  None when not factored."""
    if isinstance(adj, BitBip):
        if adj.row_norm:
            return None
        ones_r = jnp.ones_like(adj.row_scale)
        ones_c = jnp.ones_like(adj.col_scale)
        return BitUI(adj.bits, adj.dims, ones_r, ones_c)
    if not isinstance(adj, DenseBip):
        return None
    if (adj.iu is not None or adj.row_scale is None
            or adj.diag is not None or adj.row_norm):
        return None
    return DenseUI(adj.ur, adj.dims or tuple(map(int, adj.ur.shape)),
                   None, None)


def spmm_denseui(adj: DenseUI, x: jnp.ndarray) -> jnp.ndarray:
    """R-hat @ x for [I, d] item stacks -> [U, d] user lift."""
    u, i = adj.n_rows, adj.n_cols
    ip = int(adj.mat.shape[1])
    xi = jnp.pad(x, ((0, ip - i), (0, 0))) if ip != i else x
    if adj.col_scale is not None:
        xi = xi * adj.col_scale[:, None]
    m = adj.mat
    if m.dtype == jnp.int8:
        tgt = (jnp.float32 if jax.default_backend() == "cpu"
               else jnp.bfloat16)
        m = m.astype(tgt)
    out = _mm(m, xi, jnp.float32)
    if adj.row_scale is not None:
        out = out * adj.row_scale[:, None]
    return out[:u].astype(x.dtype)


# ---------------------------------------------------------------------------
# Bit-packed 0/1 adjacency (ops/bitbip.py): 1 bit per edge slot.
#
# Deduplicated interaction data has 0/1 counts, so the factored count matrix
# packs losslessly into int32 bit planes — 8x fewer HBM bytes than int8, and
# the dual-direction Pallas kernel reads the bits ONCE for both A@xi and
# A.T@xu.  This is a CAPACITY feature, not a speed one: measured on v5e
# (tools/probe_bitunpack.py, 19456x8192 d=64) the in-kernel VPU unpack makes
# the bit path ~30% slower than the XLA int8 matmuls, so "auto" (default)
# engages it only where the int8/f32 dense blocks do NOT fit the densify
# threshold but the 32x-smaller bit planes do — extending the MXU path to
# elec-scale catalogs (63k items) that would otherwise fall back to the
# ~20 GB/s gather/scatter sparse path.  set_bit_adj(True) forces bits
# whenever they fit (tests, microbenches); "auto" is also TPU-only (the CPU
# fallback runs Pallas in interpret mode — correct but slow).
# ---------------------------------------------------------------------------

_BIT_ADJ: bool | str = "auto"

# Bit planes get their own capacity budget: the f32 densify threshold
# (default 1.5 GB) exists because dense blocks compete with activations for
# HBM, but the packed bits are 32x smaller than the f32 equivalent, so a
# catalog whose f32 block would be 50 GB (elec) packs to ~1.6 GB — well
# worth spending on a 16 GB-HBM chip to stay on the MXU path.
_BIT_THRESHOLD = int(4e9)


def set_bit_threshold(n_bytes: int) -> None:
    """Cap on packed bit-plane bytes for the bit adjacency path."""
    global _BIT_THRESHOLD
    _BIT_THRESHOLD = int(n_bytes)


def set_bit_adj(mode: bool | str) -> None:
    """True (force) / False / "auto" (TPU only, only past the int8 dense
    threshold).  Must be set before graphs build."""
    global _BIT_ADJ
    _BIT_ADJ = mode


# bit matmuls do slot-proportional work while COO does edge-proportional
# work, so very sparse catalogs can favor COO (the round-5 SMORE-at-elec
# trace: 192-wide bit lifts at 0.012% density — PARITY.md).  The floor is
# a tuning knob, default 0.0 = current behavior (no density gating):
# whether bits win at a given density also depends on column width and
# layer count, so the default stays measurement-driven per workload.
_BIT_DENSITY_FLOOR = 0.0


def set_bit_density_floor(frac: float) -> None:
    """Minimum nnz/(rows*cols) for "auto" to pick bit storage (when the
    caller supplies nnz).  0 disables density gating (default)."""
    global _BIT_DENSITY_FLOOR
    _BIT_DENSITY_FLOOR = float(frac)


def use_bit_adj(n_rows: int, n_cols: int, nnz: int | None = None) -> bool:
    """Should this adjacency use bit-packed storage?  See module comment."""
    if _BIT_ADJ is False or not bit_ok(n_rows, n_cols):
        return False
    if _BIT_ADJ is True:
        return True
    if (
        _BIT_DENSITY_FLOOR > 0.0
        and nnz is not None
        and nnz < _BIT_DENSITY_FLOOR * n_rows * n_cols
    ):
        return False
    return jax.default_backend() != "cpu" and not dense_ok(n_rows, n_cols)


def bit_ok(n_rows: int, n_cols: int) -> bool:
    """Bit-plane storage bytes fit the bit budget (densification globally
    on via the dense threshold, see module comment on ``_BIT_THRESHOLD``)."""
    from recommendar_systems_tpu.ops.bitbip import fits_vmem, pad_cols

    ip = pad_cols(n_cols)
    return (
        _DENSE_THRESHOLD > 0
        and _BIT_THRESHOLD > 0
        and n_rows * ip // 8 <= _BIT_THRESHOLD
        and fits_vmem(ip, 128)
    )


@jax.tree_util.register_pytree_node_class
@dataclass
class BitBip:
    """Bit-packed factored bipartite adjacency A = diag(r) M diag(c) with
    0/1 M stored as int32 bit planes (see ops/bitbip.py for the layout).

    ``row_norm=True`` reinterprets the scales as output-side row normalizers
    (mean / random-walk adjacency), exactly like ``DenseBip.row_norm``.
    ``col_scale`` is stored in LOGICAL column order (applied before the
    physical bit-plane permutation).
    """

    bits: jnp.ndarray               # [Up, K] int32, K = Ip/32
    dims: tuple                     # logical (U, I)
    row_scale: jnp.ndarray          # [Up] f32
    col_scale: jnp.ndarray          # [Ip] f32, logical order
    row_norm: bool = False

    def tree_flatten(self):
        return (self.bits, self.row_scale, self.col_scale), (
            self.dims, self.row_norm,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], children[1], children[2], aux[1])

    @property
    def k_words(self) -> int:
        return int(self.bits.shape[1])

    @property
    def pad_dims(self) -> tuple:
        return (int(self.bits.shape[0]), self.k_words * 32)

    @property
    def n_users(self) -> int:
        return self.dims[0]

    @property
    def n_items(self) -> int:
        return self.dims[1]

    @property
    def n_rows(self) -> int:
        return self.n_users + self.n_items

    n_cols = n_rows


@jax.tree_util.register_pytree_node_class
@dataclass
class BitUI:
    """Rectangular R-hat view aliasing a ``BitBip``'s bit planes (same HBM
    buffers) — the bit-packed counterpart of ``DenseUI``."""

    bits: jnp.ndarray
    dims: tuple
    row_scale: jnp.ndarray
    col_scale: jnp.ndarray

    def tree_flatten(self):
        return (self.bits, self.row_scale, self.col_scale), (self.dims,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], children[1], children[2])

    @property
    def k_words(self) -> int:
        return int(self.bits.shape[1])

    @property
    def n_rows(self) -> int:
        return self.dims[0]

    @property
    def n_cols(self) -> int:
        return self.dims[1]


def spmm_bitbip(adj: BitBip, x: jnp.ndarray) -> jnp.ndarray:
    from recommendar_systems_tpu.ops.bitbip import (
        bit_dual_matmul, perm_cols, unperm_cols,
    )

    up, ip = adj.pad_dims
    u, i = adj.dims
    padded_in = x.shape[0] == up + ip and (up, ip) != adj.dims
    if padded_in:
        out_u, out_i = up, ip
        xu, xi = x[:up], x[up:]
    else:
        out_u, out_i = u, i
        xu = jnp.pad(x[:u], ((0, up - u), (0, 0))) if up != u else x[:u]
        xi = jnp.pad(x[u:], ((0, ip - i), (0, 0))) if ip != i else x[u:]
    if not adj.row_norm:
        xu = xu * adj.row_scale[:, None]
        xi = xi * adj.col_scale[:, None]
    from recommendar_systems_tpu.ops.bitbip import (
        bit_dual_matmul_sharded, bit_shardable,
    )
    from recommendar_systems_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    xi_p = perm_cols(xi.astype(jnp.bfloat16), adj.k_words)
    if mesh is not None and bit_shardable(int(adj.bits.shape[0]), mesh):
        top, bot_p = bit_dual_matmul_sharded(adj.bits, xu, xi_p, mesh)
    else:
        top, bot_p = bit_dual_matmul(adj.bits, xu, xi_p)
    bot = unperm_cols(bot_p, adj.k_words)
    top = top * adj.row_scale[:, None]
    bot = bot * adj.col_scale[:, None]
    top, bot = top.astype(x.dtype), bot.astype(x.dtype)
    return jnp.concatenate([top[:out_u], bot[:out_i]], axis=0)


def spmm_bitui(adj: BitUI, x: jnp.ndarray) -> jnp.ndarray:
    """R-hat @ x for [I, d] item stacks -> [U, d] user lift."""
    from recommendar_systems_tpu.ops.bitbip import bit_matmul, perm_cols

    up, kw = int(adj.bits.shape[0]), adj.k_words
    ip = kw * 32
    u, i = adj.dims
    xi = jnp.pad(x, ((0, ip - i), (0, 0))) if ip != i else x
    xi = xi * adj.col_scale[:, None]
    out = bit_matmul(adj.bits, perm_cols(xi.astype(jnp.bfloat16), kw))
    out = out * adj.row_scale[:, None]
    return out[:u].astype(x.dtype)


# Fused bidirectional propagation (ops/fused_bip.py): one HBM pass over the
# symmetric dense block for BOTH A@xi and A.T@xu.  Enabled per-process (the
# builders then store tile-padded blocks); the Pallas kernel only runs on
# TPU — on CPU padded blocks take the plain-matmul path (numerically equal).
_FUSED_BIP = False


def set_fused_bip(enabled: bool) -> None:
    """Must be called before graphs are built (padding happens at build)."""
    global _FUSED_BIP
    _FUSED_BIP = bool(enabled)


def fused_bip_enabled() -> bool:
    return _FUSED_BIP


# Which kernel runs the dense u-i propagation when storage is tile-padded:
# "xla"    = two jnp.matmuls on the raw (possibly int8) block; XLA fuses the
#            int8->bf16 convert into the matmul reads.  Measured FASTER than
#            the Pallas kernel on v5e (LightGCN 431k->482k, SMORE 230k->297k
#            ex/s): Mosaic's transposed-contraction direction can't keep the
#            MXU fed at d=64, while XLA's dual matmuls stream int8 at near
#            peak HBM bandwidth.
# "pallas" = ops/fused_bip.py (one HBM pass over A for both directions) —
#            kept for comparison via bench --ui-pallas.
_UI_MATMUL_MODE = "xla"


def set_ui_matmul_mode(mode: str) -> None:
    assert mode in ("pallas", "xla"), mode
    global _UI_MATMUL_MODE
    _UI_MATMUL_MODE = mode


def _use_fused_kernel(adj: DenseBip, d: int) -> bool:
    if adj.iu is not None or adj.dims is None:
        return False
    if _UI_MATMUL_MODE != "pallas":
        return False
    if jax.default_backend() == "cpu":
        return False  # interpret mode: correct but slow; XLA path is exact
    from recommendar_systems_tpu.ops.fused_bip import fits_vmem

    return fits_vmem(int(adj.ur.shape[1]), d)


def pad_nodes(adj, x: jnp.ndarray) -> jnp.ndarray:
    """Pad a [U+I, d] node stack into the padded storage space of a
    ``DenseBip`` (no-op otherwise).  Zero rows are inert under propagation,
    so whole layer loops can run in padded space and un-pad once at the end
    (see ``models/layers.py::lightgcn_propagate``)."""
    if isinstance(adj, BitBip):
        u, i = adj.dims
        up, ip = adj.pad_dims
        if (up, ip) != (u, i):
            xu = jnp.pad(x[:u], ((0, up - u), (0, 0)))
            xi = jnp.pad(x[u:], ((0, ip - i), (0, 0)))
            return jnp.concatenate([xu, xi], axis=0)
    if isinstance(adj, DenseBip) and adj.dims is not None:
        u, i = adj.dims
        up, ip = int(adj.ur.shape[0]), int(adj.ur.shape[1])
        if (up, ip) != (u, i):
            xu = jnp.pad(x[:u], ((0, up - u), (0, 0)))
            xi = jnp.pad(x[u:], ((0, ip - i), (0, 0)))
            return jnp.concatenate([xu, xi], axis=0)
    return x


def unpad_nodes(adj, x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``pad_nodes``."""
    if isinstance(adj, BitBip):
        u, i = adj.dims
        up, ip = adj.pad_dims
        if (up, ip) != (u, i):
            return jnp.concatenate([x[:u], x[up : up + i]], axis=0)
    if isinstance(adj, DenseBip) and adj.dims is not None:
        u, i = adj.dims
        up, ip = int(adj.ur.shape[0]), int(adj.ur.shape[1])
        if (up, ip) != (u, i):
            return jnp.concatenate([x[:u], x[up : up + i]], axis=0)
    return x


def coo_to_densemat(adj: COO, dtype=None) -> DenseMat:
    """Scatter a COO's values into a dense [n, m] block (jit-safe).

    The per-step soft-R path (SMOREDiff, reference `smorediff.py:287-338`)
    rewrites per-EDGE values every step but then propagates through the
    whole block.  Scattering the nnz scalar values (~4 bytes/edge) into a
    zeroed dense block and running the user lift as one MXU matmul beats
    per-edge gather/segment_sum SpMM (~20 GB/s effective on TPU) whenever
    the dense block fits the densify threshold — the scatter moves ~0.5 MB
    where the COO SpMM gathers nnz*d*4 bytes per pass.  ``build_norm_ui``
    lexsorts edges by (row, col), so the flattened indices are sorted;
    duplicate edges (none after 5-core dedup) accumulate exactly like
    ``spmm_coo``'s segment_sum.  Only call when ``dense_ok(n, m)`` — the
    int32 flat index also requires n*m < 2**31, which the densify
    threshold already guarantees.
    """
    n, m = adj.n_rows, adj.n_cols
    # the int32 flat index (and the scatter's promise_in_bounds) is only
    # valid below 2**31 entries; the default densify threshold guarantees
    # it, but set_dense_threshold(>~8.6 GB) would silently corrupt here
    assert n * m < 2**31, (
        f"coo_to_densemat: {n}x{m} block overflows the int32 flat index"
    )
    flat = adj.rows.astype(jnp.int32) * jnp.int32(m) + adj.cols.astype(jnp.int32)
    # ``dtype`` (e.g. bf16 on TPU) scatters into a narrower block directly:
    # halves the zero-init+write traffic AND removes the downstream f32->bf16
    # convert of the full block before the propagation matmul (~823 MB/step
    # saved at baby scale, SMOREDiffX trace)
    tgt = dtype or adj.vals.dtype
    dense = (
        jnp.zeros((n * m,), tgt)
        .at[flat]
        .add(adj.vals.astype(tgt), indices_are_sorted=True,
             mode="promise_in_bounds")
    )
    return DenseMat(dense.reshape(n, m))


def spmm_densebip(adj: DenseBip, x: jnp.ndarray) -> jnp.ndarray:
    up, ip = int(adj.ur.shape[0]), int(adj.ur.shape[1])
    padded_in = (
        adj.dims is not None
        and x.shape[0] == up + ip
        and (up, ip) != adj.dims
    )
    if padded_in:
        u, i = up, ip  # stay in padded space; caller un-pads at the end
        xu, xi = x[:up], x[up:]
    else:
        u, i = adj.n_users, adj.n_items
        xu = jnp.pad(x[:u], ((0, up - u), (0, 0))) if up != u else x[:u]
        xi = jnp.pad(x[u:], ((0, ip - i), (0, 0))) if ip != i else x[u:]
    if adj.row_scale is not None and not adj.row_norm:
        # factored A = diag(r) M diag(c): scale, propagate counts, scale
        xu = xu * adj.row_scale[:, None]
        xi = xi * adj.col_scale[:, None]
    if _use_fused_kernel(adj, int(x.shape[1])):
        from recommendar_systems_tpu.ops.fused_bip import (
            fused_bip_matmul,
            fused_bip_matmul_sharded,
            shardable,
        )
        from recommendar_systems_tpu.parallel.mesh import active_mesh

        mesh = active_mesh()
        if mesh is not None and shardable(int(adj.ur.shape[0]), mesh):
            top, bot = fused_bip_matmul_sharded(adj.ur, xu, xi, mesh)
        else:
            top, bot = fused_bip_matmul(adj.ur, xu, xi)
    else:
        m = adj.ur
        if m.dtype == jnp.int8:
            # int8 counts are exactly representable in bf16; on TPU the
            # convert fuses into the matmul's A read (139 MB int8 streamed,
            # no hoisted wide copy), on CPU keep f32 for exact test parity
            tgt = (jnp.float32 if jax.default_backend() == "cpu"
                   else jnp.bfloat16)
            m = m.astype(tgt)
        top = _mm(m, xi, x.dtype)
        bot = _mm(adj.iu if adj.iu is not None else m.T, xu, x.dtype)
    if adj.row_scale is not None:
        top = top * adj.row_scale[:, None]
        bot = bot * adj.col_scale[:, None]
    top, bot = top.astype(x.dtype), bot.astype(x.dtype)
    out = jnp.concatenate([top[:u], bot[:i]], axis=0)
    if adj.diag is not None:
        out = out + adj.diag[:, None] * x
    return out


def ell_union_max(a: ELL, b: ELL) -> ELL:
    """Element-wise max over the union of two ELL sparsity patterns.

    Counterpart of SMORE's ``max_pool_fusion`` (`smore.py:153-174`): edges
    present in both graphs keep the larger value; pattern-exclusive edges
    keep their own.  Each input has unique columns per row, so a duplicate
    column appears at most twice in the concatenation — sort columns within
    each row, fold adjacent duplicates with max, zero the second copy.
    """
    if isinstance(a, DenseMat) and isinstance(b, DenseMat):
        # missing edges are 0 in the dense block but must behave as -inf in
        # the union-max (`smore.py:165-170`): a pattern-exclusive NEGATIVE
        # edge value (cosine sims can be negative) must survive, not be
        # clipped to 0 by max(v, 0)
        a_on = a.mat != 0
        b_on = b.mat != 0
        av = jnp.where(a_on, a.mat, -jnp.inf)
        bv = jnp.where(b_on, b.mat, -jnp.inf)
        return DenseMat(jnp.where(a_on | b_on, jnp.maximum(av, bv), 0.0))
    idx = jnp.concatenate([a.idx, b.idx], axis=1)
    val = jnp.concatenate([a.val, b.val], axis=1)
    order = jnp.argsort(idx, axis=1, stable=True)
    idx_s = jnp.take_along_axis(idx, order, axis=1)
    val_s = jnp.take_along_axis(val, order, axis=1)
    dup = idx_s[:, 1:] == idx_s[:, :-1]  # [n, 2k-1] slot i+1 duplicates slot i
    # zero the first copy of each duplicate pair, fold max into the second
    dup_first = jnp.concatenate([dup, jnp.zeros_like(dup[:, :1])], axis=1)
    merged = jnp.where(dup_first, 0.0, val_s)
    merged = merged.at[:, 1:].set(
        jnp.where(dup, jnp.maximum(val_s[:, 1:], val_s[:, :-1]), merged[:, 1:])
    )
    return ELL(idx=idx_s, val=merged, n_cols=a.n_cols)


# Global compute dtype for SpMM gathers (set from config before tracing).
# bfloat16 halves the HBM traffic of the gather — the propagation hot path
# is bandwidth-bound — while the segment accumulation stays float32.
_SPMM_DTYPE = None


def set_spmm_dtype(dtype) -> None:
    """None (default) keeps the input dtype; jnp.bfloat16 enables mixed
    precision.  Must be called before the train step is traced."""
    global _SPMM_DTYPE
    _SPMM_DTYPE = dtype


def spmm_dtype():
    """The explicit SpMM compute-dtype override, or None (input dtype)."""
    return _SPMM_DTYPE


# Peak-memory cap for the [nnz, d] gathered intermediate of a COO SpMM.
# Past it, the edge list is processed in fixed-size chunks under lax.scan —
# same total work, peak memory = one chunk (a 33M-edge gather at d=64 is
# 8.6 GB and exhausts HBM at ml-20m scale; chunking makes nnz unbounded).
_COO_CHUNK_BYTES = 1 << 30


def set_coo_chunk_bytes(n: int) -> None:
    global _COO_CHUNK_BYTES
    _COO_CHUNK_BYTES = int(n)


def spmm_coo(adj: COO, x: jnp.ndarray, sorted_rows: bool = True) -> jnp.ndarray:
    """``adj @ x`` for a row-sorted COO adjacency.

    Replaces `torch.sparse.mm` (reference `lightgcn.py:121-123`).
    """
    out_dtype = x.dtype
    vals = adj.vals
    if _SPMM_DTYPE is not None:
        x = x.astype(_SPMM_DTYPE)
        vals = vals.astype(_SPMM_DTYPE)
    nnz, d = adj.rows.shape[0], x.shape[1]
    chunk = max(1, _COO_CHUNK_BYTES // max(4 * d, 1))
    if nnz > chunk:
        n_chunks = -(-nnz // chunk)
        pad = n_chunks * chunk - nnz
        # zero-valued padding edges pointing at row/col 0 are inert
        rows = jnp.concatenate([adj.rows, jnp.zeros((pad,), adj.rows.dtype)])
        cols = jnp.concatenate([adj.cols, jnp.zeros((pad,), adj.cols.dtype)])
        vpad = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])

        def body(acc, ch):
            r, c, v = ch
            g = (x[c] * v[:, None]).astype(out_dtype)
            return acc + jax.ops.segment_sum(
                g, r, num_segments=adj.n_rows, indices_are_sorted=sorted_rows
            ), ()

        acc0 = jnp.zeros((adj.n_rows, d), out_dtype)
        out, _ = jax.lax.scan(
            body, acc0,
            (rows.reshape(n_chunks, chunk), cols.reshape(n_chunks, chunk),
             vpad.reshape(n_chunks, chunk)),
        )
        return out
    gathered = (x[adj.cols] * vals[:, None]).astype(out_dtype)
    return jax.ops.segment_sum(
        gathered,
        adj.rows,
        num_segments=adj.n_rows,
        indices_are_sorted=sorted_rows,
    )


def spmm_ell(adj: ELL, x: jnp.ndarray) -> jnp.ndarray:
    """``adj @ x`` for a fixed-degree adjacency: gather + weighted sum."""
    neigh = x[adj.idx]  # [n, k, d]
    return jnp.einsum("nk,nkd->nd", adj.val, neigh)


def spmm(adj, x: jnp.ndarray) -> jnp.ndarray:
    if isinstance(adj, COO):
        return spmm_coo(adj, x)
    if isinstance(adj, ELL):
        return spmm_ell(adj, x)
    if isinstance(adj, LowRank):
        return spmm_lowrank(adj, x)
    if isinstance(adj, DenseBip):
        return spmm_densebip(adj, x)
    if isinstance(adj, BitBip):
        return spmm_bitbip(adj, x)
    if isinstance(adj, DenseUI):
        return spmm_denseui(adj, x)
    if isinstance(adj, BitUI):
        return spmm_bitui(adj, x)
    if isinstance(adj, DenseMat):
        return spmm_densemat(adj, x)
    raise TypeError(f"unsupported adjacency type {type(adj)}")
