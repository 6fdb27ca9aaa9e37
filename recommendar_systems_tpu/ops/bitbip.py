"""Bit-packed 0/1 adjacency matmuls: 1 bit per edge slot, unpacked on-VPU.

The factored dense adjacency (graph/sparse.py::DenseBip) stores the u-i
interaction COUNT matrix as int8.  Deduplicated interaction data (the
reference's 5-core `.inter` files and this repo's synthetic generator) has
0/1 counts, so the matrix packs losslessly to ONE bit per entry: 8x fewer A
bytes than int8, and the fused dual-direction kernel reads A once for both
``A @ xi`` and ``A.T @ xu`` — 16x fewer A bytes than two int8 matmuls.  The
packing extends the dense MXU path to catalogs where int8/f32 blocks no
longer fit HBM (ml-20m-class: 138k x 27k; elec: 192k x 63k).

The grid is 2-D: row tiles x COLUMN tiles of a fixed ``KC = 256`` words
(8192 columns).  Per-program work is therefore constant regardless of
catalog width — Mosaic compile time stays flat (a single monolithic-K
program at elec width never finished compiling).  Each direction is its own
kernel so its output block accumulates across the MINOR grid dim (the only
revisit pattern Pallas TPU keeps resident in VMEM): ``A @ xi`` iterates
(rows, cols) and accumulates over column tiles; ``A.T @ xu`` iterates
(cols, rows) and accumulates over row tiles.  The "dual" op is the pair —
with 1-bit storage, reading A twice is still 4x fewer A bytes than ONE
int8 pass.

Bit-plane layout (chosen so the in-kernel unpack is pure shift/and + lane
concatenation WITHIN one column tile — no cross-tile interleave): packed
word ``P[u, k]`` (int32) holds logical columns ``k*32 + j`` at bit ``j``
(plain little-endian packing).  Inside column tile ``t`` (words
``t*KC .. (t+1)*KC``), the unpacked PHYSICAL column is
``t*32*KC + j*KC + (k - t*KC)``, so operands/results permute with a
reshape-transpose per tile (no gather):

    xi_perm = xi.reshape(C, KC, 32, d).transpose(0, 2, 1, 3).reshape(Ip, d)

Column padding makes ``Ip`` a multiple of ``32*KC = 8192``; zero
rows/columns are numerically inert.

Gradients: the packed matrix is a frozen graph constant (integer leaf, zero
cotangent); the operand VJPs reuse the same kernels with roles swapped, so
backward also reads A once per pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 96 * 2**20
_VMEM_BUDGET = 64 * 2**20

KC = 256            # words per column tile
IC = 32 * KC        # unpacked columns per tile

# testing/tuning override for the row-tile size (None = auto)
_FORCE_BLOCK_U: int | None = None


def set_block_u(bu: int | None) -> None:
    global _FORCE_BLOCK_U
    _FORCE_BLOCK_U = bu


# ---------------------------------------------------------------------------
# packing / permutation helpers
# ---------------------------------------------------------------------------


def pad_cols(n_cols: int) -> int:
    """Columns padded to whole column tiles (multiples of 32*KC)."""
    return -(-n_cols // IC) * IC


def pack_bits(m01: np.ndarray) -> np.ndarray:
    """[U, Ip] 0/1 -> int32 [U, Ip/32] words (host-side, at build).
    Logical column ``c`` is bit ``c % 32`` of word ``c // 32``."""
    u, ip = m01.shape
    assert ip % 32 == 0, ip
    w = m01.astype(np.uint32).reshape(u, ip // 32, 32)
    shifts = np.arange(32, dtype=np.uint32)
    return (
        (w << shifts[None, None, :]).sum(axis=2, dtype=np.uint32).view(np.int32)
    )


def perm_cols(x: jnp.ndarray, k_words: int) -> jnp.ndarray:
    """Logical [Ip, d] operand -> per-tile physical bit-plane row order."""
    ip, d = x.shape
    c = k_words // KC
    return x.reshape(c, KC, 32, d).transpose(0, 2, 1, 3).reshape(ip, d)


def unperm_cols(x: jnp.ndarray, k_words: int) -> jnp.ndarray:
    ip, d = x.shape
    c = k_words // KC
    return x.reshape(c, 32, KC, d).transpose(0, 2, 1, 3).reshape(ip, d)


def _unpack(p: jnp.ndarray) -> jnp.ndarray:
    """int32 [bu, KC] -> bf16 [bu, IC] in per-tile physical column order."""
    planes = [
        jnp.bitwise_and(jax.lax.shift_right_logical(p, j), 1).astype(
            jnp.bfloat16
        )
        for j in range(32)
    ]
    return jnp.concatenate(planes, axis=1)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pick_block_u(U: int, ip: int, d: int) -> int:
    """Largest row tile under the VMEM budget.  Fixed costs: the xi column
    tile (bf16, 3x buffered) and the [IC, d] f32 output/contribution block.
    Per-row costs: the packed tile (int32, 3x buffered), the unpacked bf16
    temp (x2 for the concat transient), and the xu/top tiles.  Per-program
    cost is independent of the catalog width (the grid tiles columns)."""
    if _FORCE_BLOCK_U is not None and U % _FORCE_BLOCK_U == 0:
        return _FORCE_BLOCK_U
    fixed = 3 * IC * d * 2 + IC * d * 4
    per_row = KC * 4 * 3 + IC * 2 * 2 + d * (2 * 3 + 4)
    budget = _VMEM_BUDGET - fixed
    bu = budget // max(per_row, 1)
    # measured on v5e (tools/probe_bit_elec.py): single-column-tile grids
    # want 1024-row tiles (19456x8192 d=64: 2.0 ms vs 22 ms at 512); multi-
    # tile grids run best at 512 (192512x65536 d=64: 43.5 ms; 1024 blows up
    # the Mosaic compile)
    top = 1024 if ip <= IC else 512
    for cand in (1024, 512, 256, 128, 64, 32, 16, 8):
        if cand <= top and bu >= cand and U % cand == 0:
            return cand
    return 8


def fits_vmem(ip: int, d: int) -> bool:
    fixed = 3 * IC * d * 2 + IC * d * 4
    per_row = KC * 4 * 3 + IC * 2 * 2 + d * (2 * 3 + 4)
    return fixed + 8 * per_row <= _VMEM_BUDGET


# ---------------------------------------------------------------------------
# dual-direction op: (A @ xi, A.T @ xu) — one kernel per direction
# ---------------------------------------------------------------------------


def _dual_call(packed, xu, xi_perm):
    return _mm_call(packed, xi_perm), _mm_t_call(packed, xu)


@jax.custom_vjp
def bit_dual_matmul(packed, xu, xi_perm):
    """(A @ xi_perm, A.T @ xu) over the unpacked physical-order 0/1 matrix.
    ``xi_perm`` and the second output live in PHYSICAL column order."""
    return _dual_call(packed, xu, xi_perm)


def _dual_fwd(packed, xu, xi_perm):
    return _dual_call(packed, xu, xi_perm), packed


def _dual_bwd(packed, cots):
    g_top, g_bot = cots
    # d_xu = A @ g_bot ; d_xi = A.T @ g_top — same kernel, roles swapped
    d_xu, d_xi = _dual_call(packed, g_top, g_bot)
    return np.zeros((), jax.dtypes.float0), d_xu, d_xi


bit_dual_matmul.defvjp(_dual_fwd, _dual_bwd)


def bit_dual_matmul_sharded(packed, xu, xi_perm, mesh):
    """Row-sharded ``bit_dual_matmul`` over the mesh's 'model' axis: each
    device unpacks ITS bit-plane rows (top slice local; the A.T direction's
    partial completes with one psum over ICI).  Same pattern as
    ops/fused_bip.py::fused_bip_matmul_sharded — pallas_calls are opaque to
    GSPMD, so the partition is explicit."""
    from jax.sharding import PartitionSpec as P

    def local(p_l, xu_l, xi_l):
        top_l, bot_l = bit_dual_matmul(p_l, xu_l, xi_l)
        return top_l, jax.lax.psum(bot_l, "model")

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("model", None), P("model", None), P(None, None)),
        out_specs=(P("model", None), P(None, None)),
        check_vma=False,
    )(packed, xu, xi_perm)


def bit_shardable(U: int, mesh) -> bool:
    """Rows split evenly and each shard still tiles (min block_u is 8)."""
    m = int(mesh.shape.get("model", 1)) if mesh is not None else 1
    return m > 1 and U % (m * 8) == 0


# ---------------------------------------------------------------------------
# single-direction kernels (DenseUI-style R lifts)
# ---------------------------------------------------------------------------


def _fwd_kernel(p_ref, xi_ref, top_ref):
    c = pl.program_id(1)
    un = _unpack(p_ref[:])
    contrib = jnp.dot(un, xi_ref[:], preferred_element_type=jnp.float32)

    @pl.when(c == 0)
    def _():
        top_ref[:] = contrib

    @pl.when(c > 0)
    def _():
        top_ref[:] = top_ref[:] + contrib


def _mm_call(packed, xi_perm):
    U, K = packed.shape
    ip = K * 32
    d = xi_perm.shape[1]
    n_c = K // KC
    block_u = _pick_block_u(U, ip, d)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(U // block_u, n_c),
        in_specs=[
            pl.BlockSpec((block_u, KC), lambda r, c: (r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((IC, d), lambda r, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_u, d), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((U, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(packed, xi_perm.astype(jnp.bfloat16))[0]


def _t_kernel(p_ref, xu_ref, bot_ref):
    r = pl.program_id(1)
    un = _unpack(p_ref[:])
    contrib = jax.lax.dot_general(
        un, xu_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(r == 0)
    def _():
        bot_ref[:] = contrib

    @pl.when(r > 0)
    def _():
        bot_ref[:] = bot_ref[:] + contrib


def _mm_t_call(packed, xu):
    U, K = packed.shape
    ip = K * 32
    d = xu.shape[1]
    n_c = K // KC
    block_u = _pick_block_u(U, ip, d)
    return pl.pallas_call(
        _t_kernel,
        grid=(n_c, U // block_u),
        in_specs=[
            pl.BlockSpec((block_u, KC), lambda c, r: (r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_u, d), lambda c, r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((IC, d), lambda c, r: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((ip, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(packed, xu.astype(jnp.bfloat16))[0]


@jax.custom_vjp
def bit_matmul(packed, xi_perm):
    """A @ xi_perm (physical-order operand) -> [U, d]."""
    return _mm_call(packed, xi_perm)


def _mm_fwd(packed, xi_perm):
    return _mm_call(packed, xi_perm), packed


def _mm_bwd(packed, g):
    return np.zeros((), jax.dtypes.float0), _mm_t_call(packed, g)


bit_matmul.defvjp(_mm_fwd, _mm_bwd)


@jax.custom_vjp
def bit_matmul_t(packed, xu):
    """A.T @ xu -> [Ip, d] in physical column order."""
    return _mm_t_call(packed, xu)


def _mmt_fwd(packed, xu):
    return _mm_t_call(packed, xu), packed


def _mmt_bwd(packed, g):
    return np.zeros((), jax.dtypes.float0), _mm_call(packed, g)


bit_matmul_t.defvjp(_mmt_fwd, _mmt_bwd)
