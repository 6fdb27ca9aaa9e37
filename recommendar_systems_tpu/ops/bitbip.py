"""Bit-packed 0/1 adjacency matmuls: 1 bit per edge slot, unpacked on-VPU.

The factored dense adjacency (graph/sparse.py::DenseBip) stores the u-i
interaction COUNT matrix as int8 and the propagation matmuls stream it from
HBM at ~94% of peak — storage bytes ARE the step time (see PARITY.md
roofline).  Deduplicated interaction data (the reference's 5-core `.inter`
files and this repo's synthetic generator) has 0/1 counts, so the matrix
packs losslessly to ONE bit per entry: 8x fewer A bytes than int8, and the
fused dual-direction kernel reads A once for both ``A @ xi`` and
``A.T @ xu`` — 16x fewer A bytes than two int8 matmuls.  The same packing
extends the dense MXU path to elec-scale catalogs (63k items) where f32/int8
dense blocks no longer fit HBM comfortably.

Bit-plane layout (chosen so the in-kernel unpack is pure shift/and + lane
concatenation — NO cross-lane interleave): packed word ``P[u, k]`` (int32)
holds 32 columns; PHYSICAL column ``p = j*K + k`` is bit ``j`` of word ``k``,
i.e. ``unpacked = concat_j((P >> j) & 1)``.  Physical p maps to logical
column ``c = (p % K) * 32 + p // K``, so operands/results permute with a
reshape-transpose (no gather):

    xi_perm = xi.reshape(K, 32, d).transpose(1, 0, 2).reshape(Ip, d)

Column padding must make K = Ip/32 a multiple of 128 (int32 lane tiling),
i.e. Ip % 4096 == 0; zero rows/columns are numerically inert.

Gradients: the packed matrix is a frozen graph constant (integer leaf, zero
cotangent); the operand VJPs reuse the same kernels with roles swapped, so
backward also reads A once per pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 96 * 2**20
_VMEM_BUDGET = 64 * 2**20

# ---------------------------------------------------------------------------
# packing / permutation helpers
# ---------------------------------------------------------------------------


def pad_cols(n_cols: int) -> int:
    """Columns padded so K = Ip/32 is a multiple of 128 lanes."""
    return -(-n_cols // 4096) * 4096


def pack_bits(m01: np.ndarray) -> np.ndarray:
    """[U, Ip] 0/1 -> int32 [U, Ip/32] bit planes (host-side, at build)."""
    u, ip = m01.shape
    assert ip % 32 == 0, ip
    w = m01.astype(np.uint32).reshape(u, ip // 32, 32)
    shifts = np.arange(32, dtype=np.uint32)
    return (
        (w << shifts[None, None, :]).sum(axis=2, dtype=np.uint32).view(np.int32)
    )


def perm_cols(x: jnp.ndarray, k_words: int) -> jnp.ndarray:
    """Logical [Ip, d] operand -> physical bit-plane row order."""
    ip, d = x.shape
    return x.reshape(k_words, 32, d).transpose(1, 0, 2).reshape(ip, d)


def unperm_cols(x: jnp.ndarray, k_words: int) -> jnp.ndarray:
    ip, d = x.shape
    return x.reshape(32, k_words, d).transpose(1, 0, 2).reshape(ip, d)


def _unpack(p: jnp.ndarray) -> jnp.ndarray:
    """int32 [bu, K] -> bf16 [bu, 32K] in physical column order."""
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
    """Largest row tile under the VMEM budget: P tile (int32, 3x buffered),
    the unpacked bf16 temp, xu/top tiles, plus the fixed xi + accumulator."""
    fixed = ip * d * (2 + 4)
    per_row = (ip // 8) * 3 + ip * 2 + d * (2 * 3 + 4 * 3)
    budget = _VMEM_BUDGET - fixed
    bu = budget // max(per_row, 1)
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if bu >= cand and U % cand == 0:
            return cand
    return 8


def fits_vmem(ip: int, d: int) -> bool:
    fixed = ip * d * (2 + 4)
    per_row = (ip // 8) * 3 + ip * 2 + d * (2 * 3 + 4 * 3)
    return fixed + 8 * per_row <= _VMEM_BUDGET


# ---------------------------------------------------------------------------
# dual-direction kernel: (A @ xi, A.T @ xu) in one HBM pass over the bits
# ---------------------------------------------------------------------------


def _dual_kernel(p_ref, xu_ref, xi_any, top_ref, bot_any, xi_vmem, bot_acc,
                 sems):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        cp = pltpu.make_async_copy(xi_any, xi_vmem, sems.at[0])
        cp.start()
        cp.wait()

    un = _unpack(p_ref[:])  # [bu, Ip] physical order
    top_ref[:] = jnp.dot(un, xi_vmem[:], preferred_element_type=jnp.float32)
    contrib = jax.lax.dot_general(
        un, xu_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(r == 0)
    def _():
        bot_acc[:] = contrib

    @pl.when(r > 0)
    def _():
        bot_acc[:] = bot_acc[:] + contrib

    @pl.when(r == n_r - 1)
    def _():
        cp = pltpu.make_async_copy(bot_acc, bot_any, sems.at[1])
        cp.start()
        cp.wait()


def _dual_call(packed, xu, xi_perm):
    U, K = packed.shape
    ip = K * 32
    d = xu.shape[1]
    block_u = _pick_block_u(U, ip, d)
    return pl.pallas_call(
        _dual_kernel,
        grid=(U // block_u,),
        in_specs=[
            pl.BlockSpec((block_u, K), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_u, d), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((block_u, d), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((U, d), jnp.float32),
            jax.ShapeDtypeStruct((ip, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ip, d), jnp.bfloat16),
            pltpu.VMEM((ip, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(packed, xu.astype(jnp.bfloat16), xi_perm.astype(jnp.bfloat16))


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


# ---------------------------------------------------------------------------
# single-direction kernels (DenseUI-style R lifts)
# ---------------------------------------------------------------------------


def _fwd_kernel(p_ref, xi_any, top_ref, xi_vmem, sems):
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _():
        cp = pltpu.make_async_copy(xi_any, xi_vmem, sems.at[0])
        cp.start()
        cp.wait()

    un = _unpack(p_ref[:])
    top_ref[:] = jnp.dot(un, xi_vmem[:], preferred_element_type=jnp.float32)


def _mm_call(packed, xi_perm):
    U, K = packed.shape
    ip = K * 32
    d = xi_perm.shape[1]
    block_u = _pick_block_u(U, ip, d)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(U // block_u,),
        in_specs=[
            pl.BlockSpec((block_u, K), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((block_u, d), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((U, d), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((ip, d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=_interpret(),
    )(packed, xi_perm.astype(jnp.bfloat16))[0]


def _t_kernel(p_ref, xu_ref, bot_any, bot_acc, sems):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)
    un = _unpack(p_ref[:])
    contrib = jax.lax.dot_general(
        un, xu_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(r == 0)
    def _():
        bot_acc[:] = contrib

    @pl.when(r > 0)
    def _():
        bot_acc[:] = bot_acc[:] + contrib

    @pl.when(r == n_r - 1)
    def _():
        cp = pltpu.make_async_copy(bot_acc, bot_any, sems.at[0])
        cp.start()
        cp.wait()


def _mm_t_call(packed, xu):
    U, K = packed.shape
    ip = K * 32
    d = xu.shape[1]
    block_u = _pick_block_u(U, ip, d)
    return pl.pallas_call(
        _t_kernel,
        grid=(U // block_u,),
        in_specs=[
            pl.BlockSpec((block_u, K), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_u, d), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((ip, d), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((ip, d), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
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
