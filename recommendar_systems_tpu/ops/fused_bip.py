"""Fused bidirectional bipartite propagation: one pass over A for both
``A @ xi`` and ``A.T @ xu``.

Every LightGCN-style layer over the symmetric normalized bipartite adjacency
(reference `lightgcn.py:117-130`; here `graph/sparse.py::spmm_densebip`)
computes BOTH directions:

    top = A  @ xi        # users  <- items      A: [U, I]
    bot = A.T @ xu       # items  <- users

XLA emits two separate matmuls, each streaming the full dense A block from
HBM — and the profiler shows those reads at ~94% of HBM peak, i.e. the op is
bandwidth-bound, not MXU-bound.  This Pallas kernel streams each A tile from
HBM ONCE and feeds it to the MXU twice (A·xi and Aᵀ·xu), halving the HBM
traffic of the dominant per-step cost.

Kernel layout (per grid step r over row tiles of A):
    top[r]  = A[r, :] @ xi            one MXU call, xi resident in VMEM
    bot_acc += A[r, :].T @ xu[r]      VMEM f32 accumulator across grid steps

The backward pass has the same structure with the roles swapped:
    d_xi = A.T @ g_top,  d_xu = A @ g_bot  ==  fused(A, g_bot, g_top) swapped
so the custom VJP reuses the kernel (one A pass in bwd too).

Shapes must be tile-padded: U % block_u == 0, I % 128 == 0, d % 128 == 0
(zero padding; builders in graph/build.py store padded blocks, models pad
the operand columns).  f32 accumulation; A may be f32 or bf16 storage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, xu_ref, xi_any, top_ref, bot_any, xi_vmem, bot_acc, sems):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)

    # stage xi into VMEM once (it is grid-invariant); blocked in_specs would
    # keep a multi-buffered copy alive for the whole call
    @pl.when(r == 0)
    def _():
        cp = pltpu.make_async_copy(xi_any, xi_vmem, sems.at[0])
        cp.start()
        cp.wait()

    # [BU, I]; int8 count tiles (factored adjacency) convert to bf16 on the
    # VPU — the whole point of int8 storage is halved HBM traffic, so the
    # cast must happen per-tile in VMEM, not hoisted to a full HBM copy
    a = a_ref[:].astype(jnp.bfloat16)
    # users <- items: straight matmul into this row tile of `top`
    top_ref[:] = jnp.dot(a, xi_vmem[:], preferred_element_type=jnp.float32)

    # items <- users: accumulate A[r].T @ xu[r] across row tiles
    contrib = jax.lax.dot_general(
        a,
        xu_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),  # contract over BU rows
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


def _fused_fwd_call(a: jnp.ndarray, xu: jnp.ndarray, xi: jnp.ndarray,
                    block_u: int, interpret: bool):
    U, I = a.shape
    d = xu.shape[1]
    grid = (U // block_u,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_u, I), lambda r: (r, 0),
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
            jax.ShapeDtypeStruct((I, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((I, d), jnp.bfloat16),
            pltpu.VMEM((I, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(a, xu, xi)


_VMEM_BUDGET = 14 * 2**20  # leave headroom under the 16 MB scoped limit


def _vmem_fixed(I: int, d: int) -> int:
    """VMEM bytes independent of the row tile: the xi stage (bf16) and the
    bot accumulator (f32), both single-buffered scratch."""
    return I * d * 2 + I * d * 4


def _pick_block_u(U: int, I: int, d: int, a_itemsize: int = 2) -> int:
    """Largest row tile that keeps the worst-case buffered footprint (A tile
    + xu/top tiles, each up to 3x-buffered, + one bf16 convert temp for int8
    tiles) under the budget."""
    budget = _VMEM_BUDGET - _vmem_fixed(I, d)
    a_row = I * a_itemsize * 3 + (I * 2 if a_itemsize == 1 else 0)
    per_row = a_row + d * 2 * 3 + d * 4 * 3  # + xu (bf16) + top (f32)
    bu = budget // max(per_row, 1)
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if bu >= cand and U % cand == 0:
            return cand
    return 8


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_bip_matmul(a, xu, xi):
    """(A @ xi, A.T @ xu) with one HBM pass over A.  `a` is treated as a
    constant (zero cotangent); shapes must be tile-aligned (see module doc).
    """
    return _fused_bip_impl(a, xu, xi)


def _fused_bip_impl(a, xu, xi):
    U, I = a.shape
    d = xu.shape[1]
    interpret = jax.default_backend() == "cpu"
    # bf16 operands mirror XLA's DEFAULT matmul precision on TPU (f32 matmul
    # operands are rounded to bf16 on the MXU anyway); accumulation is f32.
    # int8 count matrices (factored adjacency) stay int8 in HBM and convert
    # per tile inside the kernel.
    if a.dtype != jnp.int8:
        a = a.astype(jnp.bfloat16)
    xu = xu.astype(jnp.bfloat16)
    xi = xi.astype(jnp.bfloat16)
    block_u = _pick_block_u(U, I, d, a.dtype.itemsize)
    top, bot = _fused_fwd_call(a, xu, xi, block_u, interpret)
    return top, bot


def _fwd(a, xu, xi):
    return _fused_bip_impl(a, xu, xi), a


def _bwd(a, cotangents):
    g_top, g_bot = cotangents
    # d_xu = A @ g_bot ; d_xi = A.T @ g_top — same fused pass, roles swapped
    d_xu, d_xi = _fused_bip_impl(a, g_top, g_bot)
    # adjacency is a frozen graph constant; its (unused) cotangent is DCE'd
    return jnp.zeros_like(a), d_xu, d_xi


fused_bip_matmul.defvjp(_fwd, _bwd)


def fused_bip_matmul_sharded(a, xu, xi, mesh):
    """Row-sharded ``fused_bip_matmul`` over the mesh's 'model' axis.

    A pallas_call is opaque to GSPMD (sharded operands would be all-gathered
    at the kernel boundary), so the row partition is made explicit: each
    device streams ITS rows of A once, computing its slice of ``top`` and a
    partial ``bot`` that one psum over ICI completes.  Gradients ride
    shard_map's transpose rules (d_xi gathers the same psum)."""
    from jax.sharding import PartitionSpec as P

    def local(a_l, xu_l, xi_l):
        top_l, bot_l = fused_bip_matmul(a_l, xu_l, xi_l)
        return top_l, jax.lax.psum(bot_l, "model")

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("model", None), P("model", None), P(None, None)),
        out_specs=(P("model", None), P(None, None)),
        check_vma=False,
    )(a, xu, xi)


def shardable(U: int, mesh) -> bool:
    """Rows split evenly and each shard still tiles (min block_u is 8)."""
    m = int(mesh.shape.get("model", 1)) if mesh is not None else 1
    return m > 1 and U % (m * 8) == 0


def fits_vmem(n_items_padded: int, d: int) -> bool:
    """True when the fixed [I, d] buffers plus a minimal row tile fit the
    VMEM budget (same model as ``_pick_block_u``)."""
    per_row = n_items_padded * 2 * 3 + d * 2 * 3 + d * 4 * 3
    return _vmem_fixed(n_items_padded, d) + 8 * per_row <= _VMEM_BUDGET
