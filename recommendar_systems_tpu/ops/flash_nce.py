"""Flash-style row logsumexp for full-matrix InfoNCE.

MENTOR's SimGCL noise-view loss (reference `/root/reference/src/models/
mentor.py:441-446`) and friends take InfoNCE over ENTIRE embedding tables:
``loss_i = lse_i - pos_i`` with ``lse_i = logsumexp_j(v1_i . v2_j / T)``.
Under plain autodiff XLA saves the [N, N] logit matrix as a residual
(1.5 GB at baby scale, read+written every step — the dominant MENTOR cost).

``row_lse(q, k)`` computes the row logsumexp of ``q @ k.T`` without
materializing anything [N, N]-shaped in HBM: ``k`` sits resident in VMEM
(bf16), a grid walks row tiles of ``q``, and the [bu, N] score tile lives
only in VMEM.  The custom VJP recomputes flash-style:

    p_ij = exp(s_ij - lse_i);  dq_i = (g_i * p_i:) @ k;  dk += (g * p).T @ q

Temperature and cosine normalization stay OUTSIDE (pass ``q / T``); their
gradients flow through the wrapper's jnp ops.  Shapes: q [M, d], k [N, d]
with d <= 512; M, N padded internally to tile multiples (padding rows of k
are masked out of every denominator).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 96 * 2**20
_VMEM_BUDGET = 72 * 2**20
_NEG = -1e30


def _stage(src, dst, sem):
    cp = pltpu.make_async_copy(src, dst, sem)
    cp.start()
    cp.wait()


def _fwd_kernel(n_valid, q_ref, kt_any, lse_ref, kt_v, sems):
    # all matmuls layout-natural: k arrives pre-transposed [d, N] so the
    # MXU never sees a Mosaic-side transpose of an [*, N] tile
    @pl.when(pl.program_id(0) == 0)
    def _():
        _stage(kt_any, kt_v, sems.at[0])

    s = jnp.dot(q_ref[:], kt_v[:], preferred_element_type=jnp.float32)
    n = s.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, _NEG) if n_valid != n else s
    mx = jnp.max(s, axis=1, keepdims=True)
    lse = mx + jnp.log(jnp.sum(jnp.exp(s - mx), axis=1, keepdims=True))
    lse_ref[:] = jnp.broadcast_to(lse, lse_ref.shape)


def _bwd_kernel(n_valid, q_ref, g_ref, lse_ref, k_any, kt_any,
                dq_ref, dkt_any, k_v, kt_v, dkt_acc, sems):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        _stage(k_any, k_v, sems.at[0])
        _stage(kt_any, kt_v, sems.at[1])

    s = jnp.dot(q_ref[:], kt_v[:], preferred_element_type=jnp.float32)
    n = s.shape[1]
    if n_valid != n:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, _NEG)
    gp = (g_ref[:, 0:1] * jnp.exp(s - lse_ref[:, 0:1])).astype(jnp.bfloat16)
    # dq = gp @ k: contract gp dim1 x k dim0 — natural
    dq_ref[:] = jnp.dot(gp, k_v[:], preferred_element_type=jnp.float32)
    # dkT += q.T @ gp: only the TINY [bu, d] q tile gets transposed
    dkt_c = jax.lax.dot_general(
        q_ref[:], gp, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(r == 0)
    def _():
        dkt_acc[:] = dkt_c

    @pl.when(r > 0)
    def _():
        dkt_acc[:] = dkt_acc[:] + dkt_c

    @pl.when(r == n_r - 1)
    def _():
        _stage(dkt_acc, dkt_any, sems.at[2])


def _pad_rows(x, mult):
    m = x.shape[0]
    mp = -(-m // mult) * mult
    return (jnp.pad(x, ((0, mp - m), (0, 0))) if mp != m else x), m


def _block_m(M, N, d, n_bufs):
    per_row = N * 4 * n_bufs + d * 4 * 8 + 128 * 4 * 4
    fixed = N * d * 2 * 2 + N * d * 4  # k + kT bf16, dkT f32 accumulator
    bu = (_VMEM_BUDGET - fixed) // max(per_row, 1)
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if bu >= cand and M % cand == 0:
            return cand
    return 8


def fits_vmem(N: int, d: int) -> bool:
    np_ = -(-N // 128) * 128
    fixed = np_ * d * 2 * 2 + np_ * d * 4
    return fixed + 8 * (np_ * 4 * 4 + d * 4 * 8) <= _VMEM_BUDGET and d <= 512


@jax.custom_vjp
def row_lse(q, k):
    """[M] f32 row logsumexp of ``q @ k.T`` (no [M, N] HBM residual)."""
    return _fwd_impl(q, k)[0]


def _fwd_impl(q, k):
    interpret = jax.default_backend() == "cpu"
    qp, M = _pad_rows(q.astype(jnp.bfloat16), 256)
    kp, N = _pad_rows(k.astype(jnp.bfloat16), 128)
    Mp, d = qp.shape
    kt = kp.T  # one XLA transpose per call, outside the grid
    bu = _block_m(Mp, kp.shape[0], d, n_bufs=3)
    lse = pl.pallas_call(
        functools.partial(_fwd_kernel, N),
        grid=(Mp // bu,),
        in_specs=[
            pl.BlockSpec((bu, d), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((bu, 128), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(kt.shape, jnp.bfloat16),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qp, kt)
    return lse[:M, 0], (q, k)


def _vjp_fwd(q, k):
    lse, _ = _fwd_impl(q, k)
    return lse, (q, k, lse)


def _vjp_bwd(res, g):
    q, k, lse = res
    interpret = jax.default_backend() == "cpu"
    qp, M = _pad_rows(q.astype(jnp.bfloat16), 256)
    kp, N = _pad_rows(k.astype(jnp.bfloat16), 128)
    Mp, d = qp.shape
    kt = kp.T
    # padded q rows have lse 0 and g 0 -> zero contribution
    gp = jnp.zeros((Mp, 128), jnp.float32).at[:M, 0].set(g)
    lsep = jnp.zeros((Mp, 128), jnp.float32).at[:M, 0].set(lse)
    bu = _block_m(Mp, kp.shape[0], d, n_bufs=4)
    spec = pl.BlockSpec((bu, d), lambda r: (r, 0), memory_space=pltpu.VMEM)
    v128 = pl.BlockSpec((bu, 128), lambda r: (r, 0), memory_space=pltpu.VMEM)
    dq, dkt = pl.pallas_call(
        functools.partial(_bwd_kernel, N),
        grid=(Mp // bu,),
        in_specs=[spec, v128, v128,
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[spec, pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, d), jnp.float32),
            jax.ShapeDtypeStruct(kt.shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(kp.shape, jnp.bfloat16),
            pltpu.VMEM(kt.shape, jnp.bfloat16),
            pltpu.VMEM(kt.shape, jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qp, gp, lsep, kp, kt)
    return dq[:M].astype(q.dtype), dkt.T[:N].astype(k.dtype)


row_lse.defvjp(_vjp_fwd, _vjp_bwd)
