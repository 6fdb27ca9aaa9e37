"""Fused masked-softmax attention: GRCN's dense routing without [U, I]
materialization.

GRCN's dense content routing (`models/grcn.py::_gat_dense`, reference
`/root/reference/src/models/grcn.py:46-76`) is dot-product attention of
users over their interacted items:

    s   = q @ k.T                      # [U, I] scores
    p   = masked_softmax(s, mask)      # mask = edge multiplicity counts
    out = p @ k                        # V == K in every GRCN use

XLA materializes ``s`` and ``p`` in HBM and runs multi-pass elementwise
softmax over them — at baby scale each [U, I] tensor is ~270 MB (bf16), and
the op is purely HBM-bound.  Because the key side (I items, c=64) fits VMEM
whole, a single-pass kernel needs NO online-softmax machinery: each grid
step streams one row tile of ``mask`` from HBM, recomputes its score tile on
the MXU, softmaxes it in VMEM, and matmuls against the resident ``k`` — the
only [U, I]-sized HBM traffic is ONE read of ``mask`` (fwd) and one more in
the backward pass, which recomputes ``p`` per tile instead of saving it.

The multiplicity mask weights numerator and denominator alike and empty
rows produce all-zero outputs — exact parity with
``GRCN._masked_softmax`` / torch-geometric ``softmax`` over empty segments.

Shapes must be tile-padded: U % block_u == 0, I % 128 == 0 (zero mask
columns/rows are inert).  f32 softmax and accumulation; p is fed to the MXU
in bf16 (same rounding XLA's default matmul precision applies).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30

# Enabled per-process before graphs are built (GRCN pads its dense mask at
# build time when on).  Same lifecycle as graph.sparse.set_fused_bip.
_ENABLED = False


def set_fused_attn(enabled: bool) -> None:
    """Must be called before model contexts are built."""
    global _ENABLED
    _ENABLED = bool(enabled)


def fused_attn_enabled() -> bool:
    return _ENABLED


def _softmax_tile(s, m, bounded=False):
    """Row masked-softmax of an f32 score tile with multiplicity mask m.

    ``bounded=True`` skips the max-stabilization (a pure rescale that
    cancels in the ratio): valid whenever scores are bounded well inside
    f32 exp range — GRCN's ``has_norm`` l2-normalizes q/k so |s| <= 1.
    Saves the row max-reduce and two selects per tile on the VPU, the
    measured bottleneck of these kernels (PARITY.md GRCN closure)."""
    if bounded:
        e = m * jnp.exp(s)
    else:
        masked = jnp.where(m > 0, s, _NEG)
        mx = jnp.max(masked, axis=1, keepdims=True)
        mx = jnp.where(mx > _NEG / 2, mx, 0.0)  # empty rows: finite exp
        e = m * jnp.exp(masked - mx)
    den = jnp.sum(e, axis=1, keepdims=True)
    return e / jnp.maximum(den, 1e-16)


def _fwd_kernel(bounded, q_ref, mask_ref, k_any, out_ref, k_vmem, sem):
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _():
        cp = pltpu.make_async_copy(k_any, k_vmem, sem)
        cp.start()
        cp.wait()

    k = k_vmem[:]
    s = jax.lax.dot_general(
        q_ref[:], k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = _softmax_tile(s, mask_ref[:].astype(jnp.float32), bounded)
    out_ref[:] = jnp.dot(
        p.astype(jnp.bfloat16), k, preferred_element_type=jnp.float32
    )


def _bwd_kernel(bounded, q_ref, mask_ref, g_ref, out_ref, k_any,
                dq_ref, dk_any, k_vmem, dk_acc, sems):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        cp = pltpu.make_async_copy(k_any, k_vmem, sems.at[0])
        cp.start()
        cp.wait()

    k = k_vmem[:]
    s = jax.lax.dot_general(
        q_ref[:], k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = _softmax_tile(s, mask_ref[:].astype(jnp.float32), bounded)
    g = g_ref[:].astype(jnp.bfloat16)
    # dp_ij = g_i . k_j ; D_i = g_i . out_i ; ds = p * (dp - D)
    dp = jax.lax.dot_general(
        g, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    D = jnp.sum(g_ref[:] * out_ref[:], axis=1, keepdims=True)
    ds = (p * (dp - D)).astype(jnp.bfloat16)
    dq_ref[:] = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    # dk_j = sum_i ds_ij q_i + p_ij g_i   (accumulated across row tiles)
    contrib = jax.lax.dot_general(
        ds, q_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        p.astype(jnp.bfloat16), g,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(r == 0)
    def _():
        dk_acc[:] = contrib

    @pl.when(r > 0)
    def _():
        dk_acc[:] = dk_acc[:] + contrib

    @pl.when(r == n_r - 1)
    def _():
        cp = pltpu.make_async_copy(dk_acc, dk_any, sems.at[1])
        cp.start()
        cp.wait()


# Mosaic's default scoped-VMEM limit is 16 MiB; the v5e has 128 MiB physical
# VMEM, so (as in ops/grcn_fused.py) the calls request a raised limit and
# size row tiles against a budget with 2x headroom under it.
_VMEM_LIMIT = 96 * 2**20
_VMEM_BUDGET = 48 * 2**20


def _block_u(U: int, I: int, c: int, n_score_bufs: int) -> int:
    """Largest row tile keeping (mask tile 3x-buffered + f32 score temps +
    resident k) under budget."""
    fixed = I * c * 2 * 2 + I * c * 4  # k stage (bf16) + dk acc (f32, bwd)
    per_row = I * 2 * 3 + I * 4 * n_score_bufs + c * 4 * 6
    bu = (_VMEM_BUDGET - fixed) // max(per_row, 1)
    for cand in (256, 128, 64, 32, 16):
        if bu >= cand and U % cand == 0:
            return cand
    return 16


def fits_vmem(I: int, c: int) -> bool:
    fixed = I * c * 2 * 2 + I * c * 4
    per_row = I * 2 * 3 + I * 4 * 3 + c * 4 * 6
    return fixed + 16 * per_row <= _VMEM_BUDGET


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def masked_attention(q, k, mask, bounded=False):
    """softmax(q @ k.T, multiplicity mask) @ k with one HBM pass over mask.

    ``mask`` is a constant (zero cotangent).  Returns f32 [U, c].
    ``bounded=True`` (l2-normalized q/k) skips softmax max-stabilization.
    """
    return _fwd_impl(q, k, mask, bounded)


def _fwd_impl(q, k, mask, bounded):
    U, I = mask.shape
    c = q.shape[1]
    interpret = jax.default_backend() == "cpu"
    q = q.astype(jnp.bfloat16)
    k = k.astype(jnp.bfloat16)
    bu = _block_u(U, I, c, n_score_bufs=2)
    grid = (U // bu,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, bounded),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bu, c), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bu, I), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((bu, c), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((U, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((I, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(q, mask, k)


def _vjp_fwd(q, k, mask, bounded):
    out = _fwd_impl(q, k, mask, bounded)
    return out, (q, k, mask, out)


def _vjp_bwd(bounded, res, g):
    q, k, mask, out = res
    U, I = mask.shape
    c = q.shape[1]
    interpret = jax.default_backend() == "cpu"
    qb = q.astype(jnp.bfloat16)
    kb = k.astype(jnp.bfloat16)
    bu = _block_u(U, I, c, n_score_bufs=3)
    grid = (U // bu,)
    dq, dk = pl.pallas_call(
        functools.partial(_bwd_kernel, bounded),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bu, c), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bu, I), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bu, c), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bu, c), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((bu, c), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((U, c), jnp.float32),
            jax.ShapeDtypeStruct((I, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((I, c), jnp.bfloat16),
            pltpu.VMEM((I, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qb, mask, g.astype(jnp.float32), out, kb)
    if jnp.issubdtype(mask.dtype, jnp.integer):
        import numpy as np

        dmask = np.zeros(mask.shape, jax.dtypes.float0)
    else:
        dmask = jnp.zeros_like(mask)
    return dq.astype(q.dtype), dk.astype(k.dtype), dmask


masked_attention.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Dual-modality variant: ONE mask stream serves both towers
# ---------------------------------------------------------------------------
#
# GRCN routes its two modality towers over the SAME interaction mask; as
# two `masked_attention` calls per routing iteration the int8 mask
# (~139 MB at baby scale) is streamed twice per direction.  The dual
# kernel computes both modalities per row tile (the mask tile is read
# once and both score/softmax/out chains run on it), halving the mask HBM
# traffic and the kernel-launch count of the routing loop.


def _fwd2_kernel(bounded, q1_ref, q2_ref, mask_ref, k1_any, k2_any,
                 out1_ref, out2_ref, k1_v, k2_v, sems):
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _():
        cp = pltpu.make_async_copy(k1_any, k1_v, sems.at[0])
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(k2_any, k2_v, sems.at[1])
        cp.start()
        cp.wait()

    m = mask_ref[:].astype(jnp.float32)
    for q_ref, k_v, out_ref in ((q1_ref, k1_v, out1_ref),
                                (q2_ref, k2_v, out2_ref)):
        k = k_v[:]
        s = jax.lax.dot_general(
            q_ref[:], k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = _softmax_tile(s, m, bounded)
        out_ref[:] = jnp.dot(
            p.astype(jnp.bfloat16), k, preferred_element_type=jnp.float32
        )


def _bwd2_kernel(bounded, q1_ref, q2_ref, mask_ref, g1_ref, g2_ref,
                 out1_ref, out2_ref, k1_any, k2_any,
                 dq1_ref, dq2_ref, dk1_any, dk2_any,
                 k1_v, k2_v, dk1_acc, dk2_acc, sems):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        cp = pltpu.make_async_copy(k1_any, k1_v, sems.at[0])
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(k2_any, k2_v, sems.at[1])
        cp.start()
        cp.wait()

    m = mask_ref[:].astype(jnp.float32)

    def modality(q_ref, g_ref, out_ref, k_v, dq_ref, dk_acc):
        k = k_v[:]
        s = jax.lax.dot_general(
            q_ref[:], k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = _softmax_tile(s, m, bounded)
        g = g_ref[:].astype(jnp.bfloat16)
        dp = jax.lax.dot_general(
            g, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        D = jnp.sum(g_ref[:] * out_ref[:], axis=1, keepdims=True)
        ds = (p * (dp - D)).astype(jnp.bfloat16)
        dq_ref[:] = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        contrib = jax.lax.dot_general(
            ds, q_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            p.astype(jnp.bfloat16), g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(r == 0)
        def _():
            dk_acc[:] = contrib

        @pl.when(r > 0)
        def _():
            dk_acc[:] = dk_acc[:] + contrib

    modality(q1_ref, g1_ref, out1_ref, k1_v, dq1_ref, dk1_acc)
    modality(q2_ref, g2_ref, out2_ref, k2_v, dq2_ref, dk2_acc)

    @pl.when(r == n_r - 1)
    def _():
        cp = pltpu.make_async_copy(dk1_acc, dk1_any, sems.at[2])
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(dk2_acc, dk2_any, sems.at[3])
        cp.start()
        cp.wait()


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def masked_attention2(q1, k1, q2, k2, mask, bounded=False):
    """Two `masked_attention`s over one shared mask stream:
    ``(softmax(q1 k1ᵀ, mask) k1, softmax(q2 k2ᵀ, mask) k2)``."""
    return _fwd2_impl(q1, k1, q2, k2, mask, bounded)


def _fwd2_impl(q1, k1, q2, k2, mask, bounded):
    U, I = mask.shape
    c = q1.shape[1]
    interpret = jax.default_backend() == "cpu"
    q1 = q1.astype(jnp.bfloat16)
    q2 = q2.astype(jnp.bfloat16)
    k1 = k1.astype(jnp.bfloat16)
    k2 = k2.astype(jnp.bfloat16)
    bu = _block_u(U, I, 2 * c, n_score_bufs=4)
    qspec = pl.BlockSpec((bu, c), lambda r: (r, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd2_kernel, bounded),
        grid=(U // bu,),
        in_specs=[
            qspec,
            qspec,
            pl.BlockSpec((bu, I), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[qspec, qspec],
        out_shape=[
            jax.ShapeDtypeStruct((U, c), jnp.float32),
            jax.ShapeDtypeStruct((U, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((I, c), jnp.bfloat16),
            pltpu.VMEM((I, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(q1, q2, mask, k1, k2)


def _vjp2_fwd(q1, k1, q2, k2, mask, bounded):
    out1, out2 = _fwd2_impl(q1, k1, q2, k2, mask, bounded)
    return (out1, out2), (q1, k1, q2, k2, mask, out1, out2)


def _vjp2_bwd(bounded, res, cots):
    q1, k1, q2, k2, mask, out1, out2 = res
    g1, g2 = cots
    U, I = mask.shape
    c = q1.shape[1]
    interpret = jax.default_backend() == "cpu"
    q1b = q1.astype(jnp.bfloat16)
    q2b = q2.astype(jnp.bfloat16)
    k1b = k1.astype(jnp.bfloat16)
    k2b = k2.astype(jnp.bfloat16)
    bu = _block_u(U, I, 2 * c, n_score_bufs=6)
    qspec = pl.BlockSpec((bu, c), lambda r: (r, 0), memory_space=pltpu.VMEM)
    dq1, dq2, dk1, dk2 = pl.pallas_call(
        functools.partial(_bwd2_kernel, bounded),
        grid=(U // bu,),
        in_specs=[
            qspec,
            qspec,
            pl.BlockSpec((bu, I), lambda r: (r, 0), memory_space=pltpu.VMEM),
            qspec,
            qspec,
            qspec,
            qspec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            qspec,
            qspec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((U, c), jnp.float32),
            jax.ShapeDtypeStruct((U, c), jnp.float32),
            jax.ShapeDtypeStruct((I, c), jnp.float32),
            jax.ShapeDtypeStruct((I, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((I, c), jnp.bfloat16),
            pltpu.VMEM((I, c), jnp.bfloat16),
            pltpu.VMEM((I, c), jnp.float32),
            pltpu.VMEM((I, c), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(q1b, q2b, mask, g1.astype(jnp.float32), g2.astype(jnp.float32),
      out1, out2, k1b, k2b)
    if jnp.issubdtype(mask.dtype, jnp.integer):
        import numpy as np

        dmask = np.zeros(mask.shape, jax.dtypes.float0)
    else:
        dmask = jnp.zeros_like(mask)
    return (dq1.astype(q1.dtype), dk1.astype(k1.dtype),
            dq2.astype(q2.dtype), dk2.astype(k2.dtype), dmask)


masked_attention2.defvjp(_vjp2_fwd, _vjp2_bwd)


def masked_attention2_auto(q1, k1, q2, k2, mask, bounded=False):
    """`masked_attention2` with the same active-mesh row sharding rule as
    `masked_attention_auto`."""
    from recommendar_systems_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    m = int(mesh.shape.get("model", 1)) if mesh is not None else 1
    U = int(mask.shape[0])
    if mesh is None or m <= 1 or U % (m * 8) != 0:
        return masked_attention2(q1, k1, q2, k2, mask, bounded)
    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        lambda q1_, k1_, q2_, k2_, m_: masked_attention2(
            q1_, k1_, q2_, k2_, m_, bounded),
        mesh=mesh,
        in_specs=(P("model", None), P(None, None), P("model", None),
                  P(None, None), P("model", None)),
        out_specs=(P("model", None), P("model", None)),
        check_vma=False,
    )(q1, k1, q2, k2, mask)


def masked_attention_auto(q, k, mask, bounded=False):
    """``masked_attention`` that row-shards itself over the active mesh's
    'model' axis (q and mask rows split; k replicated; d_k completed by
    shard_map's transpose psum).  Falls back to the single-device kernel
    when no mesh is active or the rows don't split evenly."""
    from recommendar_systems_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    m = int(mesh.shape.get("model", 1)) if mesh is not None else 1
    U = int(mask.shape[0])
    if mesh is None or m <= 1 or U % (m * 8) != 0:
        return masked_attention(q, k, mask, bounded)
    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        # positional: custom_vjp functions reject keyword arguments
        lambda q_, k_, m_: masked_attention(q_, k_, m_, bounded),
        mesh=mesh,
        in_specs=(P("model", None), P(None, None), P("model", None)),
        out_specs=P("model", None),
        check_vma=False,
    )(q, k, mask)
