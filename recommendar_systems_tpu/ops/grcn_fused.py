"""Fused GRCN dense EGCN: dual-modality, dual-direction gated attention.

GRCN's dense step (`models/grcn.py::representation`, reference
`/root/reference/src/models/grcn.py:80-109, 265-285`) consumes the score
matrix ``s_m = pref_m @ feat_m.T`` of each modality FOUR ways:

    pu_m = row_softmax(s_m, mask)                  # users attend items
    pi_m = col_softmax(s_m, mask)                  # items attend users
    ou_m = pu_m @ feat_m                           # tower final conv (u)
    oi_m = pi_m.T @ pref_m                         # tower final conv (i)
    wu   = relu(max_m(pu_m * ci_m[None, :]))       # confidence routing
    wi   = relu(max_m(pi_m * cu_m[:, None]))
    hu   = wu @ zi                                 # EGCN hop (users)
    hi   = wi.T @ zu                               # EGCN hop (items)

XLA materializes every [U, I] intermediate in HBM (~270 MB each at baby
scale) and the step is purely HBM-bound.  The key fact this kernel exploits:
the item-side attention uses the SAME score matrix transposed, so a single
grid over user-row tiles serves both directions — the row softmax is
self-contained per tile, and the column softmax uses column max/denominator
statistics precomputed by one online pass (``dual_colstats``).  All
cross-tile accumulators live on the small item axis ([I, c] / [I, d] f32 in
VMEM), so nothing [U, I]-sized ever touches HBM except the reads of ``mask``
itself: 2 passes forward (stats + compute; the hop-2 call reuses the saved
stats for 1 more), 3 passes backward (D-vector pre-pass + one per modality).

Gradient notes (custom VJP, recompute-everything flash style):
  - the column stats are a redundant parametrization of the softmax: the
    backward implements the full analytic softmax Jacobian through q/k, and
    the stats input gets zero cotangent (standard flash-attention residual
    treatment).
  - col-softmax backward needs the full-column reduction
    ``D_m[i] = sum_u pi_m * dpi_m`` — unavailable per row tile, hence the
    dedicated pre-pass.
  - the gate ``relu(max(g1, g2))`` routes ``dw`` to the winning modality
    (ties -> modality 1; masked-out entries have p = 0 so the gate is
    inactive there and no gradient leaks — matching ``jax.nn.relu``'s zero
    subgradient at 0).
  - ``dci_m[i] = sum_u (dwu * sel_m * pu_m)`` accumulates on the item axis;
    ``dcu_m[u] = sum_i (dwi * sel_m * pi_m)`` is row-owned.

Layout conventions: everything is stored [U, I]-shaped (the item-side
quantities are the transposes); per-user confidences and ``zu`` stream
together as [U, 128] tiles (cols 0/1 = confidences, 2:2+d = zu); per-item
confidences sit resident as [8, I] f32 rows 0/1; the column stats pack as
[8, I] f32 rows (0 = cmax_1, 1 = cden_1, 2 = cmax_2, 3 = cden_2).  Shapes
must be tile-padded: U % block_u == 0, I % 128 == 0 (zero mask rows /
columns are inert).  ``mask`` holds int8 edge-multiplicity counts (bf16
also accepted); softmax and accumulation are f32; the MXU sees bf16
operands (the rounding XLA's default matmul precision applies anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
# Mosaic's default scoped-VMEM limit is 16 MiB, far below the v5e's 128 MiB
# physical VMEM; these kernels keep the item-axis accumulators resident and
# carry several [bu, I] f32 stack temporaries, so they ask for a raised limit
# and size row blocks against a budget that leaves 2x headroom under it.
_VMEM_LIMIT = 96 * 2**20
_VMEM_BUDGET = 48 * 2**20


def _mask_zero_cotangent(mask):
    if jnp.issubdtype(mask.dtype, jnp.integer):
        return np.zeros(mask.shape, jax.dtypes.float0)
    return jnp.zeros_like(mask)


def _scores(q_ref, k):
    return jax.lax.dot_general(
        q_ref[:], k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _row_softmax(s, m):
    masked = jnp.where(m > 0, s, _NEG)
    mx = jnp.max(masked, axis=1, keepdims=True)
    mx = jnp.where(mx > _NEG / 2, mx, 0.0)
    e = m * jnp.exp(masked - mx)
    den = jnp.sum(e, axis=1, keepdims=True)
    return e / jnp.maximum(den, 1e-16)


def _col_softmax(s, m, cmx, cden):
    """Column softmax from precomputed stats; cmx/cden are [1, I]."""
    mx = jnp.where(cmx > _NEG / 2, cmx, 0.0)
    e = m * jnp.where(m > 0, jnp.exp(s - mx), 0.0)
    return e / jnp.maximum(cden, 1e-16)


def _stage(rsrc, rdst, sem):
    cp = pltpu.make_async_copy(rsrc, rdst, sem)
    cp.start()
    cp.wait()


def _relu_max(g1, g2):
    w = jnp.maximum(g1, g2)
    return jnp.where(w > 0, w, 0.0)


# ---------------------------------------------------------------------------
# Column statistics (online, one mask pass)
# ---------------------------------------------------------------------------


def _stats_kernel(q1_ref, q2_ref, mask_ref, k1_any, k2_any, stats_ref,
                  k1_v, k2_v, mx1, den1, mx2, den2, pack, sems):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        _stage(k1_any, k1_v, sems.at[0])
        _stage(k2_any, k2_v, sems.at[1])
        mx1[:] = jnp.full_like(mx1[:], _NEG)
        den1[:] = jnp.zeros_like(den1[:])
        mx2[:] = jnp.full_like(mx2[:], _NEG)
        den2[:] = jnp.zeros_like(den2[:])

    m = mask_ref[:].astype(jnp.float32)

    def _update(s, mx, den):
        masked = jnp.where(m > 0, s, _NEG)
        tm = jnp.max(masked, axis=0, keepdims=True)
        old = mx[:]
        new = jnp.maximum(old, tm)
        e = m * jnp.where(m > 0, jnp.exp(masked - new), 0.0)
        den[:] = den[:] * jnp.exp(old - new) + jnp.sum(e, axis=0,
                                                       keepdims=True)
        mx[:] = new

    _update(_scores(q1_ref, k1_v[:]), mx1, den1)
    _update(_scores(q2_ref, k2_v[:]), mx2, den2)

    # HBM memrefs tile dim 0 by 8 — a (1, I) row DMA is illegal, so the
    # row vectors are packed into one (8, I) VMEM tile and copied whole
    @pl.when(r == n_r - 1)
    def _():
        pack[:] = jnp.concatenate(
            [mx1[:], den1[:], mx2[:], den2[:],
             mx1[:], den1[:], mx2[:], den2[:]], axis=0
        )
        _stage(pack, stats_ref, sems.at[2])


@jax.custom_vjp
def dual_colstats(q1, k1, q2, k2, mask):
    """[8, I] f32 column max/denominator rows for both modalities
    (rows 4-7 repeat 0-3 so the pack stays fully initialized).

    Non-differentiable by construction (zero cotangents): the stats are a
    redundant parametrization of the column softmax and ``gated_dual_hop``'s
    VJP implements the full softmax Jacobian itself.
    """
    return _colstats_impl(q1, k1, q2, k2, mask)


def _colstats_vjp_fwd(q1, k1, q2, k2, mask):
    return _colstats_impl(q1, k1, q2, k2, mask), (q1, k1, q2, k2, mask)


def _colstats_vjp_bwd(res, g):
    q1, k1, q2, k2, mask = res
    return (jnp.zeros_like(q1), jnp.zeros_like(k1), jnp.zeros_like(q2),
            jnp.zeros_like(k2), _mask_zero_cotangent(mask))


dual_colstats.defvjp(_colstats_vjp_fwd, _colstats_vjp_bwd)


def _colstats_impl(q1, k1, q2, k2, mask):
    U, I = mask.shape
    c = q1.shape[1]
    interpret = jax.default_backend() == "cpu"
    bu = _pick_block(U, I, n_f32=3, fixed=I * c * 2 * 2 + I * 4 * 4,
                     mask_itemsize=mask.dtype.itemsize)
    qspec = pl.BlockSpec((bu, c), lambda r: (r, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _stats_kernel,
        grid=(U // bu,),
        in_specs=[
            qspec,
            qspec,
            pl.BlockSpec((bu, I), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((8, I), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((I, c), jnp.bfloat16),
            pltpu.VMEM((I, c), jnp.bfloat16),
            pltpu.VMEM((1, I), jnp.float32),
            pltpu.VMEM((1, I), jnp.float32),
            pltpu.VMEM((1, I), jnp.float32),
            pltpu.VMEM((1, I), jnp.float32),
            pltpu.VMEM((8, I), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(q1.astype(jnp.bfloat16), q2.astype(jnp.bfloat16), mask,
      k1.astype(jnp.bfloat16), k2.astype(jnp.bfloat16))
    return out


# ---------------------------------------------------------------------------
# Forward hop
# ---------------------------------------------------------------------------


def _fwd_kernel(with_outs, q1_ref, q2_ref, mask_ref, cu_ref, stats_ref,
                ci_ref, k1_any, k2_any, zi_any,
                ou1_ref, ou2_ref, hu_ref, oi1_any, oi2_any, hi_any,
                k1_v, k2_v, zi_v, oi1_acc, oi2_acc, hi_acc, sems):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        _stage(k1_any, k1_v, sems.at[0])
        _stage(k2_any, k2_v, sems.at[1])
        _stage(zi_any, zi_v, sems.at[2])

    m = mask_ref[:].astype(jnp.float32)
    st = stats_ref[:]
    civ = ci_ref[:]
    cuv = cu_ref[:]
    d = zi_v.shape[1]
    zu_tile = cuv[:, 2 : 2 + d].astype(jnp.bfloat16)

    s1 = _scores(q1_ref, k1_v[:])
    s2 = _scores(q2_ref, k2_v[:])
    pu1 = _row_softmax(s1, m)
    pu2 = _row_softmax(s2, m)
    if with_outs:
        ou1_ref[:] = jnp.dot(pu1.astype(jnp.bfloat16), k1_v[:],
                             preferred_element_type=jnp.float32)
        ou2_ref[:] = jnp.dot(pu2.astype(jnp.bfloat16), k2_v[:],
                             preferred_element_type=jnp.float32)
    wu = _relu_max(pu1 * civ[0:1, :], pu2 * civ[1:2, :])
    hu_ref[:] = jnp.dot(wu.astype(jnp.bfloat16), zi_v[:],
                        preferred_element_type=jnp.float32)

    pi1 = _col_softmax(s1, m, st[0:1, :], st[1:2, :])
    pi2 = _col_softmax(s2, m, st[2:3, :], st[3:4, :])
    wi = _relu_max(pi1 * cuv[:, 0:1], pi2 * cuv[:, 1:2])
    hi_c = jax.lax.dot_general(
        wi.astype(jnp.bfloat16), zu_tile,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if with_outs:
        oi1_c = jax.lax.dot_general(
            pi1.astype(jnp.bfloat16), q1_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        oi2_c = jax.lax.dot_general(
            pi2.astype(jnp.bfloat16), q2_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(r == 0)
    def _():
        if with_outs:
            oi1_acc[:] = oi1_c
            oi2_acc[:] = oi2_c
        hi_acc[:] = hi_c

    @pl.when(r > 0)
    def _():
        if with_outs:
            oi1_acc[:] = oi1_acc[:] + oi1_c
            oi2_acc[:] = oi2_acc[:] + oi2_c
        hi_acc[:] = hi_acc[:] + hi_c

    @pl.when(r == n_r - 1)
    def _():
        if with_outs:
            _stage(oi1_acc, oi1_any, sems.at[3])
            _stage(oi2_acc, oi2_any, sems.at[4])
        _stage(hi_acc, hi_any, sems.at[5])


# ---------------------------------------------------------------------------
# Backward: D pre-pass (both modalities) + one pass per modality
# ---------------------------------------------------------------------------


def _dpre_kernel(q1_ref, q2_ref, mask_ref, cu_ref, stats_ref, ci_ref,
                 ghu_ref, k1_any, k2_any, zi_any, goi1_any, goi2_any, ghi_any,
                 dvec_ref, dzu_ref, dzi_any,
                 k1_v, k2_v, zi_v, goi1_v, goi2_v, ghi_v,
                 d1_acc, d2_acc, dzi_acc, dpack, sems):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        _stage(k1_any, k1_v, sems.at[0])
        _stage(k2_any, k2_v, sems.at[1])
        _stage(zi_any, zi_v, sems.at[2])
        _stage(goi1_any, goi1_v, sems.at[3])
        _stage(goi2_any, goi2_v, sems.at[4])
        _stage(ghi_any, ghi_v, sems.at[5])

    m = mask_ref[:].astype(jnp.float32)
    st = stats_ref[:]
    civ = ci_ref[:]
    cuv = cu_ref[:]
    cu1 = cuv[:, 0:1]
    cu2 = cuv[:, 1:2]
    d = zi_v.shape[1]
    zu_tile = cuv[:, 2 : 2 + d].astype(jnp.bfloat16)

    s1 = _scores(q1_ref, k1_v[:])
    s2 = _scores(q2_ref, k2_v[:])
    pi1 = _col_softmax(s1, m, st[0:1, :], st[1:2, :])
    pi2 = _col_softmax(s2, m, st[2:3, :], st[3:4, :])
    g1i = pi1 * cu1
    g2i = pi2 * cu2
    wi = _relu_max(g1i, g2i)
    live_i = wi > 0

    # dwi[u, i] = zu[u] . ghi[i]
    dwi = jax.lax.dot_general(
        zu_tile, ghi_v[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dg1i = jnp.where(live_i & (g1i >= g2i), dwi, 0.0)
    dg2i = jnp.where(live_i & (g2i > g1i), dwi, 0.0)
    # dpi_m = q_m @ goi_m.T (attention out) + dg_m * cu_m (gate)
    dpi1 = jax.lax.dot_general(
        q1_ref[:], goi1_v[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + dg1i * cu1
    dpi2 = jax.lax.dot_general(
        q2_ref[:], goi2_v[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + dg2i * cu2
    d1_c = jnp.sum(pi1 * dpi1, axis=0, keepdims=True)
    d2_c = jnp.sum(pi2 * dpi2, axis=0, keepdims=True)

    # dzu (row-owned) = wi @ ghi
    dzu_ref[:] = jnp.dot(wi.astype(jnp.bfloat16), ghi_v[:],
                         preferred_element_type=jnp.float32)

    # dzi (accumulated) = wu.T @ ghu
    pu1 = _row_softmax(s1, m)
    pu2 = _row_softmax(s2, m)
    wu = _relu_max(pu1 * civ[0:1, :], pu2 * civ[1:2, :])
    dzi_c = jax.lax.dot_general(
        wu.astype(jnp.bfloat16), ghu_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(r == 0)
    def _():
        d1_acc[:] = d1_c
        d2_acc[:] = d2_c
        dzi_acc[:] = dzi_c

    @pl.when(r > 0)
    def _():
        d1_acc[:] = d1_acc[:] + d1_c
        d2_acc[:] = d2_acc[:] + d2_c
        dzi_acc[:] = dzi_acc[:] + dzi_c

    # layout matches _swap_rows2: rows 0-1 = modality 1, rows 2-3 = modality 2
    # (packed into one (8, I) tile — HBM row DMAs must be 8-row aligned)
    @pl.when(r == n_r - 1)
    def _():
        dpack[:] = jnp.concatenate(
            [d1_acc[:], d1_acc[:], d2_acc[:], d2_acc[:],
             d1_acc[:], d1_acc[:], d2_acc[:], d2_acc[:]], axis=0
        )
        _stage(dpack, dvec_ref, sems.at[6])
        _stage(dzi_acc, dzi_any, sems.at[7])


def _gmod_kernel(with_outs, tie_first, q1_ref, q2_ref, mask_ref, cu_ref,
                 stats_ref, ci_ref, dvec_ref, ghu_ref, gou_ref,
                 k1_any, k2_any, zi_any, goi_any, ghi_any,
                 dq_ref, dcu_ref, dk_any, dci_ref,
                 k1_v, k2_v, zi_v, goi_v, ghi_v, dk_acc, dci_acc, sems):
    """Gradients for the FIRST modality of the argument order; the caller
    swaps (q1, k1) <-> (q2, k2), the confidence/stats/D rows, and the
    cotangents to run modality 2."""
    r = pl.program_id(0)
    n_r = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        _stage(k1_any, k1_v, sems.at[0])
        _stage(k2_any, k2_v, sems.at[1])
        _stage(zi_any, zi_v, sems.at[2])
        _stage(goi_any, goi_v, sems.at[3])
        _stage(ghi_any, ghi_v, sems.at[4])

    m = mask_ref[:].astype(jnp.float32)
    st = stats_ref[:]
    civ = ci_ref[:]
    cuv = cu_ref[:]
    ci1 = civ[0:1, :]
    ci2 = civ[1:2, :]
    cu1 = cuv[:, 0:1]
    cu2 = cuv[:, 1:2]
    d = zi_v.shape[1]
    zu_tile = cuv[:, 2 : 2 + d].astype(jnp.bfloat16)

    s1 = _scores(q1_ref, k1_v[:])
    s2 = _scores(q2_ref, k2_v[:])
    pu1 = _row_softmax(s1, m)
    pu2 = _row_softmax(s2, m)
    pi1 = _col_softmax(s1, m, st[0:1, :], st[1:2, :])
    pi2 = _col_softmax(s2, m, st[2:3, :], st[3:4, :])

    # --- user-side gate routing for this modality
    g1u = pu1 * ci1
    g2u = pu2 * ci2
    live_u = jnp.maximum(g1u, g2u) > 0
    dwu = jax.lax.dot_general(
        ghu_ref[:].astype(jnp.bfloat16), zi_v[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    win_u = (g1u >= g2u) if tie_first else (g1u > g2u)
    dg1u = jnp.where(live_u & win_u, dwu, 0.0)
    dci_c = jnp.sum(dg1u * pu1, axis=0, keepdims=True)

    # --- item-side gate routing for this modality
    g1i = pi1 * cu1
    g2i = pi2 * cu2
    live_i = jnp.maximum(g1i, g2i) > 0
    dwi = jax.lax.dot_general(
        zu_tile, ghi_v[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    win_i = (g1i >= g2i) if tie_first else (g1i > g2i)
    dg1i = jnp.where(live_i & win_i, dwi, 0.0)
    dcu_c = jnp.sum(dg1i * pi1, axis=1, keepdims=True)
    dcu_ref[:] = jnp.broadcast_to(dcu_c, dcu_ref.shape)

    # --- softmax Jacobians (row side in-tile, column side via D vector)
    dpu = dg1u * ci1
    if with_outs:
        dpu = dpu + jax.lax.dot_general(
            gou_ref[:].astype(jnp.bfloat16), k1_v[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dsu = pu1 * (dpu - jnp.sum(dpu * pu1, axis=1, keepdims=True))

    dpi = dg1i * cu1
    if with_outs:
        dpi = dpi + jax.lax.dot_general(
            q1_ref[:], goi_v[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dsi = pi1 * (dpi - dvec_ref[:][0:1, :])
    ds = (dsu + dsi).astype(jnp.bfloat16)

    dq = jnp.dot(ds, k1_v[:], preferred_element_type=jnp.float32)
    if with_outs:
        dq = dq + jnp.dot(pi1.astype(jnp.bfloat16), goi_v[:],
                          preferred_element_type=jnp.float32)
    dq_ref[:] = dq

    dk_c = jax.lax.dot_general(
        ds, q1_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if with_outs:
        dk_c = dk_c + jax.lax.dot_general(
            pu1.astype(jnp.bfloat16), gou_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(r == 0)
    def _():
        dk_acc[:] = dk_c
        dci_acc[:] = dci_c

    @pl.when(r > 0)
    def _():
        dk_acc[:] = dk_acc[:] + dk_c
        dci_acc[:] = dci_acc[:] + dci_c

    @pl.when(r == n_r - 1)
    def _():
        _stage(dk_acc, dk_any, sems.at[5])
        _stage(dci_acc, dci_ref, sems.at[6])


# ---------------------------------------------------------------------------
# Block sizing
# ---------------------------------------------------------------------------


def _pick_block(U: int, I: int, n_f32: int, fixed: int,
                mask_itemsize: int = 1) -> int:
    budget = _VMEM_BUDGET - fixed
    per_row = I * mask_itemsize * 3 + I * 4 * n_f32 + 128 * 4 * 8
    bu = budget // max(per_row, 1)
    for cand in (256, 128, 64, 32, 16, 8):
        if bu >= cand and U % cand == 0:
            return cand
    return 8


def _gmod_fixed(I: int, c: int, d: int) -> int:
    # resident k1/k2/zi/goi/ghi (bf16) + dk accumulator (f32) + vectors
    return I * c * 2 * 3 + I * d * 2 * 2 + I * c * 4 + I * 4 * 16


def fits_vmem(U: int, I: int, c: int, d: int) -> bool:
    """True when the heaviest launch (per-modality backward) fits with the
    minimal row tile."""
    per_row = I * 1 * 3 + I * 4 * 7 + 128 * 4 * 8
    return (
        _gmod_fixed(I, c, d) + 8 * per_row <= _VMEM_BUDGET
        and U % 8 == 0
        and I % 128 == 0
        and d <= 126
    )


# ---------------------------------------------------------------------------
# The custom-VJP op
# ---------------------------------------------------------------------------


def _pack_zu_cu(cu: jnp.ndarray, zu: jnp.ndarray) -> jnp.ndarray:
    """[U, 128] f32 tile stream: cols 0/1 = confidences, 2:2+d = zu."""
    U, d = zu.shape
    out = jnp.zeros((U, 128), jnp.float32)
    out = out.at[:, 0:2].set(cu.astype(jnp.float32))
    out = out.at[:, 2 : 2 + d].set(zu.astype(jnp.float32))
    return out


def _ci_rows(ci: jnp.ndarray, I: int) -> jnp.ndarray:
    """[I, 2] item confidences -> [8, I] f32 rows 0/1."""
    z = jnp.zeros((8, I), jnp.float32)
    return z.at[0:2, :].set(ci.T.astype(jnp.float32))


def _swap_rows2(pack):
    """Swap the modality-1 / modality-2 row pairs of an [8, I] pack."""
    return jnp.concatenate([pack[2:4], pack[0:2], pack[4:8]], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def gated_dual_hop(q1, k1, q2, k2, cu, ci, zu, zi, stats, mask,
                   with_outs=True):
    """(ou1, ou2, oi1, oi2, hu, hi) — see module docstring.

    q_m: [U, c]; k_m: [I, c]; cu: [U, 2]; ci: [I, 2]; zu: [U, d]; zi: [I, d]
    (d <= 126); stats: [8, I] from ``dual_colstats`` (zero cotangent); mask:
    [U, I] int8/bf16 multiplicity counts (constant).  with_outs=False skips
    the four attention outputs (their values are then undefined) — used for
    the second EGCN hop, whose attention outputs are discarded.
    """
    return _fwd_impl(q1, k1, q2, k2, cu, ci, zu, zi, stats, mask, with_outs)


def _fwd_impl(q1, k1, q2, k2, cu, ci, zu, zi, stats, mask, with_outs):
    U, I = mask.shape
    c = q1.shape[1]
    d = zi.shape[1]
    interpret = jax.default_backend() == "cpu"
    fixed = (I * c * 2 * 2 + I * d * 2
             + (I * (2 * c + d) if with_outs else I * d) * 4)
    bu = _pick_block(U, I, n_f32=6, fixed=fixed,
                     mask_itemsize=mask.dtype.itemsize)
    qspec = pl.BlockSpec((bu, c), lambda r: (r, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, with_outs),
        grid=(U // bu,),
        in_specs=[
            qspec,
            qspec,
            pl.BlockSpec((bu, I), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bu, 128), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            qspec,
            qspec,
            pl.BlockSpec((bu, d), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((U, c), jnp.float32),
            jax.ShapeDtypeStruct((U, c), jnp.float32),
            jax.ShapeDtypeStruct((U, d), jnp.float32),
            jax.ShapeDtypeStruct((I, c), jnp.float32),
            jax.ShapeDtypeStruct((I, c), jnp.float32),
            jax.ShapeDtypeStruct((I, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((I, c), jnp.bfloat16),
            pltpu.VMEM((I, c), jnp.bfloat16),
            pltpu.VMEM((I, d), jnp.bfloat16),
            pltpu.VMEM((I, c), jnp.float32),
            pltpu.VMEM((I, c), jnp.float32),
            pltpu.VMEM((I, d), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(q1.astype(jnp.bfloat16), q2.astype(jnp.bfloat16), mask,
      _pack_zu_cu(cu, zu), stats, _ci_rows(ci, I),
      k1.astype(jnp.bfloat16), k2.astype(jnp.bfloat16),
      zi.astype(jnp.bfloat16))
    ou1, ou2, hu, oi1, oi2, hi = outs
    return ou1, ou2, oi1, oi2, hu, hi


def _vjp_fwd(q1, k1, q2, k2, cu, ci, zu, zi, stats, mask, with_outs):
    out = _fwd_impl(q1, k1, q2, k2, cu, ci, zu, zi, stats, mask, with_outs)
    return out, (q1, k1, q2, k2, cu, ci, zu, zi, stats, mask)


def _vjp_bwd(with_outs, res, cots):
    q1, k1, q2, k2, cu, ci, zu, zi, stats, mask = res
    gou1, gou2, goi1, goi2, ghu, ghi = cots
    U, I = mask.shape
    c = q1.shape[1]
    d = zi.shape[1]
    interpret = jax.default_backend() == "cpu"
    q1b = q1.astype(jnp.bfloat16)
    q2b = q2.astype(jnp.bfloat16)
    k1b = k1.astype(jnp.bfloat16)
    k2b = k2.astype(jnp.bfloat16)
    zib = zi.astype(jnp.bfloat16)
    packed = _pack_zu_cu(cu, zu)
    ci_r = _ci_rows(ci, I)
    ghu32 = ghu.astype(jnp.float32)
    ghi_b = ghi.astype(jnp.bfloat16)
    goi1_b = goi1.astype(jnp.bfloat16)
    goi2_b = goi2.astype(jnp.bfloat16)

    def _tile(bu_, w):
        return pl.BlockSpec((bu_, w), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)

    # --- D pre-pass ---------------------------------------------------------
    fixed = (I * c * 2 * 2 + I * d * 2 + I * c * 2 * 2 + I * d * 2
             + I * d * 4 + I * 4 * 4)
    bu = _pick_block(U, I, n_f32=7, fixed=fixed,
                     mask_itemsize=mask.dtype.itemsize)
    dvec, dzu, dzi = pl.pallas_call(
        _dpre_kernel,
        grid=(U // bu,),
        in_specs=[
            _tile(bu, c),
            _tile(bu, c),
            pl.BlockSpec((bu, I), lambda r: (r, 0), memory_space=pltpu.VMEM),
            _tile(bu, 128),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            _tile(bu, d),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            _tile(bu, d),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, I), jnp.float32),
            jax.ShapeDtypeStruct((U, d), jnp.float32),
            jax.ShapeDtypeStruct((I, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((I, c), jnp.bfloat16),
            pltpu.VMEM((I, c), jnp.bfloat16),
            pltpu.VMEM((I, d), jnp.bfloat16),
            pltpu.VMEM((I, c), jnp.bfloat16),
            pltpu.VMEM((I, c), jnp.bfloat16),
            pltpu.VMEM((I, d), jnp.bfloat16),
            pltpu.VMEM((1, I), jnp.float32),
            pltpu.VMEM((1, I), jnp.float32),
            pltpu.VMEM((I, d), jnp.float32),
            pltpu.VMEM((8, I), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(q1b, q2b, mask, packed, stats, ci_r, ghu32,
      k1b, k2b, zib, goi1_b, goi2_b, ghi_b)

    # --- per-modality passes -------------------------------------------------
    def _modality(tie_first, qa, qb_, ka, kb_, stats_m, dvec_m, ci_m,
                  cu_packed, gou_m, goi_m):
        bum = _pick_block(U, I, n_f32=7, fixed=_gmod_fixed(I, c, d),
                          mask_itemsize=mask.dtype.itemsize)
        return pl.pallas_call(
            functools.partial(_gmod_kernel, with_outs, tie_first),
            grid=(U // bum,),
            in_specs=[
                _tile(bum, c),
                _tile(bum, c),
                pl.BlockSpec((bum, I), lambda r: (r, 0),
                             memory_space=pltpu.VMEM),
                _tile(bum, 128),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                _tile(bum, d),
                _tile(bum, c),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                _tile(bum, c),
                _tile(bum, 128),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((U, c), jnp.float32),
                jax.ShapeDtypeStruct((U, 128), jnp.float32),
                jax.ShapeDtypeStruct((I, c), jnp.float32),
                jax.ShapeDtypeStruct((1, I), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((I, c), jnp.bfloat16),
                pltpu.VMEM((I, c), jnp.bfloat16),
                pltpu.VMEM((I, d), jnp.bfloat16),
                pltpu.VMEM((I, c), jnp.bfloat16),
                pltpu.VMEM((I, d), jnp.bfloat16),
                pltpu.VMEM((I, c), jnp.float32),
                pltpu.VMEM((1, I), jnp.float32),
                pltpu.SemaphoreType.DMA((7,)),
            ],
            compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(qa, qb_, mask, cu_packed, stats_m, ci_m, dvec_m,
          ghu32, gou_m.astype(jnp.float32),
          ka, kb_, zib, goi_m, ghi_b)

    dq1, dcu1_t, dk1, dci1 = _modality(
        True, q1b, q2b, k1b, k2b, stats, dvec, ci_r, packed, gou1, goi1_b
    )
    # modality 2: swap every per-modality pack (ties route to modality 1,
    # so this pass uses the strict comparison)
    packed2 = jnp.concatenate(
        [packed[:, 1:2], packed[:, 0:1], packed[:, 2:]], axis=1
    )
    ci_r2 = jnp.concatenate([ci_r[1:2], ci_r[0:1], ci_r[2:8]], axis=0)
    dq2, dcu2_t, dk2, dci2 = _modality(
        False, q2b, q1b, k2b, k1b, _swap_rows2(stats), _swap_rows2(dvec),
        ci_r2, packed2, gou2, goi2_b
    )

    dcu = jnp.stack([dcu1_t[:, 0], dcu2_t[:, 0]], axis=1).astype(cu.dtype)
    dci = jnp.stack([dci1[0], dci2[0]], axis=1).astype(ci.dtype)
    return (
        dq1.astype(q1.dtype), dk1.astype(k1.dtype),
        dq2.astype(q2.dtype), dk2.astype(k2.dtype),
        dcu, dci,
        dzu.astype(zu.dtype), dzi.astype(zi.dtype),
        jnp.zeros_like(stats), _mask_zero_cotangent(mask),
    )


gated_dual_hop.defvjp(_vjp_fwd, _vjp_bwd)
