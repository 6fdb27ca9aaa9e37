"""ops/grcn_fused.py vs a materialized pure-JAX oracle (interpret mode).

The oracle reproduces exactly what GRCN's plain dense path computes
(`models/grcn.py::_gat_dense` + the EGCN weight combine): row/column masked
softmaxes of the two modality score matrices, attention outputs both
directions, and the confidence-gated relu-max SAGE hop.  Values and the full
VJP (through q/k/confidences/operands) must agree to bf16-matmul tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendar_systems_tpu.ops.grcn_fused import (
    dual_colstats,
    gated_dual_hop,
    gated_dual_hop_pair,
)

_NEG = -1e30


def _rsm(s, m):
    masked = jnp.where(m > 0, s, _NEG)
    mx = jnp.max(masked, axis=1, keepdims=True)
    mx = jnp.where(mx > _NEG / 2, mx, 0.0)
    e = m * jnp.exp(masked - mx)
    return e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)


def _csm(s, m):
    masked = jnp.where(m > 0, s, _NEG)
    mx = jnp.max(masked, axis=0, keepdims=True)
    mx = jnp.where(mx > _NEG / 2, mx, 0.0)
    e = m * jnp.where(m > 0, jnp.exp(s - mx), 0.0)
    return e / jnp.maximum(jnp.sum(e, axis=0, keepdims=True), 1e-16)


def _oracle(q1, k1, q2, k2, cu, ci, zu, zi, mask):
    m = mask.astype(jnp.float32)
    b = jnp.bfloat16
    s1 = jnp.matmul(q1.astype(b), k1.astype(b).T,
                    preferred_element_type=jnp.float32)
    s2 = jnp.matmul(q2.astype(b), k2.astype(b).T,
                    preferred_element_type=jnp.float32)
    pu1, pu2 = _rsm(s1, m), _rsm(s2, m)
    pi1, pi2 = _csm(s1, m), _csm(s2, m)
    ou1 = jnp.matmul(pu1.astype(b), k1.astype(b),
                     preferred_element_type=jnp.float32)
    ou2 = jnp.matmul(pu2.astype(b), k2.astype(b),
                     preferred_element_type=jnp.float32)
    oi1 = jnp.matmul(pi1.astype(b).T, q1.astype(b),
                     preferred_element_type=jnp.float32)
    oi2 = jnp.matmul(pi2.astype(b).T, q2.astype(b),
                     preferred_element_type=jnp.float32)
    wu = jnp.maximum(pu1 * ci[:, 0][None, :], pu2 * ci[:, 1][None, :])
    wu = jnp.where(wu > 0, wu, 0.0)
    wi = jnp.maximum(pi1 * cu[:, 0][:, None], pi2 * cu[:, 1][:, None])
    wi = jnp.where(wi > 0, wi, 0.0)
    hu = jnp.matmul(wu.astype(b), zi.astype(b),
                    preferred_element_type=jnp.float32)
    hi = jnp.matmul(wi.astype(b).T, zu.astype(b),
                    preferred_element_type=jnp.float32)
    return ou1, ou2, oi1, oi2, hu, hi


def _inputs(seed=0, U=64, I=128, c=16, d=24):
    rng = np.random.default_rng(seed)
    mask = np.zeros((U, I), np.int8)
    nz = rng.random((U, I)) < 0.1
    mask[nz] = rng.integers(1, 3, size=int(nz.sum()))
    mask[-7:, :] = 0  # padding rows
    mask[:, -13:] = 0  # padding columns
    mask[3, :] = 0  # empty (but unpadded) user row
    args = dict(
        q1=rng.normal(size=(U, c)).astype(np.float32),
        k1=rng.normal(size=(I, c)).astype(np.float32),
        q2=rng.normal(size=(U, c)).astype(np.float32),
        k2=rng.normal(size=(I, c)).astype(np.float32),
        cu=rng.normal(size=(U, 2)).astype(np.float32),
        ci=rng.normal(size=(I, 2)).astype(np.float32),
        zu=rng.normal(size=(U, d)).astype(np.float32),
        zi=rng.normal(size=(I, d)).astype(np.float32),
    )
    return {k: jnp.asarray(v) for k, v in args.items()}, jnp.asarray(mask)


def _rel(a, b):
    denom = float(jnp.linalg.norm(b)) or 1.0
    return float(jnp.linalg.norm(a - b)) / denom


def test_forward_matches_oracle():
    args, mask = _inputs()
    stats = dual_colstats(args["q1"], args["k1"], args["q2"], args["k2"],
                          mask)
    got = gated_dual_hop(args["q1"], args["k1"], args["q2"], args["k2"],
                         args["cu"], args["ci"], args["zu"], args["zi"],
                         stats, mask)
    want = _oracle(**args, mask=mask)
    names = ["ou1", "ou2", "oi1", "oi2", "hu", "hi"]
    for n, g, w in zip(names, got, want):
        assert _rel(g, w) < 2e-2, (n, _rel(g, w))


def test_grads_match_oracle():
    args, mask = _inputs(seed=1)
    keys = list(args.keys())
    rng = np.random.default_rng(7)
    # random but fixed cotangent weights make the scalar sensitive everywhere
    probes = None

    def scal(outs):
        nonlocal probes
        if probes is None:
            probes = [
                jnp.asarray(rng.normal(size=o.shape).astype(np.float32))
                for o in outs
            ]
        return sum(jnp.vdot(o, p) for o, p in zip(outs, probes))

    def f_fused(*vals):
        a = dict(zip(keys, vals))
        stats = dual_colstats(a["q1"], a["k1"], a["q2"], a["k2"], mask)
        return scal(gated_dual_hop(a["q1"], a["k1"], a["q2"], a["k2"],
                                   a["cu"], a["ci"], a["zu"], a["zi"],
                                   stats, mask))

    def f_oracle(*vals):
        a = dict(zip(keys, vals))
        return scal(_oracle(**a, mask=mask))

    vals = [args[k] for k in keys]
    gf = jax.grad(f_fused, argnums=tuple(range(len(keys))))(*vals)
    go = jax.grad(f_oracle, argnums=tuple(range(len(keys))))(*vals)
    for k, a, b in zip(keys, gf, go):
        assert _rel(a, b) < 3e-2, (k, _rel(a, b))


def test_hop2_no_outs_grads():
    """with_outs=False: hu/hi (and their grads) still match the oracle."""
    args, mask = _inputs(seed=2)
    keys = list(args.keys())

    def f_fused(*vals):
        a = dict(zip(keys, vals))
        stats = dual_colstats(a["q1"], a["k1"], a["q2"], a["k2"], mask)
        outs = gated_dual_hop(a["q1"], a["k1"], a["q2"], a["k2"],
                              a["cu"], a["ci"], a["zu"], a["zi"],
                              stats, mask, False)
        return jnp.sum(outs[4] ** 2) + jnp.sum(outs[5] ** 2)

    def f_oracle(*vals):
        a = dict(zip(keys, vals))
        outs = _oracle(**a, mask=mask)
        return jnp.sum(outs[4] ** 2) + jnp.sum(outs[5] ** 2)

    vals = [args[k] for k in keys]
    assert abs(float(f_fused(*vals)) - float(f_oracle(*vals))) < 1e-2 * (
        abs(float(f_oracle(*vals))) + 1.0
    )
    gf = jax.grad(f_fused, argnums=tuple(range(len(keys))))(*vals)
    go = jax.grad(f_oracle, argnums=tuple(range(len(keys))))(*vals)
    for k, a, b in zip(keys, gf, go):
        assert _rel(a, b) < 3e-2, (k, _rel(a, b))


def _oracle_pair(q1, k1, q2, k2, cu, ci, zu, zi, mask, with_act=True,
                 slope=0.01):
    """Two hops with shared attention + inter-hop leaky-relu — what the
    model's two-call path computes (modulo the single-vs-pair VJP)."""

    def act(a):
        return jnp.where(a > 0, a, slope * a) if with_act else a

    ou1, ou2, oi1, oi2, h1u, h1i = _oracle(q1, k1, q2, k2, cu, ci, zu, zi,
                                           mask)
    h1u_a, h1i_a = act(h1u), act(h1i)
    _, _, _, _, h2u, h2i = _oracle(q1, k1, q2, k2, cu, ci, h1u_a, h1i_a,
                                   mask)
    return ou1, ou2, oi1, oi2, h1u_a, h1i_a, h2u, h2i


@pytest.mark.parametrize("with_act", [True, False])
def test_pair_forward_and_grads_match_oracle(with_act):
    args, mask = _inputs(seed=4)
    keys = list(args.keys())
    rng = np.random.default_rng(11)
    probes = None

    def scal(outs):
        nonlocal probes
        if probes is None:
            probes = [
                jnp.asarray(rng.normal(size=o.shape).astype(np.float32))
                for o in outs
            ]
        return sum(jnp.vdot(o, p) for o, p in zip(outs, probes))

    def f_pair(*vals):
        a = dict(zip(keys, vals))
        stats = dual_colstats(a["q1"], a["k1"], a["q2"], a["k2"], mask)
        return scal(gated_dual_hop_pair(
            a["q1"], a["k1"], a["q2"], a["k2"], a["cu"], a["ci"],
            a["zu"], a["zi"], stats, mask, with_act, 0.01,
        ))

    def f_oracle(*vals):
        a = dict(zip(keys, vals))
        return scal(_oracle_pair(**a, mask=mask, with_act=with_act))

    vals = [args[k] for k in keys]
    # forward values
    stats = dual_colstats(args["q1"], args["k1"], args["q2"], args["k2"],
                          mask)
    got = gated_dual_hop_pair(
        args["q1"], args["k1"], args["q2"], args["k2"], args["cu"],
        args["ci"], args["zu"], args["zi"], stats, mask, with_act, 0.01,
    )
    want = _oracle_pair(**args, mask=mask, with_act=with_act)
    names = ["ou1", "ou2", "oi1", "oi2", "h1u", "h1i", "h2u", "h2i"]
    for n, g, w in zip(names, got, want):
        assert _rel(g, w) < 2e-2, (n, _rel(g, w))
    # full VJP through every differentiable input
    gf = jax.grad(f_pair, argnums=tuple(range(len(keys))))(*vals)
    go = jax.grad(f_oracle, argnums=tuple(range(len(keys))))(*vals)
    for k, a, b in zip(keys, gf, go):
        assert _rel(a, b) < 3e-2, (k, _rel(a, b))


def test_pair_matches_two_single_hops():
    """The pair op's VJP must agree with chaining two single-hop ops (the
    model's fused_pair=false path) — same kernels, different backward
    factorization."""
    args, mask = _inputs(seed=5)
    keys = list(args.keys())

    def f_pair(*vals):
        a = dict(zip(keys, vals))
        stats = dual_colstats(a["q1"], a["k1"], a["q2"], a["k2"], mask)
        outs = gated_dual_hop_pair(
            a["q1"], a["k1"], a["q2"], a["k2"], a["cu"], a["ci"],
            a["zu"], a["zi"], stats, mask, True, 0.01,
        )
        return sum(jnp.sum(o ** 2) for o in outs)

    def f_chained(*vals):
        a = dict(zip(keys, vals))
        stats = dual_colstats(a["q1"], a["k1"], a["q2"], a["k2"], mask)
        ou1, ou2, oi1, oi2, h1u, h1i = gated_dual_hop(
            a["q1"], a["k1"], a["q2"], a["k2"], a["cu"], a["ci"],
            a["zu"], a["zi"], stats, mask,
        )
        act = lambda x: jnp.where(x > 0, x, 0.01 * x)  # noqa: E731
        h1u, h1i = act(h1u), act(h1i)
        _, _, _, _, h2u, h2i = gated_dual_hop(
            a["q1"], a["k1"], a["q2"], a["k2"], a["cu"], a["ci"],
            h1u, h1i, stats, mask, False,
        )
        return sum(jnp.sum(o ** 2)
                   for o in (ou1, ou2, oi1, oi2, h1u, h1i, h2u, h2i))

    vals = [args[k] for k in keys]
    assert abs(float(f_pair(*vals)) - float(f_chained(*vals))) < 1e-3 * (
        abs(float(f_chained(*vals))) + 1.0
    )
    gp = jax.grad(f_pair, argnums=tuple(range(len(keys))))(*vals)
    gc = jax.grad(f_chained, argnums=tuple(range(len(keys))))(*vals)
    for k, a, b in zip(keys, gp, gc):
        assert _rel(a, b) < 1e-2, (k, _rel(a, b))


def test_empty_rows_columns_zero():
    """Padding rows/columns produce exactly zero outputs."""
    args, mask = _inputs(seed=3)
    stats = dual_colstats(args["q1"], args["k1"], args["q2"], args["k2"],
                          mask)
    ou1, ou2, oi1, oi2, hu, hi = gated_dual_hop(
        args["q1"], args["k1"], args["q2"], args["k2"],
        args["cu"], args["ci"], args["zu"], args["zi"], stats, mask
    )
    np.testing.assert_array_equal(np.asarray(ou1[-7:]), 0.0)
    np.testing.assert_array_equal(np.asarray(hu[-7:]), 0.0)
    np.testing.assert_array_equal(np.asarray(ou1[3]), 0.0)
    np.testing.assert_array_equal(np.asarray(oi2[-13:]), 0.0)
    np.testing.assert_array_equal(np.asarray(hi[-13:]), 0.0)
    assert not bool(jnp.any(jnp.isnan(hu))) and not bool(
        jnp.any(jnp.isnan(hi))
    )
