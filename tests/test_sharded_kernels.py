"""Sharded Pallas kernel wrappers == their single-device kernels.

pallas_call is opaque to GSPMD, so under a mesh the fused kernels partition
themselves explicitly via shard_map (ops/fused_bip.py, ops/masked_attn.py,
ops/bitbip.py).  CPU interpret mode makes the kernels runnable on the
8-device virtual mesh; equality tolerances only absorb psum ordering.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommendar_systems_tpu.parallel.mesh import (
    active_mesh,
    make_mesh,
    set_active_mesh,
)


@pytest.fixture()
def mesh():
    m = make_mesh([4, 2])
    prev = active_mesh()
    set_active_mesh(m)
    yield m
    set_active_mesh(prev)


def _grad_close(g1, g2, tol=1e-5):
    for a, b in zip(g1, g2):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        assert float(jnp.abs(a - b).max()) / scale < tol


def test_fused_bip_sharded_matches(mesh):
    from recommendar_systems_tpu.ops.fused_bip import (
        fused_bip_matmul,
        fused_bip_matmul_sharded,
        shardable,
    )

    assert shardable(256, mesh)
    rng = np.random.default_rng(0)
    U, I, d = 256, 128, 128
    a = jnp.asarray(rng.normal(size=(U, I)).astype(np.float32))
    xu = jnp.asarray(rng.normal(size=(U, d)).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=(I, d)).astype(np.float32))

    def mkloss(fn):
        def loss(xu, xi):
            t, b = fn(xu, xi)
            return (t ** 2).sum() + (b ** 2).sum()
        return loss

    v1, g1 = jax.jit(jax.value_and_grad(
        mkloss(lambda u, i: fused_bip_matmul_sharded(a, u, i, mesh)),
        argnums=(0, 1)))(xu, xi)
    v2, g2 = jax.jit(jax.value_and_grad(
        mkloss(lambda u, i: fused_bip_matmul(a, u, i)),
        argnums=(0, 1)))(xu, xi)
    assert abs(float(v1 - v2)) / abs(float(v2)) < 1e-6
    _grad_close(g1, g2)


def test_masked_attention_auto_shards(mesh):
    from recommendar_systems_tpu.ops.masked_attn import (
        masked_attention,
        masked_attention_auto,
    )

    rng = np.random.default_rng(1)
    U, I, c = 256, 128, 64
    q = jnp.asarray(rng.normal(size=(U, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(I, c)).astype(np.float32))
    mask = jnp.asarray((rng.random((U, I)) < 0.05).astype(np.int8))

    def mkloss(fn):
        def loss(q, k):
            return (fn(q, k, mask) ** 2).sum()
        return loss

    v1, g1 = jax.jit(jax.value_and_grad(
        mkloss(masked_attention_auto), argnums=(0, 1)))(q, k)
    v2, g2 = jax.jit(jax.value_and_grad(
        mkloss(masked_attention), argnums=(0, 1)))(q, k)
    assert abs(float(v1 - v2)) / max(abs(float(v2)), 1e-6) < 1e-6
    _grad_close(g1, g2)


def test_bit_dual_matmul_sharded_matches(mesh):
    from recommendar_systems_tpu.ops.bitbip import (
        bit_dual_matmul,
        bit_dual_matmul_sharded,
        bit_shardable,
        pad_cols,
        perm_cols,
    )

    rng = np.random.default_rng(2)
    U, n_items, d = 256, 200, 64
    ip = pad_cols(n_items)
    assert bit_shardable(U, mesh)
    m01 = np.zeros((U, ip), np.uint32)
    m01[:, :n_items] = rng.random((U, n_items)) < 0.03
    packed = np.zeros((U, ip // 32), np.uint32)
    for j in range(32):
        packed |= m01[:, j::32].astype(np.uint32) << np.uint32(j)
    packed = jnp.asarray(packed.view(np.int32))
    xu = jnp.asarray(rng.normal(size=(U, d)).astype(np.float32))
    xi = perm_cols(
        jnp.asarray(rng.normal(size=(ip, d)).astype(np.float32)).astype(
            jnp.bfloat16
        ),
        ip // 32,
    )

    t1, b1 = jax.jit(
        lambda u, i: bit_dual_matmul_sharded(packed, u, i, mesh)
    )(xu, xi)
    t2, b2 = jax.jit(lambda u, i: bit_dual_matmul(packed, u, i))(xu, xi)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-6)
