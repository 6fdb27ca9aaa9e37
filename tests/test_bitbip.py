"""Bit-packed adjacency (graph/sparse.py::BitBip, ops/bitbip.py) vs COO.

Runs the Pallas kernels in interpret mode on CPU; tiny shapes keep it fast
despite the 4096-column padding the bit-plane layout requires.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommendar_systems_tpu.graph import build as gb
from recommendar_systems_tpu.graph import sparse as gs


@pytest.fixture(autouse=True)
def _bit_on():
    prev_fused = gs.fused_bip_enabled()
    gs.set_bit_adj(True)
    gs.set_fused_bip(True)
    yield
    gs.set_bit_adj("auto")
    gs.set_fused_bip(prev_fused)


def _edges(n_users=40, n_items=30, n_edges=200, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, n_edges)
    i = rng.integers(0, n_items, n_edges)
    keys = np.unique(u * n_items + i)
    return (keys // n_items).astype(np.int64), (keys % n_items).astype(np.int64)


def test_norm_adj_bitbip_matches_coo():
    u, i = _edges()
    nu, ni = 40, 30
    bit = gb.build_norm_adj(u, i, nu, ni)
    assert isinstance(bit, gs.BitBip)
    coo = gb.build_norm_adj(u, i, nu, ni, dense=False)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((nu + ni, 16)),
                    dtype=jnp.float32)
    got = gs.spmm(bit, x)
    want = gs.spmm(coo, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-3)


def test_mean_adj_bitbip_matches_coo():
    u, i = _edges(seed=3)
    nu, ni = 40, 30
    bit = gb.build_mean_adj(u, i, nu, ni)
    assert isinstance(bit, gs.BitBip) and bit.row_norm
    coo = gb.build_mean_adj(u, i, nu, ni, dense=False)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((nu + ni, 8)),
                    dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(gs.spmm(bit, x)), np.asarray(gs.spmm(coo, x)),
        rtol=2e-2, atol=5e-3,
    )


def test_bitui_view_matches_norm_ui():
    u, i = _edges(seed=5)
    nu, ni = 40, 30
    adj, r = gb.build_norm_adj_and_r(u, i, nu, ni)
    assert isinstance(adj, gs.BitBip) and isinstance(r, gs.BitUI)
    xi = jnp.asarray(np.random.default_rng(4).standard_normal((ni, 8)),
                     dtype=jnp.float32)
    coo_r = gb.build_norm_ui(u, i, nu, ni, dense=False)
    np.testing.assert_allclose(
        np.asarray(gs.spmm(r, xi)), np.asarray(gs.spmm(coo_r, xi)),
        rtol=2e-2, atol=2e-3,
    )


def test_bitbip_gradients_match_coo():
    u, i = _edges(seed=7)
    nu, ni = 40, 30
    bit = gb.build_norm_adj(u, i, nu, ni)
    coo = gb.build_norm_adj(u, i, nu, ni, dense=False)
    x0 = jnp.asarray(np.random.default_rng(6).standard_normal((nu + ni, 8)),
                     dtype=jnp.float32)
    t = jnp.asarray(np.random.default_rng(8).standard_normal((nu + ni, 8)),
                    dtype=jnp.float32)

    def loss(adj):
        def f(x):
            y = gs.spmm(adj, x)
            return jnp.sum((y - t) ** 2)
        return f

    g_bit = jax.grad(loss(bit))(x0)
    g_coo = jax.grad(loss(coo))(x0)
    np.testing.assert_allclose(np.asarray(g_bit), np.asarray(g_coo),
                               rtol=3e-2, atol=5e-3)


def test_multi_tile_grid_accumulation():
    """Exercise the 2-D grid paths directly: >1 row tile (bottom-direction
    scratch accumulation across r) and >1 column tile (top-direction block
    accumulation across c, per-tile operand permutation)."""
    from recommendar_systems_tpu.ops import bitbip

    rng = np.random.default_rng(11)
    U, I, d = 512, 10_000, 8
    ip = bitbip.pad_cols(I)
    assert ip // (32 * bitbip.KC) == 2  # two column tiles
    m01 = np.zeros((U, ip), np.int8)
    mask = rng.random((U, I)) < 0.01
    m01[:, :I] = mask
    packed = jnp.asarray(bitbip.pack_bits(m01))
    kw = ip // 32
    xu = jnp.asarray(rng.standard_normal((U, d)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((ip, d)), jnp.float32)

    bitbip.set_block_u(256)  # forces two row tiles
    try:
        top, bot_p = bitbip.bit_dual_matmul(
            packed, xu, bitbip.perm_cols(xi.astype(jnp.bfloat16), kw)
        )
        top1 = bitbip.bit_matmul(
            packed, bitbip.perm_cols(xi.astype(jnp.bfloat16), kw)
        )
        bot1_p = bitbip.bit_matmul_t(packed, xu)
    finally:
        bitbip.set_block_u(None)
    bot = bitbip.unperm_cols(bot_p, kw)
    bot1 = bitbip.unperm_cols(bot1_p, kw)

    # reference uses the same bf16-rounded operands as the kernel so the
    # comparison only sees accumulation-order noise
    a = m01.astype(np.float32)
    xi_r = np.asarray(xi.astype(jnp.bfloat16), np.float32)
    xu_r = np.asarray(xu.astype(jnp.bfloat16), np.float32)
    want_top = a @ xi_r
    want_bot = a.T @ xu_r
    np.testing.assert_allclose(np.asarray(top), want_top, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(bot), want_bot, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(top1), want_top, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(bot1), want_bot, rtol=2e-2, atol=2e-2)


def test_duplicate_edges_fall_back_to_int8():
    u = np.array([0, 0, 1], dtype=np.int64)
    i = np.array([1, 1, 2], dtype=np.int64)
    adj = gb.build_norm_adj(u, i, 4, 4)
    assert not isinstance(adj, gs.BitBip)


def test_padded_space_roundtrip():
    u, i = _edges(seed=9)
    nu, ni = 40, 30
    bit = gb.build_norm_adj(u, i, nu, ni)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((nu + ni, 8)),
                    dtype=jnp.float32)
    xp = gs.pad_nodes(bit, x)
    up, ip = bit.pad_dims
    assert xp.shape[0] == up + ip
    np.testing.assert_allclose(np.asarray(gs.unpad_nodes(bit, xp)),
                               np.asarray(x))
    # one padded-space propagation step == unpadded step
    got = gs.unpad_nodes(bit, gs.spmm(bit, xp))
    want = gs.spmm(bit, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_bit_density_floor_gates_auto(monkeypatch):
    """The optional density floor only affects "auto": below-floor
    catalogs fall back to COO/sparse; forced True ignores the floor
    (bit_density_floor config knob; PARITY.md SMORE-at-elec trace note)."""
    gs.set_bit_adj("auto")
    gs.set_bit_density_floor(0.5)  # 200 edges / (40*30) = 0.167 < 0.5
    try:
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(gs, "dense_ok", lambda r, c: False)
        assert not gs.use_bit_adj(40, 30, nnz=200)
        assert gs.use_bit_adj(40, 30, nnz=800)   # 0.67 >= 0.5
        assert gs.use_bit_adj(40, 30)            # no nnz -> ungated
        gs.set_bit_adj(True)
        assert gs.use_bit_adj(40, 30, nnz=1)     # force wins
    finally:
        gs.set_bit_density_floor(0.0)
        gs.set_bit_adj("auto")
