"""Graph engine tests: COO/ELL SpMM vs dense, adjacency normalization."""

import numpy as np
import jax.numpy as jnp

from recommendar_systems_tpu.graph.build import (
    build_edge_info,
    build_norm_adj,
    build_norm_ui,
)
from recommendar_systems_tpu.graph.sparse import COO, ELL, spmm_coo, spmm_ell


def _dense_norm_adj(u, i, n_users, n_items):
    """Oracle: the reference's scipy path (`lightgcn.py:77-103`) in dense numpy."""
    n = n_users + n_items
    A = np.zeros((n, n), dtype=np.float64)
    A[u, i + n_users] = 1.0
    A[i + n_users, u] = 1.0
    deg = (A > 0).sum(1) + 1e-7
    d = np.power(deg, -0.5)
    return d[:, None] * A * d[None, :]


def test_norm_adj_matches_dense_oracle():
    rng = np.random.default_rng(0)
    n_users, n_items, E = 15, 12, 60
    u = rng.integers(0, n_users, E)
    i = rng.integers(0, n_items, E)
    # dedup
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0], pairs[:, 1]
    adj = build_norm_adj(u, i, n_users, n_items, dense=False)
    dense = np.zeros((n_users + n_items, n_users + n_items))
    dense[np.asarray(adj.rows), np.asarray(adj.cols)] = np.asarray(adj.vals)
    oracle = _dense_norm_adj(u, i, n_users, n_items)
    np.testing.assert_allclose(dense, oracle, atol=1e-6)


def test_spmm_coo_matches_dense():
    rng = np.random.default_rng(1)
    n_users, n_items = 20, 15
    u = rng.integers(0, n_users, 80)
    i = rng.integers(0, n_items, 80)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    adj = build_norm_adj(pairs[:, 0], pairs[:, 1], n_users, n_items, dense=False)
    x = rng.normal(size=(n_users + n_items, 8)).astype(np.float32)
    got = np.asarray(spmm_coo(adj, jnp.asarray(x)))
    dense = np.zeros((adj.n_rows, adj.n_cols), dtype=np.float64)
    dense[np.asarray(adj.rows), np.asarray(adj.cols)] = np.asarray(adj.vals)
    np.testing.assert_allclose(got, dense @ x, atol=1e-4)


def test_spmm_coo_chunked_matches_unchunked():
    """Edge-chunked scan path (peak-memory cap for huge nnz) is exact."""
    from recommendar_systems_tpu.graph.sparse import set_coo_chunk_bytes

    rng = np.random.default_rng(4)
    n_users, n_items = 30, 25
    u = rng.integers(0, n_users, 300)
    i = rng.integers(0, n_items, 300)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    adj = build_norm_adj(pairs[:, 0], pairs[:, 1], n_users, n_items, dense=False)
    x = jnp.asarray(rng.normal(size=(n_users + n_items, 8)).astype(np.float32))
    want = np.asarray(spmm_coo(adj, x))
    set_coo_chunk_bytes(8 * 4 * 64)  # 64-edge chunks, forces padding too
    try:
        got = np.asarray(spmm_coo(adj, x))
    finally:
        set_coo_chunk_bytes(1 << 30)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_spmm_ell_matches_dense():
    rng = np.random.default_rng(2)
    n, k, d = 12, 4, 6
    idx = rng.integers(0, n, (n, k)).astype(np.int32)
    val = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    ell = ELL(jnp.asarray(idx), jnp.asarray(val), n_cols=n)
    got = np.asarray(spmm_ell(ell, jnp.asarray(x)))
    dense = np.zeros((n, n))
    for r in range(n):
        for c in range(k):
            dense[r, idx[r, c]] += val[r, c]
    np.testing.assert_allclose(got, dense @ x, atol=1e-4)


def test_norm_ui_rows():
    rng = np.random.default_rng(3)
    u = rng.integers(0, 10, 30)
    i = rng.integers(0, 8, 30)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0], pairs[:, 1]
    R = build_norm_ui(u, i, 10, 8, dense=False)
    du = np.bincount(u, minlength=10)
    di = np.bincount(i, minlength=8)
    vals = np.asarray(R.vals)
    rows = np.asarray(R.rows)
    cols = np.asarray(R.cols)
    for k in range(len(vals)):
        expected = (du[rows[k]] + 1e-7) ** -0.5 * (di[cols[k]] + 1e-7) ** -0.5
        assert abs(vals[k] - expected) < 1e-6


def test_edge_info():
    u = np.array([0, 0, 1, 2])
    i = np.array([0, 1, 0, 2])
    edges, vals = build_edge_info(u, i, 3, 3)
    assert edges.shape == (2, 4)
    # user 0 has degree 2, item 0 degree 2 -> value 1/2
    assert abs(vals[0] - 0.5) < 1e-5


def test_dense_builders_match_sparse():
    """DenseBip/DenseMat propagation == COO segment-sum for every builder."""
    from recommendar_systems_tpu.graph.build import (
        build_mean_adj,
        build_rw_adj_selfloop,
    )
    from recommendar_systems_tpu.graph.sparse import spmm

    rng = np.random.default_rng(7)
    n_users, n_items = 23, 17
    u = rng.integers(0, n_users, 120)
    i = rng.integers(0, n_items, 120)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0], pairs[:, 1]
    x = jnp.asarray(rng.normal(size=(n_users + n_items, 6)).astype(np.float32))
    xr = jnp.asarray(rng.normal(size=(n_items, 6)).astype(np.float32))

    for builder in (build_norm_adj, build_mean_adj, build_rw_adj_selfloop):
        sp = builder(u, i, n_users, n_items, dense=False)
        dn = builder(u, i, n_users, n_items, dense=True)
        np.testing.assert_allclose(
            np.asarray(spmm(dn, x)), np.asarray(spmm(sp, x)), atol=1e-5,
            err_msg=builder.__name__,
        )

    sp = build_norm_ui(u, i, n_users, n_items, dense=False)
    dn = build_norm_ui(u, i, n_users, n_items, dense=True)
    np.testing.assert_allclose(
        np.asarray(spmm(dn, xr)), np.asarray(spmm(sp, xr)), atol=1e-5
    )


def test_dense_knn_matches_ell():
    from recommendar_systems_tpu.graph.knn import build_knn_ell
    from recommendar_systems_tpu.graph.sparse import spmm

    rng = np.random.default_rng(8)
    feats = rng.normal(size=(30, 12)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(30, 5)).astype(np.float32))
    ell = build_knn_ell(feats, 4, dense=False)
    dns = build_knn_ell(feats, 4, dense=True)
    np.testing.assert_allclose(
        np.asarray(spmm(dns, x)), np.asarray(spmm(ell, x)), atol=1e-5
    )


def test_padded_densebip_matches_unpadded():
    """fused_bip padding: padded storage + XLA path is numerically exact."""
    from recommendar_systems_tpu.graph.build import build_norm_adj
    from recommendar_systems_tpu.graph.sparse import set_fused_bip, spmm

    rng = np.random.default_rng(11)
    n_users, n_items = 70, 45
    u = rng.integers(0, n_users, 400)
    i = rng.integers(0, n_items, 400)
    x = jnp.asarray(rng.normal(size=(n_users + n_items, 16)).astype(np.float32))
    plain = build_norm_adj(u, i, n_users, n_items, dense=True)
    try:
        set_fused_bip(True)
        padded = build_norm_adj(u, i, n_users, n_items, dense=True)
    finally:
        set_fused_bip(False)
    assert padded.dims == (n_users, n_items)
    assert padded.ur.shape[0] % 256 == 0 and padded.ur.shape[1] % 128 == 0
    np.testing.assert_allclose(
        np.asarray(spmm(padded, x)), np.asarray(spmm(plain, x)), atol=1e-5
    )


def test_fused_bip_kernel_interpret_matches_xla():
    """The Pallas kernel (interpret mode on CPU) == two plain matmuls."""
    import jax

    from recommendar_systems_tpu.ops.fused_bip import fused_bip_matmul

    rng = np.random.default_rng(12)
    U, I, d = 512, 256, 64
    a = jnp.asarray(rng.normal(size=(U, I)).astype(np.float32))
    xu = jnp.asarray(rng.normal(size=(U, d)).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=(I, d)).astype(np.float32))
    top, bot = jax.jit(fused_bip_matmul)(a, xu, xi)
    # oracle with the same bf16-operand / f32-accumulate semantics the
    # kernel uses (mirroring XLA's default TPU matmul precision)
    ab = a.astype(jnp.bfloat16)
    oracle_top = jnp.matmul(ab, xi.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
    oracle_bot = jnp.matmul(ab.T, xu.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(top), np.asarray(oracle_top),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bot), np.asarray(oracle_bot),
                               rtol=1e-6, atol=1e-5)
    # and against the f32 product at bf16-rounding tolerance
    np.testing.assert_allclose(np.asarray(top), np.asarray(a @ xi),
                               rtol=2e-2, atol=0.3)

    # custom VJP: gradients flow to xu/xi and match the plain-matmul grads
    def loss_fused(xu, xi):
        t, b = fused_bip_matmul(a, xu, xi)
        return jnp.sum(t**2) + jnp.sum(b**2)

    def loss_plain(xu, xi):
        return jnp.sum((a @ xi) ** 2) + jnp.sum((a.T @ xu) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(xu, xi)
    gp = jax.grad(loss_plain, argnums=(0, 1))(xu, xi)
    for f, p in zip(gf, gp):
        f, p = np.asarray(f), np.asarray(p)
        scale = np.abs(p).max() + 1e-9
        assert np.abs(f - p).max() / scale < 2e-2  # bf16-operand rounding


def test_factored_densebip_matches_plain():
    """int8-count factored storage == plain dense values (exact separation
    of the 1/sqrt(deg_u*deg_i) normalization)."""
    from recommendar_systems_tpu.graph.build import build_norm_adj
    from recommendar_systems_tpu.graph.sparse import set_fused_bip, spmm

    rng = np.random.default_rng(13)
    n_users, n_items = 90, 50
    u = rng.integers(0, n_users, 600)
    i = rng.integers(0, n_items, 600)
    x = jnp.asarray(rng.normal(size=(n_users + n_items, 8)).astype(np.float32))
    plain = build_norm_adj(u, i, n_users, n_items, dense=True)
    try:
        set_fused_bip(True)
        fact = build_norm_adj(u, i, n_users, n_items, dense=True)
        nofact = build_norm_adj(u, i, n_users, n_items, dense=True,
                                factored=False)
    finally:
        set_fused_bip(False)
    assert fact.ur.dtype == jnp.int8 and fact.row_scale is not None
    ref = np.asarray(spmm(plain, x))
    np.testing.assert_allclose(np.asarray(spmm(fact, x)), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(spmm(nofact, x)), ref, atol=1e-5)


def test_ui_view_aliases_factored_block():
    """``ui_view`` of the factored adjacency == the dense R-hat builder:
    same normalization, shared int8 storage, exact user lift."""
    from recommendar_systems_tpu.graph.build import (
        build_norm_adj_and_r,
        build_norm_ui,
    )
    from recommendar_systems_tpu.graph.sparse import (
        DenseUI,
        set_fused_bip,
        spmm,
    )

    rng = np.random.default_rng(7)
    n_users, n_items = 70, 40
    u = rng.integers(0, n_users, 500)
    i = rng.integers(0, n_items, 500)
    x = jnp.asarray(rng.normal(size=(n_items, 8)).astype(np.float32))
    plain_r = build_norm_ui(u, i, n_users, n_items, dense=True)
    try:
        set_fused_bip(True)
        adj, r_hat = build_norm_adj_and_r(u, i, n_users, n_items, dense=True)
    finally:
        set_fused_bip(False)
    assert isinstance(r_hat, DenseUI)
    assert r_hat.mat is adj.ur  # one HBM buffer, not a copy
    np.testing.assert_allclose(
        np.asarray(spmm(r_hat, x)), np.asarray(spmm(plain_r, x)), atol=1e-5
    )


def test_masked_attention_kernel_interpret_matches_dense():
    """Fused masked attention (interpret mode) == dense masked softmax @ k,
    forward and gradients, incl. empty rows and multiplicity > 1."""
    import jax

    from recommendar_systems_tpu.ops.masked_attn import masked_attention

    rng = np.random.default_rng(7)
    U, I, c = 64, 256, 64
    q = jnp.asarray(rng.normal(size=(U, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(I, c)).astype(np.float32))
    m = (rng.random((U, I)) < 0.05).astype(np.float32)
    m[3] = 0.0  # empty row -> all-zero output row
    m[5, 10] = 3.0  # duplicate-edge multiplicity
    mask = jnp.asarray(m, dtype=jnp.bfloat16)

    def dense_ref(q, k, mask):
        qb = q.astype(jnp.bfloat16)
        kb = k.astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mf = mask.astype(jnp.float32)
        sm = jnp.where(mf > 0, s, -1e30)
        mx = jnp.max(sm, axis=1, keepdims=True)
        mx = jnp.where(mx > -5e29, mx, 0.0)
        e = mf * jnp.exp(sm - mx)
        p = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
        return jnp.matmul(p.astype(jnp.bfloat16), kb,
                          preferred_element_type=jnp.float32)

    out = jax.jit(masked_attention)(q, k, mask)
    ref = dense_ref(q, k, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)
    assert np.abs(np.asarray(out[3])).max() == 0.0

    def loss_fused(q, k):
        return jnp.sum(masked_attention(q, k, mask) ** 2)

    def loss_ref(q, k):
        return jnp.sum(dense_ref(q, k, mask) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(q, k)
    gr = jax.grad(loss_ref, argnums=(0, 1))(q, k)
    # the manual VJP formula is exact (checked to 4e-13 in f64); remaining
    # differences are bf16 rounding placement, so compare by relative norm
    for a, b in zip(gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert rel < 2e-2, f"relative grad error {rel}"


def test_masked_attention2_matches_two_singles():
    """Dual-modality masked attention (one mask stream) == two single
    calls, forward and full VJP, bounded and unbounded."""
    import jax

    from recommendar_systems_tpu.ops.masked_attn import (
        masked_attention,
        masked_attention2,
    )

    rng = np.random.default_rng(11)
    U, I, c = 64, 256, 32
    q1 = jnp.asarray(rng.normal(size=(U, c)).astype(np.float32))
    q2 = jnp.asarray(rng.normal(size=(U, c)).astype(np.float32))
    k1 = jnp.asarray(rng.normal(size=(I, c)).astype(np.float32))
    k2 = jnp.asarray(rng.normal(size=(I, c)).astype(np.float32))
    m = (rng.random((U, I)) < 0.05).astype(np.int8)
    m[3] = 0
    mask = jnp.asarray(m)

    for bounded in (False, True):
        o1, o2 = masked_attention2(q1, k1, q2, k2, mask, bounded)
        r1 = masked_attention(q1, k1, mask, bounded)
        r2 = masked_attention(q2, k2, mask, bounded)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(r1),
                                   rtol=2e-2, atol=2e-3)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(r2),
                                   rtol=2e-2, atol=2e-3)

        def loss2(q1, k1, q2, k2):
            a, b = masked_attention2(q1, k1, q2, k2, mask, bounded)
            return jnp.sum(a ** 2) + jnp.sum(b ** 3)

        def loss1(q1, k1, q2, k2):
            return (jnp.sum(masked_attention(q1, k1, mask, bounded) ** 2)
                    + jnp.sum(masked_attention(q2, k2, mask, bounded) ** 3))

        g2 = jax.grad(loss2, argnums=(0, 1, 2, 3))(q1, k1, q2, k2)
        g1 = jax.grad(loss1, argnums=(0, 1, 2, 3))(q1, k1, q2, k2)
        for a, b in zip(g2, g1):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
            assert rel < 1e-5, rel


def test_coo_to_densemat_matches_coo():
    """Jit-safe scatter densify (SMOREDiff soft-R fast path) is exact,
    including duplicate-edge accumulation."""
    import jax

    from recommendar_systems_tpu.graph.sparse import coo_to_densemat, spmm

    rng = np.random.default_rng(7)
    n_users, n_items = 23, 17
    u = rng.integers(0, n_users, 120)  # duplicates on purpose
    i = rng.integers(0, n_items, 120)
    order = np.lexsort((i, u))
    adj = COO(
        rows=jnp.asarray(u[order], jnp.int32),
        cols=jnp.asarray(i[order], jnp.int32),
        vals=jnp.asarray(rng.normal(size=120).astype(np.float32)[order]),
        n_rows=n_users,
        n_cols=n_items,
    )
    dense = jax.jit(coo_to_densemat)(adj)
    oracle = np.zeros((n_users, n_items), np.float64)
    np.add.at(oracle, (u, i), np.asarray(adj.vals, np.float64)[np.argsort(order)])
    np.testing.assert_allclose(np.asarray(dense.mat), oracle, atol=1e-5)
    x = jnp.asarray(rng.normal(size=(n_items, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm(dense, x)), np.asarray(spmm_coo(adj, x)), atol=1e-4
    )
