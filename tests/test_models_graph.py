"""End-to-end tests for the graph/multimodal model batch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommendar_systems_tpu.data.arrays import build_data_bundle
from recommendar_systems_tpu.data.synthetic import generate_synthetic
from recommendar_systems_tpu.models import get_model
from recommendar_systems_tpu.train.trainer import Trainer

from conftest import make_config


@pytest.fixture(scope="module")
def ds():
    return generate_synthetic(
        n_users=120, n_items=60, n_inter=2400, v_dim=24, t_dim=16, seed=11
    )


def run_model(model_name, ds, epochs=6, mg=False, **cfg_overrides):
    cfg = make_config(model_name, epochs=epochs, **cfg_overrides)
    for ax in cfg["hyper_parameters"]:
        v = cfg[ax]
        if isinstance(v, list) and v:
            cfg[ax] = v[0]
    data = build_data_bundle(ds, cfg)
    cls = get_model(model_name)
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)
    trainer = Trainer(cfg, model, ctx, data, mg=mg)
    trainer.init_state(1)
    score, valid, test = trainer.fit(saved=False, verbose=False)
    return score, valid, test, trainer


def test_freedom_learns(ds):
    score, valid, test, tr = run_model(
        "FREEDOM", ds, epochs=8, reg_weight=1e-5, dropout=0.8
    )
    assert np.isfinite(score) and score > 0.30, valid
    losses = list(tr.train_loss_dict.values())
    assert losses[-1] < losses[0]


def _sparse_ctx(cls, cfg, data):
    """Build ctx with densification off (these tests inspect COO slots)."""
    from recommendar_systems_tpu.graph import sparse as S

    thresh = S._DENSE_THRESHOLD
    try:
        S.set_dense_threshold(0)
        return cls.build_ctx(cfg, data)
    finally:
        S.set_dense_threshold(thresh)


def test_freedom_edge_dropout_changes_adj(ds):
    cfg = make_config("FREEDOM", epochs=1, reg_weight=1e-5, dropout=0.8)
    data = build_data_bundle(ds, cfg)
    cls = get_model("FREEDOM")
    model = cls.from_config(cfg, data)
    ctx = _sparse_ctx(cls, cfg, data)
    import jax

    cfg_d = dict(cfg.final_config)
    cfg_d["__n_users__"] = data.n_users
    cfg_d["__n_items__"] = data.n_items
    ctx2 = cls.pre_epoch(ctx, jax.random.key(0), cfg_d)
    v0 = np.asarray(ctx["masked_adj"].vals)
    v1 = np.asarray(ctx2["masked_adj"].vals)
    # ~80% of symmetric slots zeroed
    frac_zero = (v1 == 0).mean()
    assert 0.7 < frac_zero < 0.9, frac_zero
    assert not np.allclose(v0, v1)
    # kept subgraph renormalized: each kept edge value is 1/sqrt(du'*di')
    assert np.isfinite(v1).all()


def test_bm3_learns(ds):
    score, valid, test, tr = run_model(
        "BM3", ds, epochs=8, n_layers=1, reg_weight=0.1, dropout=0.3
    )
    assert np.isfinite(score) and score > 0.25, valid


def test_layergcn_learns(ds):
    score, valid, test, tr = run_model(
        "LayerGCN", ds, epochs=8, n_layers=2, reg_weight=1e-3, dropout=0.1
    )
    assert np.isfinite(score) and score > 0.30, valid


def test_selfcfed_learns(ds):
    score, valid, test, tr = run_model(
        "SELFCFED_LGN", ds, epochs=10, n_layers=2, reg_weight=0.01, dropout=0.1
    )
    assert np.isfinite(score) and score > 0.15, valid


def test_itemknncbf_no_training(ds):
    score, valid, test, tr = run_model("ItemKNNCBF", ds, epochs=3)
    # content kNN on community features must beat random
    assert score > 0.25, valid
    # no training happened
    assert all(v == 0.0 for v in tr.train_loss_dict.values())


def test_freedom_dropout_degree_bias(ds):
    """Degree-weighted edge dropout keeps high-value (low-degree-endpoint)
    edges more often (reference freedom.py:135 multinomial on edge values)."""
    import jax

    cfg = make_config("FREEDOM", epochs=1, reg_weight=1e-5, dropout=0.5)
    data = build_data_bundle(ds, cfg)
    cls = get_model("FREEDOM")
    ctx = _sparse_ctx(cls, cfg, data)
    cfg_d = dict(cfg.final_config)
    cfg_d["__n_users__"] = data.n_users
    cfg_d["__n_items__"] = data.n_items
    w = np.asarray(ctx["edge_values"])
    E = len(w)
    keep_counts = np.zeros(E)
    for t in range(30):
        ctx2 = cls.pre_epoch(ctx, jax.random.key(t), cfg_d)
        # recover the per-ui-edge keep mask from the symmetric values
        sym_vals = np.asarray(ctx2["masked_adj"].vals)
        inv = np.empty_like(np.asarray(ctx["sym_perm"]))
        inv[np.asarray(ctx["sym_perm"])] = np.arange(2 * E)
        kept = sym_vals[inv[:E]] > 0
        keep_counts += kept
    top = w >= np.median(w)
    # Gumbel-top-k with log-weight keys keeps heavier edges more often
    assert keep_counts[top].mean() > keep_counts[~top].mean() + 1


def test_grcn_dense_equals_sparse():
    """Dense masked-softmax attention == per-edge segment softmax (loss+grad)."""
    from jax.flatten_util import ravel_pytree
    from recommendar_systems_tpu.graph import sparse as S

    ds = generate_synthetic(
        n_users=60, n_items=40, n_inter=900, v_dim=12, t_dim=10, seed=5
    )
    cfg = make_config("GRCN", epochs=1)
    for ax in cfg["hyper_parameters"]:
        v = cfg[ax]
        if isinstance(v, list) and v:
            cfg[ax] = v[0]
    data = build_data_bundle(ds, cfg)
    cls = get_model("GRCN")
    model = cls.from_config(cfg, data)
    thresh = S._DENSE_THRESHOLD
    try:
        S.set_dense_threshold(0)
        ctx_sp = cls.build_ctx(cfg, data)
        S.set_dense_threshold(int(1.5e9))
        ctx_dn = cls.build_ctx(cfg, data)
    finally:
        S.set_dense_threshold(thresh)
    assert "mask_ui" in ctx_dn and "mask_ui" not in ctx_sp
    batch = {
        "users": jnp.asarray([0, 3, 5, 7]),
        "pos_items": jnp.asarray([1, 2, 3, 4]),
        "neg_items": jnp.asarray([9, 8, 7, 6]),
        "weight": jnp.ones(4),
    }
    params = model.init(jax.random.key(0), ctx_sp, batch, True, method="loss")[
        "params"
    ]

    def loss_of(ctx):
        return lambda p: model.apply({"params": p}, ctx, batch, True, method="loss")[0]

    np.testing.assert_allclose(
        float(loss_of(ctx_sp)(params)), float(loss_of(ctx_dn)(params)), rtol=2e-5
    )
    fa, _ = ravel_pytree(jax.grad(loss_of(ctx_sp))(params))
    fb, _ = ravel_pytree(jax.grad(loss_of(ctx_dn))(params))
    assert float(jnp.max(jnp.abs(fa - fb))) < 3e-5


def test_freedom_dense_masked_adj_equals_sparse(ds):
    """Per-epoch dense masked DenseBip == COO masked adjacency propagation."""
    from recommendar_systems_tpu.graph import sparse as S
    from recommendar_systems_tpu.graph.sparse import spmm

    cfg = make_config("FREEDOM", epochs=1, reg_weight=1e-5, dropout=0.4)
    data = build_data_bundle(ds, cfg)
    cls = get_model("FREEDOM")
    ctx_sp = _sparse_ctx(cls, cfg, data)
    thresh = S._DENSE_THRESHOLD
    try:
        S.set_dense_threshold(int(1.5e9))
        ctx_dn = cls.build_ctx(cfg, data)
    finally:
        S.set_dense_threshold(thresh)
    assert ctx_dn["sym_perm"] is None and ctx_sp["sym_perm"] is not None
    cfg_d = dict(cfg.final_config)
    cfg_d["__n_users__"] = data.n_users
    cfg_d["__n_items__"] = data.n_items
    ctx_sp2 = cls.pre_epoch(ctx_sp, jax.random.key(3), cfg_d)
    ctx_dn2 = cls.pre_epoch(ctx_dn, jax.random.key(3), cfg_d)
    n = data.n_users + data.n_items
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, 8)).astype(np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(spmm(ctx_dn2["masked_adj"], x)),
        np.asarray(spmm(ctx_sp2["masked_adj"], x)),
        atol=1e-5,
    )


def test_grcn_fused_attn_padded_equals_plain():
    """Tile-padded fused-attention layout == plain dense path (loss + grads,
    bf16-rounding tolerance — the kernel feeds the MXU bf16 operands)."""
    from jax.flatten_util import ravel_pytree
    from recommendar_systems_tpu.ops import masked_attn as MA

    ds = generate_synthetic(
        n_users=60, n_items=40, n_inter=900, v_dim=12, t_dim=10, seed=5
    )
    cfg = make_config("GRCN", epochs=1)
    for ax in cfg["hyper_parameters"]:
        v = cfg[ax]
        if isinstance(v, list) and v:
            cfg[ax] = v[0]
    data = build_data_bundle(ds, cfg)
    cls = get_model("GRCN")
    model = cls.from_config(cfg, data)
    try:
        MA.set_fused_attn(True)
        ctx_fa = cls.build_ctx(cfg, data)
    finally:
        MA.set_fused_attn(False)
    ctx_dn = cls.build_ctx(cfg, data)
    assert "dims_pad" in ctx_fa and "dims_pad" not in ctx_dn
    assert ctx_fa["mask_ui"].shape == (256, 128)
    batch = {
        "users": jnp.asarray([0, 3, 5, 7]),
        "pos_items": jnp.asarray([1, 2, 3, 4]),
        "neg_items": jnp.asarray([9, 8, 7, 6]),
        "weight": jnp.ones(4),
    }
    params = model.init(jax.random.key(0), ctx_dn, batch, True, method="loss")[
        "params"
    ]

    def loss_of(ctx):
        return lambda p: model.apply({"params": p}, ctx, batch, True, method="loss")[0]

    l_plain = float(loss_of(ctx_dn)(params))
    l_fused = float(loss_of(ctx_fa)(params))
    assert abs(l_fused - l_plain) / abs(l_plain) < 1e-2, (l_fused, l_plain)
    fa, _ = ravel_pytree(jax.grad(loss_of(ctx_fa))(params))
    fb, _ = ravel_pytree(jax.grad(loss_of(ctx_dn))(params))
    rel = float(jnp.linalg.norm(fa - fb) / jnp.linalg.norm(fb))
    assert rel < 2e-2, rel
