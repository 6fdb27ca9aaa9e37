"""End-to-end tests for the SMORE variants: SMORE1, SMOREX, SMOREMG,
SMOREDiff, SMOREDiffX."""

import numpy as np
import pytest

from recommendar_systems_tpu.data.arrays import build_data_bundle
from recommendar_systems_tpu.data.dataset import RecDataset
from recommendar_systems_tpu.data.synthetic import generate_synthetic
from recommendar_systems_tpu.models import get_model
from recommendar_systems_tpu.train.trainer import Trainer

from conftest import make_config


@pytest.fixture(scope="module")
def ds():
    return generate_synthetic(
        n_users=120, n_items=60, n_inter=2400, v_dim=24, t_dim=16, seed=11
    )


def run_model(model_name, ds, epochs=6, **cfg_overrides):
    cfg = make_config(model_name, epochs=epochs, **cfg_overrides)
    for ax in cfg["hyper_parameters"]:
        v = cfg[ax]
        if isinstance(v, list) and v:
            cfg[ax] = v[0]
    data = build_data_bundle(ds, cfg)
    cls = get_model(model_name)
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)
    trainer = Trainer(cfg, model, ctx, data, mg=False)
    trainer.init_state(1)
    score, valid, test = trainer.fit(saved=False, verbose=False)
    return score, valid, test, trainer


def test_smore1_both_modalities(ds):
    score, valid, *_ = run_model("SMORE1", ds, epochs=6)
    assert np.isfinite(score) and score > 0.30, valid


def test_smore1_image_only(ds):
    ds_v = RecDataset(
        n_users=ds.n_users, n_items=ds.n_items, splits=ds.splits,
        v_feat=ds.v_feat, t_feat=None, dataset_name="synthetic",
    )
    score, valid, *_ = run_model("SMORE1", ds_v, epochs=4)
    assert np.isfinite(score) and score > 0.2, valid


@pytest.mark.parametrize("method", ["fft", "dwt", "wiener"])
def test_smorex_methods(ds, method):
    score, valid, *_ = run_model(
        "SMOREX", ds, epochs=4, spec_method=method, wiener_alpha=0.5
    )
    assert np.isfinite(score) and score > 0.25, (method, valid)


def test_smoremg_learns(ds):
    score, valid, test, tr = run_model(
        "SMOREMG", ds, epochs=6,
        freq_consistency_weight=0.1, mg_consistency_weight=0.1,
    )
    assert np.isfinite(score) and score > 0.30, valid
    # diagnostics export works
    model = tr.model
    diag = model.apply(
        {"params": tr.params}, tr.ctx, method="export_diagnostics"
    )
    assert diag["image_band_energy"].shape[0] == 64 // 2 + 1


def test_smorediff_learns(ds):
    score, valid, *_ = run_model(
        "SMOREDiff", ds, epochs=6, use_diffusion_mvp=True, edge_nce_lambda=0.2
    )
    assert np.isfinite(score) and score > 0.30, valid


def test_smorediffx_learns(ds):
    score, valid, test, tr = run_model("SMOREDiffX", ds, epochs=6)
    assert np.isfinite(score) and score > 0.25, valid
    # EMA state exists and was threaded through training
    assert tr.has_net_state
    assert "softR_ema" in jax_tree_keys(tr.net_state)


def test_smorediffx_dense_state_matches_per_edge(ds):
    """The DENSE renorm/EMA state (TPU fast path, engaged under fused_bip)
    reproduces the exact (nnz,) per-edge formulation: same elementwise f32
    math, off-edge entries identically 0."""
    from recommendar_systems_tpu.graph import sparse as gs

    score_edge, valid_edge, *_ = run_model("SMOREDiffX", ds, epochs=3)
    gs.set_fused_bip(True)
    try:
        score_dense, valid_dense, _, tr = run_model(
            "SMOREDiffX", ds, epochs=3
        )
        # state buffer is the padded dense block now
        leaves = {}

        def walk(d, pre=""):
            for k, v in d.items():
                if hasattr(v, "items"):
                    walk(v, pre + k + "/")
                else:
                    leaves[pre + k] = v

        walk(tr.net_state)
        ema = next(v for k, v in leaves.items() if k.endswith("softR_ema"))
        assert ema.ndim == 2, ema.shape
    finally:
        gs.set_fused_bip(False)
    # same data, same seed, same math -> near-identical trajectories
    assert abs(score_dense - score_edge) < 5e-3, (score_dense, score_edge)


def test_smorediffx_dense_state_under_mesh(ds):
    """The dense [Up, Ip] renorm/EMA state composes with the ('data',
    'model') mesh (threaded through the sharded scan carry)."""
    from recommendar_systems_tpu.graph import sparse as gs

    gs.set_fused_bip(True)
    try:
        score, valid, *_ = run_model(
            "SMOREDiffX", ds, epochs=2,
            mesh_shape=[4, 2], shard_embedding_tables=True,
        )
        assert np.isfinite(score), valid
    finally:
        gs.set_fused_bip(False)


def jax_tree_keys(tree):
    keys = set()

    def walk(d):
        if hasattr(d, "items"):
            for k, v in d.items():
                keys.add(k)
                walk(v)

    walk(tree)
    return keys


def test_edge_user_pools_vectorized_matches_loop():
    """The vectorized hard-negative pool builder must be BIT-IDENTICAL to
    the reference-order Python loop it replaced (the loop is the oracle
    here; its order/cap semantics mirror smorediff.py:155-177)."""
    import numpy as np

    from recommendar_systems_tpu.models.smorediff import _edge_user_pools

    rng = np.random.default_rng(7)
    for trial, (n_users, n_items, nnz, L0, cap) in enumerate([
        (40, 60, 300, 5, 8),
        (25, 30, 200, 3, 4),
        (10, 500, 80, 50, 20),
        (17, 12, 60, 4, 1000),   # cap never reached
        (8, 9, 0, 4, 8),         # no interactions
        (30, 40, 250, 50, 12),   # L0 wider than the kNN matrix
    ]):
        if nnz:
            u = rng.integers(0, n_users, nnz)
            i = rng.integers(0, n_items, nnz)
            keys = np.unique(u.astype(np.int64) * n_items + i)
            pu, pi = keys // n_items, keys % n_items
        else:
            pu = pi = np.zeros(0, np.int64)
        indptr = np.zeros(n_users + 1, np.int64)
        np.cumsum(np.bincount(pu, minlength=n_users), out=indptr[1:])
        pos_sorted = pi.astype(np.int64)
        knn_sorted = rng.integers(0, n_items, size=(n_items, min(max(L0, 2), 6)))

        # oracle: the original loop
        pos_sets = [set(pos_sorted[indptr[x]: indptr[x + 1]].tolist())
                    for x in range(n_users)]
        expect = []
        for x in range(n_users):
            cands, seen = [], set()
            for ip in pos_sorted[indptr[x]: indptr[x + 1]]:
                for j in knn_sorted[ip, :L0]:
                    j = int(j)
                    if j not in pos_sets[x] and j not in seen:
                        seen.add(j)
                        cands.append(j)
                if len(cands) >= cap:
                    break
            expect.append(cands)

        got = _edge_user_pools(indptr, pos_sorted, knn_sorted, L0, cap,
                               n_items)
        assert got == expect, f"trial {trial}: mismatch"
