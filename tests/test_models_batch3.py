"""End-to-end tests: LATTICE, LGMRec, PGL (+ randomized SVD op)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommendar_systems_tpu.data.arrays import build_data_bundle
from recommendar_systems_tpu.data.synthetic import generate_synthetic
from recommendar_systems_tpu.models import get_model
from recommendar_systems_tpu.ops.svd import randomized_svd
from recommendar_systems_tpu.train.trainer import Trainer

from conftest import make_config


@pytest.fixture(scope="module")
def ds():
    return generate_synthetic(
        n_users=120, n_items=60, n_inter=2400, v_dim=24, t_dim=16, seed=11
    )


def run_model(model_name, ds, epochs=8, **cfg_overrides):
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


def test_randomized_svd_accuracy():
    rng = np.random.default_rng(0)
    A = (rng.normal(size=(50, 40)) @ np.diag(np.linspace(5, 0.1, 40))).astype(
        np.float32
    )
    Aj = jnp.asarray(A)
    u, s, v = randomized_svd(
        lambda x: Aj @ x, lambda y: Aj.T @ y, 50, 40, k=10, n_iter=6
    )
    s_true = np.linalg.svd(A, compute_uv=False)[:10]
    np.testing.assert_allclose(np.asarray(s), s_true, rtol=1e-2)
    # reconstruction of the top-k subspace
    approx = np.asarray(u) @ np.diag(np.asarray(s)) @ np.asarray(v).T
    best = (
        np.linalg.svd(A, full_matrices=False)[0][:, :10]
        @ np.diag(s_true)
        @ np.linalg.svd(A, full_matrices=False)[2][:10]
    )
    assert np.linalg.norm(approx - best) / np.linalg.norm(best) < 0.05


def test_lattice_learns(ds):
    score, valid, *_ = run_model(
        "LATTICE", ds, epochs=8, reg_weight=1e-5, learning_rate=0.001
    )
    assert np.isfinite(score) and score > 0.30, valid


def test_lgmrec_learns(ds):
    score, valid, *_ = run_model("LGMRec", ds, epochs=8)
    assert np.isfinite(score) and score > 0.30, valid


def test_pgl_local_learns(ds):
    score, valid, *_ = run_model("PGL", ds, epochs=8, mode="local", reg_weight=0.01)
    assert np.isfinite(score) and score > 0.25, valid


def test_pgl_global_runs(ds):
    score, valid, *_ = run_model("PGL", ds, epochs=3, mode="global", reg_weight=0.01)
    assert np.isfinite(score) and score > 0.1, valid
