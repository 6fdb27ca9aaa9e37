"""Tests for MGCN / SMORE: spectral ops, fusion graph, end-to-end learning."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommendar_systems_tpu.data.arrays import build_data_bundle
from recommendar_systems_tpu.data.synthetic import generate_synthetic
from recommendar_systems_tpu.graph.sparse import ELL, ell_union_max, spmm_ell
from recommendar_systems_tpu.models import get_model
from recommendar_systems_tpu.ops.spectral import (
    haar_dwt1,
    haar_idwt1,
    spectral_filter,
)
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
    return score, valid, test, trainer, model, ctx


def test_spectral_filter_identity():
    # a unit filter (1 + 0j) must be the identity under ortho fft
    x = np.random.default_rng(0).normal(size=(5, 16)).astype(np.float32)
    w = np.zeros((1, 9, 2), np.float32)
    w[..., 0] = 1.0
    y = spectral_filter(jnp.asarray(x), jnp.asarray(w), normalize_weight=False)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-5)


def test_spectral_filter_unit_mag_preserves_energy():
    x = np.random.default_rng(1).normal(size=(4, 32)).astype(np.float32)
    w = np.random.default_rng(2).normal(size=(1, 17, 2)).astype(np.float32)
    y = spectral_filter(jnp.asarray(x), jnp.asarray(w), normalize_weight=True)
    # unit-modulus filter preserves interior-bin magnitudes; DC/Nyquist lose
    # their imaginary part when irfft forces a real signal (same in torch)
    ex = np.abs(np.fft.rfft(x, norm="ortho", axis=-1))[:, 1:-1]
    ey = np.abs(np.fft.rfft(np.asarray(y), norm="ortho", axis=-1))[:, 1:-1]
    np.testing.assert_allclose(ex, ey, rtol=1e-4, atol=1e-4)


def test_haar_roundtrip():
    x = np.random.default_rng(3).normal(size=(6, 20)).astype(np.float32)
    s, w = haar_dwt1(jnp.asarray(x))
    back = haar_idwt1(s, w, 20)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


def test_ell_union_max():
    a = ELL(jnp.asarray([[0, 1], [2, 0]]), jnp.asarray([[0.5, 0.3], [0.2, 0.9]]), 3)
    b = ELL(jnp.asarray([[1, 2], [2, 1]]), jnp.asarray([[0.7, 0.1], [0.6, 0.4]]), 3)
    u = ell_union_max(a, b)
    dense = np.zeros((2, 3))
    idx = np.asarray(u.idx)
    val = np.asarray(u.val)
    for r in range(2):
        for c in range(idx.shape[1]):
            dense[r, idx[r, c]] = max(dense[r, idx[r, c]], val[r, c])
    expected = np.array([[0.5, 0.7, 0.1], [0.9, 0.4, 0.6]])
    np.testing.assert_allclose(dense, expected)
    # spmm result equals dense union-max matmul
    x = np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32)
    got = np.asarray(spmm_ell(u, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected @ x, atol=1e-5)


def test_mgcn_learns(ds):
    score, valid, *_ = run_model(
        "MGCN", ds, epochs=8, reg_weight=1e-4, cl_loss=0.01
    )
    assert np.isfinite(score) and score > 0.30, valid


def test_smore_learns(ds):
    score, valid, test, trainer, model, ctx = run_model(
        "SMORE", ds, epochs=8, reg_weight=1e-5
    )
    assert np.isfinite(score) and score > 0.30, valid


def test_smore_with_mg(ds):
    # model-driven adaptive MG via mg.yaml layer
    score, valid, *_ = run_model(
        "SMORE", ds, epochs=4, mg=True, reg_weight=1e-5,
        mg_enable=True, mg_interval=2, mg_alpha=0.5, mg_beta=0.2,
    )
    assert np.isfinite(score) and score > 0.2, valid


def test_smore_diagnostics(ds):
    score, valid, test, trainer, model, ctx = run_model(
        "SMORE", ds, epochs=1, reg_weight=1e-5
    )
    diag = model.apply({"params": trainer.params}, ctx, method="diagnostics")
    assert 0.99 < float(
        diag["spec/image_lo"] + diag["spec/image_mid"] + diag["spec/image_hi"]
    ) < 1.01
    assert 0.0 <= float(diag["gate/gV_mean"]) <= 1.0


def test_matmul_dft_matches_jnp_fft():
    """The matmul-DFT path (axon FFT workaround) is exact vs jnp.fft."""
    from recommendar_systems_tpu.ops.spectral import irfft_ortho, rfft_ortho

    for d in (16, 63, 64):
        x = np.random.default_rng(d).normal(size=(9, d)).astype(np.float32)
        got = np.asarray(rfft_ortho(jnp.asarray(x)))
        ref = np.fft.rfft(x, axis=-1, norm="ortho")
        np.testing.assert_allclose(got, ref, atol=1e-4)
        back = np.asarray(irfft_ortho(jnp.asarray(ref.astype(np.complex64)), d))
        np.testing.assert_allclose(back, x, atol=1e-4)
