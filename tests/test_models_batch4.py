"""End-to-end tests: MMGCN, DualGNN, GRCN, MVGAE, DRAGON, MENTOR,
LightGCNCLIP, SLMRec, TEST — the final model batch."""

import numpy as np
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


CASES = [
    ("MMGCN", dict(reg_weight=1e-4, learning_rate=0.001), 0.15),
    ("DualGNN", dict(reg_weight=0.001, learning_rate=0.001), 0.2),
    ("GRCN", dict(reg_weight=1e-4, learning_rate=0.001), 0.2),
    ("MVGAE", dict(learning_rate=0.001, beta=0.1), 0.05),
    ("DRAGON", dict(reg_weight=0.001, learning_rate=0.001), 0.2),
    ("MENTOR", dict(), 0.2),
    ("LightGCNCLIP", dict(), 0.3),
    ("SLMRec", dict(learning_rate=0.001, ssl_alpha=0.01, ssl_temp=0.1), 0.2),
    ("TEST", dict(reg_weight=1e-5, dropout=0.8), 0.3),
]


@pytest.mark.parametrize("name,overrides,floor", CASES)
def test_model_learns(name, overrides, floor, ds):
    score, valid, test, tr = run_model(name, ds, epochs=8, **overrides)
    assert np.isfinite(score), (name, valid)
    assert score > floor, (name, valid)


def test_slmrec_fm_task(ds):
    score, *_ = run_model(
        "SLMRec", ds, epochs=3, ssl_task="FM", learning_rate=0.001,
        ssl_alpha=0.05, ssl_temp=0.1,
    )
    assert np.isfinite(score) and score > 0.1


def test_slmrec_fd_task(ds):
    score, *_ = run_model(
        "SLMRec", ds, epochs=3, ssl_task="FD", learning_rate=0.001,
        ssl_alpha=0.05, ssl_temp=0.1,
    )
    assert np.isfinite(score) and score > 0.1
