"""Golden-value regression tests.

Frozen 3-epoch results on a fixed synthetic dataset/seed.  Guards against
silent behavior drift in future refactors (loose tolerance absorbs
platform-level float noise; a real semantic change moves these by much
more).  Regenerate via the recipe in the module docstring of
tools/parity_check.py if a deliberate semantic change lands.
"""

import numpy as np
import pytest

from recommendar_systems_tpu.data.arrays import build_data_bundle
from recommendar_systems_tpu.data.synthetic import generate_synthetic
from recommendar_systems_tpu.models import get_model
from recommendar_systems_tpu.train.trainer import Trainer

from conftest import make_config

GOLDEN = {
    # model: (overrides, valid recall@20, valid ndcg@20, final epoch loss)
    "BPR": (dict(reg_weight=0.01), 0.5365, 0.2260, 5.5581),
    "LightGCN": (dict(n_layers=2, reg_weight=0.01), 0.6667, 0.2653, 5.4828),
    "FREEDOM": (dict(reg_weight=1e-4, dropout=0.8), 0.7312, 0.3675, 5.4110),
    "SMORE": (dict(reg_weight=1e-4, n_ui_layers=1, n_layers=1, knn_k=5,
                   cl_weight=0.01), 0.6792, 0.3220, 6.0437),
    "SMOREDiff": (dict(reg_weight=1e-4, n_ui_layers=1, n_layers=1, knn_k=5,
                       cl_weight=0.01), 0.6792, 0.2868, 5.9740),
    "GRCN": (dict(reg_weight=1e-4, learning_rate=0.001), 0.7844, 0.4499,
             3.4463),
    "MENTOR": (dict(), 0.8708, 0.4867, 29.6938),
    "MGCN": (dict(reg_weight=1e-4, cl_loss=0.01, knn_k=5), 0.7302, 0.3442,
             5.9340),
}


@pytest.fixture(scope="module")
def ds():
    return generate_synthetic(
        n_users=80, n_items=50, n_inter=1500, v_dim=16, t_dim=12, seed=42
    )


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden(name, ds):
    overrides, recall20, ndcg20, last_loss = GOLDEN[name]
    cfg = make_config(name, epochs=3, **overrides)
    for ax in cfg["hyper_parameters"]:
        v = cfg[ax]
        if isinstance(v, list) and v:
            cfg[ax] = v[0]
    data = build_data_bundle(ds, cfg)
    cls = get_model(name)
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)
    tr = Trainer(cfg, model, ctx, data)
    tr.init_state(123)
    score, valid, test = tr.fit(saved=False, verbose=False)
    assert valid["recall@20"] == pytest.approx(recall20, abs=2e-3)
    assert valid["ndcg@20"] == pytest.approx(ndcg20, abs=2e-3)
    assert list(tr.train_loss_dict.values())[-1] == pytest.approx(
        last_loss, rel=1e-3
    )
