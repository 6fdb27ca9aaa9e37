"""Opt-in approx-MIPS offline eval (``eval_approx=true``).

Pins the VERDICT r4 item-1 contract: the trainer's evaluator can rank with
the serving path's ``lax.approx_max_k`` + seen-membership postfilter
(`serve/engine.py`, ~22x faster than exact masked top-k at [256, 1M] —
tools/probe_serving_1m.py) while (a) keeping top-k overlap >= 0.95 vs the
exact reference-parity path (`/root/reference/src/common/trainer.py:519-527`)
and (b) keeping metric deltas inside seed noise. Default stays OFF.
"""

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
        n_users=400, n_items=300, n_inter=9000, v_dim=24, t_dim=16, seed=11
    )


def _fit(ds, model_name="LightGCN", **over):
    over = {"epochs": 4, "n_layers": 2, **over}
    cfg = make_config(model_name, **over)
    for ax in cfg["hyper_parameters"]:
        if isinstance(cfg[ax], list) and cfg[ax]:
            cfg[ax] = cfg[ax][0]
    data = build_data_bundle(ds, cfg)
    cls = get_model(model_name)
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)
    trainer = Trainer(cfg, model, ctx, data)
    trainer.init_state(5)
    trainer.fit(saved=False, verbose=False)
    return trainer, data


@pytest.fixture(scope="module")
def fitted(ds):
    return _fit(ds)


def _topk_all(trainer, bundle, approx: bool):
    old = trainer.eval_approx
    trainer.eval_approx = approx
    try:
        topk = trainer._eval_pass_fn(bundle)()
    finally:
        trainer.eval_approx = old
    t = np.asarray(topk)
    return np.concatenate(
        [t[b, : bundle.n_valid[b]] for b in range(bundle.n_batches)], axis=0)


def test_overlap_vs_exact_above_95(fitted):
    trainer, data = fitted
    bundle = data.valid_eval
    exact = _topk_all(trainer, bundle, approx=False)
    approx = _topk_all(trainer, bundle, approx=True)
    k = exact.shape[1]
    overlap = np.mean([
        len(np.intersect1d(exact[r], approx[r])) / k
        for r in range(exact.shape[0])
    ])
    assert overlap >= 0.95, overlap


def test_seen_items_excluded(fitted):
    trainer, data = fitted
    bundle = data.valid_eval
    approx = _topk_all(trainer, bundle, approx=True)
    indptr = np.asarray(data.pos_indptr)
    pos = np.asarray(data.pos_items)
    users = np.concatenate([
        np.asarray(bundle.users[b])[: bundle.n_valid[b]]
        for b in range(bundle.n_batches)
    ])
    for r, u in enumerate(users):
        seen = pos[indptr[u]: indptr[u + 1]]
        assert not np.intersect1d(approx[r], seen).size


def test_metrics_within_noise(fitted):
    trainer, data = fitted
    exact = trainer.evaluate(data.valid_eval)
    trainer.eval_approx = True
    try:
        approx = trainer.evaluate(data.valid_eval)
    finally:
        trainer.eval_approx = False
    assert set(exact) == set(approx)
    for key in exact:
        assert abs(exact[key] - approx[key]) < 0.01, (key, exact[key],
                                                      approx[key])


def test_config_knob_roundtrip(ds):
    """eval_approx=true through the config surface end to end (fit + the
    periodic evaluate calls inside fit ride the approx path)."""
    trainer, data = _fit(ds, epochs=2, eval_approx=True)
    assert trainer.eval_approx
    res = trainer.evaluate(data.valid_eval)
    assert np.isfinite(list(res.values())).all()


def test_scan_path_non_cached_model(ds):
    """Models without eval_embeddings (full_scores scan path) rank through
    _eval_scan_approx_impl."""
    trainer, data = _fit(ds, model_name="VBPR", epochs=2)
    use_cached = getattr(type(trainer.model), "has_eval_embeddings", False)
    bundle = data.valid_eval
    exact = _topk_all(trainer, bundle, approx=False) if use_cached else None
    trainer.eval_approx = True
    try:
        res = trainer.evaluate(bundle)
    finally:
        trainer.eval_approx = False
    assert np.isfinite(list(res.values())).all()


def test_masked_variant_matches_exact(fitted):
    """The heavy-tail formulation (_eval_cached_amask_impl: the exact
    path's COO-mask -1e10 scatter + approx_max_k ranking) must agree with
    the exact path on CPU (where approx_max_k is exact) — exclusion
    exactness is structural."""
    trainer, data = fitted
    bundle = data.valid_eval
    exact = _topk_all(trainer, bundle, approx=False)
    topk = trainer._eval_cached_amask_jit(
        trainer.params, trainer.net_state, trainer.ctx,
        bundle.users, bundle.mask_rows, bundle.mask_items)
    t = np.asarray(topk)
    masked = np.concatenate(
        [t[b, : bundle.n_valid[b]] for b in range(bundle.n_batches)], axis=0)
    k = exact.shape[1]
    overlap = np.mean([
        len(np.intersect1d(exact[r], masked[r])) / k
        for r in range(exact.shape[0])
    ])
    assert overlap >= 0.95, overlap
    # exclusion is exact by construction
    indptr = np.asarray(data.pos_indptr)
    pos = np.asarray(data.pos_items)
    users = np.concatenate([
        np.asarray(bundle.users[b])[: bundle.n_valid[b]]
        for b in range(bundle.n_batches)
    ])
    for r, u in enumerate(users):
        s = pos[indptr[u]: indptr[u + 1]]
        assert not np.intersect1d(masked[r], s).size


def test_sharded_approx_eval(ds):
    """approx eval composes with the ('data','model') mesh via the
    distributed approx top-k (ops/topk.py)."""
    trainer, data = _fit(
        ds, epochs=2, mesh_shape=[2, 4], shard_embedding_tables=True)
    bundle = data.valid_eval
    exact = _topk_all(trainer, bundle, approx=False)
    approx = _topk_all(trainer, bundle, approx=True)
    k = exact.shape[1]
    overlap = np.mean([
        len(np.intersect1d(exact[r], approx[r])) / k
        for r in range(exact.shape[0])
    ])
    assert overlap >= 0.9, overlap
