"""End-to-end tests for the first model slice: BPR, VBPR, LightGCN.

Each model trains briefly on the synthetic community dataset and must (a)
produce finite losses, (b) beat random-ranking recall@20 after a few epochs
— the golden-value strategy SURVEY.md §4 prescribes in place of the
reference's (nonexistent) test suite.
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
        n_users=120, n_items=60, n_inter=2400, v_dim=24, t_dim=16, seed=11
    )


def run_model(model_name, ds, epochs=8, mg=False, **cfg_overrides):
    cfg = make_config(model_name, epochs=epochs, **cfg_overrides)
    data = build_data_bundle(ds, cfg)
    cls = get_model(model_name)
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)
    trainer = Trainer(cfg, model, ctx, data, mg=mg)
    trainer.init_state(1)
    score, valid, test = trainer.fit(saved=False, verbose=False)
    return score, valid, test, trainer


@pytest.mark.parametrize("name", ["BPR", "VBPR", "LightGCN"])
def test_model_learns(name, ds):
    score, valid, test, trainer = run_model(name, ds, reg_weight=0.001, n_layers=2)
    # random ranking recall@20 ~ 20/60 = 0.33; community structure should beat it
    assert np.isfinite(score)
    assert score > 0.30, (name, valid)
    losses = list(trainer.train_loss_dict.values())
    assert losses[-1] < losses[0], "loss should decrease"


def test_trainer_level_mg_runs(ds):
    score, valid, test, trainer = run_model(
        "BPR", ds, epochs=3, mg=True, reg_weight=0.001
    )
    assert np.isfinite(score)


def test_checkpoint_roundtrip(tmp_path, ds):
    cfg = make_config("BPR", epochs=2, reg_weight=0.001,
                      checkpoint_dir=str(tmp_path))
    data = build_data_bundle(ds, cfg)
    cls = get_model("BPR")
    model = cls.from_config(cfg, data)
    trainer = Trainer(cfg, model, {}, data)
    trainer.init_state(1)
    trainer.fit(saved=True, verbose=False)
    # restoring the best checkpoint must reproduce the recorded best test result
    trainer.load_checkpoint()
    after = trainer.evaluate(data.test_eval)
    assert after == trainer.best_test_upon_valid


def test_full_checkpoint_resume(tmp_path, ds):
    """Orbax checkpoint + exact resume reproduces training state."""
    cfg = make_config(
        "BPR", epochs=3, reg_weight=0.001,
        checkpoint_dir=str(tmp_path), save_full_checkpoints=True,
        checkpoint_every=1,
    )
    data = build_data_bundle(ds, cfg)
    cls = get_model("BPR")
    model = cls.from_config(cfg, data)
    trainer = Trainer(cfg, model, {}, data)
    trainer.init_state(1)
    trainer.fit(saved=False, verbose=False)

    cfg2 = make_config(
        "BPR", epochs=5, reg_weight=0.001,
        checkpoint_dir=str(tmp_path), save_full_checkpoints=True,
        checkpoint_every=1, resume=True,
    )
    model2 = cls.from_config(cfg2, data)
    trainer2 = Trainer(cfg2, model2, {}, data)
    trainer2.init_state(99)  # different seed; resume must override params
    score, valid, test = trainer2.fit(saved=False, verbose=False)
    assert np.isfinite(score)
    # resumed training continued from epoch 3 (only 2 more epochs recorded)
    assert set(trainer2.train_loss_dict) == {3, 4}


def test_neighborhood_sampling_batch_keys(ds):
    """use_neighborhood_loss adds valid pos/neg neighborhood samples
    (reference dataloader.py:277-305)."""
    score, valid, test, trainer = run_model(
        "BPR", ds, epochs=2, reg_weight=0.001, use_neighborhood_loss=True
    )
    assert np.isfinite(score)
    assert trainer._nbr is not None


def test_determinism_same_seed(ds):
    """Same seed => bit-identical training trajectory (the reference's
    determinism hooks, SURVEY.md §4)."""
    r1 = run_model("BPR", ds, epochs=3, reg_weight=0.001)
    r2 = run_model("BPR", ds, epochs=3, reg_weight=0.001)
    assert r1[1] == r2[1]  # identical valid metric dicts
    assert list(r1[3].train_loss_dict.values()) == list(r2[3].train_loss_dict.values())


def test_bf16_propagation_trains(ds):
    score, valid, test, tr = run_model(
        "LightGCN", ds, epochs=4, n_layers=2, reg_weight=0.001,
        compute_dtype="bfloat16",
    )
    assert np.isfinite(score) and score > 0.3, valid


def test_predict_pairwise(ds):
    """predict() pairwise API (reference abstract_recommender.py:30-39)."""
    import jax.numpy as jnp

    score, valid, test, tr = run_model("BPR", ds, epochs=2, reg_weight=0.001)
    users = jnp.asarray([0, 1, 2])
    items = jnp.asarray([3, 4, 5])
    p = tr.model.apply({"params": tr.params}, {}, users, items, method="predict")
    ue, ie = tr.model.apply({"params": tr.params}, {}, method="eval_embeddings")
    expected = (np.asarray(ue)[np.asarray(users)] * np.asarray(ie)[np.asarray(items)]).sum(-1)
    np.testing.assert_allclose(np.asarray(p), expected, rtol=1e-5, atol=1e-7)


def _opt_count(tr):
    # optax InjectHyperparamsState holds its own update counter
    return int(np.asarray(tr.opt_state.count))


def test_trainer_mg_double_updates(ds):
    """Trainer-level MG performs 2 optimizer updates every `beta` steps
    (reference trainer.py:207-224)."""
    score, valid, test, tr = run_model(
        "BPR", ds, epochs=1, mg=True, reg_weight=0.001, beta=2,
        alpha1=1.0, alpha2=0.2,
    )
    n_steps = tr.n_steps
    expected = n_steps + (n_steps + 1) // 2  # step_id % 2 == 0 -> extra update
    assert _opt_count(tr) == expected, (_opt_count(tr), expected)


def test_model_mg_extra_updates(ds):
    """Model-driven MG adds one anti-mirror update every mg_interval steps
    (reference trainer.py:268-348)."""
    score, valid, test, tr = run_model(
        "BPR", ds, epochs=1, reg_weight=0.001,
        mg_enable=True, mg_interval=3, mg_alpha=0.5, mg_beta=0.2,
    )
    n_steps = tr.n_steps
    expected = n_steps + n_steps // 3  # (step+1) % 3 == 0
    assert _opt_count(tr) == expected, (_opt_count(tr), expected)
