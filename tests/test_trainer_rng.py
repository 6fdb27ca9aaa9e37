"""Trainer invariants: dispatch-chunking RNG stability, padded distributed
top-k at indivisible catalog sizes, and model diagnostics landing in the
JSONL scalar log (VERDICT round-1 items 4, 7, 8)."""

import json
import glob

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommendar_systems_tpu.data.arrays import build_data_bundle
from recommendar_systems_tpu.data.synthetic import generate_synthetic
from recommendar_systems_tpu.models import get_model
from recommendar_systems_tpu.parallel.mesh import make_mesh
from recommendar_systems_tpu.train.trainer import Trainer

from conftest import make_config


@pytest.fixture(scope="module")
def ds():
    return generate_synthetic(
        n_users=100, n_items=64, n_inter=2000, v_dim=16, t_dim=16, seed=6
    )


def _train(ds, model_name="BPR", epochs=2, **cfg_overrides):
    cfg = make_config(model_name, epochs=epochs, reg_weight=0.001,
                      **cfg_overrides)
    data = build_data_bundle(ds, cfg)
    cls = get_model(model_name)
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)
    trainer = Trainer(cfg, model, ctx, data, mg=False)
    trainer.init_state(7)
    trainer.fit(saved=False, verbose=False)
    return trainer


def test_steps_per_dispatch_rng_invariant(ds):
    """Per-step keys fold (epoch key, step id), so chunked dispatches replay
    the exact monolithic trajectory — same seed => identical params."""
    t_mono = _train(ds, steps_per_dispatch=0)
    t_chunk = _train(ds, steps_per_dispatch=3)
    flat_m, _ = jax.tree_util.tree_flatten(t_mono.params)
    flat_c, _ = jax.tree_util.tree_flatten(t_chunk.params)
    for a, b in zip(flat_m, flat_c):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0
        )


def test_distributed_topk_padded_indivisible(ds):
    """129 items on a model axis of 2: score columns pad with -inf so the
    two-stage distributed top-k engages (trainer._mask_and_topk)."""
    ds_odd = generate_synthetic(
        n_users=80, n_items=129, n_inter=1600, v_dim=16, t_dim=16, seed=9
    )
    cfg = make_config("BPR", epochs=1, reg_weight=0.001,
                      mesh_shape=[4, 2], shard_embedding_tables=True)
    data = build_data_bundle(ds_odd, cfg)
    cls = get_model("BPR")
    model = cls.from_config(cfg, data)
    trainer = Trainer(cfg, model, cls.build_ctx(cfg, data), data, mg=False)
    trainer.init_state(7)
    assert trainer.mesh is not None and trainer.mesh.shape["model"] == 2
    assert data.n_items % trainer.mesh.shape["model"] == 1

    rng = np.random.default_rng(3)
    scores = jnp.asarray(rng.normal(size=(16, data.n_items)).astype(np.float32))
    # mask one real entry; everything else points at the sentinel column
    mask_rows = jnp.zeros(8, jnp.int32)
    mask_items = jnp.full(8, data.n_items, jnp.int32).at[0].set(5)
    topk = jax.jit(trainer._mask_and_topk)(scores, mask_rows, mask_items)
    masked = np.array(scores)
    masked[0, 5] = -1e10
    _, ref = jax.lax.top_k(jnp.asarray(masked), trainer.max_k)
    np.testing.assert_array_equal(np.asarray(topk), np.asarray(ref))
    assert (np.asarray(topk) < data.n_items).all()  # padding never wins

    # and the full fit/eval path runs under the indivisible catalog
    score, valid, test = trainer.fit(saved=False, verbose=False)
    assert np.isfinite(score) and score > 0.0


def test_model_diagnostics_land_in_jsonl(ds, tmp_path):
    """SMORE's band-energy/gate scalars must appear in the JSONL scalar log
    (the diagnostics path may not fail silently)."""
    log_dir = str(tmp_path / "scalars")
    _train(ds, model_name="SMORE", epochs=1, tensorboard=True,
           tb_log_dir=log_dir, n_ui_layers=1, n_layers=1, knn_k=5)
    files = glob.glob(f"{log_dir}/*.jsonl")
    assert files, "no scalar log written"
    tags = {json.loads(line)["tag"] for f in files for line in open(f)}
    assert any(t.startswith("model/spec/") for t in tags), sorted(tags)
    assert any(t.startswith("model/gate/") for t in tags), sorted(tags)
    assert "loss/total" in tags
