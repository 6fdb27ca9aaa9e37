"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Asserts (a) the sharded training step compiles and executes with row-sharded
tables + DP batches, and (b) sharded vs single-device training produce
numerically close results (same seed, same data) — the shard-vs-replicated
equivalence strategy from SURVEY.md §4.
"""

import numpy as np
import jax
import pytest

from recommendar_systems_tpu.data.arrays import build_data_bundle
from recommendar_systems_tpu.data.synthetic import generate_synthetic
from recommendar_systems_tpu.models import get_model
from recommendar_systems_tpu.parallel.mesh import make_mesh, shard_params
from recommendar_systems_tpu.train.trainer import Trainer

from conftest import make_config


@pytest.fixture(scope="module")
def ds():
    return generate_synthetic(
        n_users=100, n_items=64, n_inter=2000, v_dim=16, t_dim=16, seed=5
    )


def _run(ds, mesh_shape, shard_tables, epochs=3, model_name="LightGCN",
         **overrides):
    cfg = make_config(
        model_name,
        epochs=epochs,
        mesh_shape=mesh_shape,
        shard_embedding_tables=shard_tables,
        **overrides,
    )
    for ax in cfg["hyper_parameters"]:
        v = cfg[ax]
        if isinstance(v, list) and v:
            cfg[ax] = v[0]
    data = build_data_bundle(ds, cfg)
    cls = get_model(model_name)
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)
    trainer = Trainer(cfg, model, ctx, data, mg=False)
    trainer.init_state(3)
    score, valid, test = trainer.fit(saved=False, verbose=False)
    return score, valid, trainer


def test_mesh_construction():
    assert len(jax.devices()) == 8
    mesh = make_mesh([4, 2])
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = make_mesh(None)
    assert mesh1.shape["data"] == 8


def test_sharded_training_runs(ds):
    score, valid, trainer = _run(ds, [4, 2], True)
    assert np.isfinite(score) and score > 0.2
    # tables actually sharded over 'model'
    ue = trainer.params["user_emb"]
    assert not ue.sharding.is_fully_replicated


# one representative per structural family (VERDICT r1 item 3): SMORE
# (spectral + dense UI lift), FREEDOM (per-epoch edge dropout), GRCN
# (dense attention routing), MENTOR (7 batched towers + mm residual),
# SLMRec (3-channel + SSL heads), MVGAE (PoE + reparameterized sampling)
SHARD_CASES = [
    ("LightGCN", dict(n_layers=2, reg_weight=0.001)),
    ("SMORE", dict(reg_weight=1e-4, n_ui_layers=1, n_layers=1, knn_k=5,
                   cl_weight=0.01)),
    ("FREEDOM", dict(reg_weight=1e-4, dropout=0.8)),
    ("GRCN", dict(reg_weight=1e-4, learning_rate=0.001)),
    ("MENTOR", dict()),
    ("SLMRec", dict(learning_rate=0.001, ssl_alpha=0.01, ssl_temp=0.1)),
    ("MVGAE", dict(learning_rate=0.001, beta=0.1)),
    # dense soft-R scale + exact per-edge EMA/renorm + scatter under GSPMD
    ("SMOREDiffX", dict(reg_weight=1e-4, n_ui_layers=1, n_layers=1, knn_k=5,
                        cl_weight=0.01, use_diffusion_mvp=True)),
    # VERDICT r2 item 2 — mechanisms previously without mesh equivalence:
    # LATTICE's per-epoch learned-graph rebuild (ref lattice.py:137-159)
    ("LATTICE", dict(knn_k=5, reg_weight=0.001)),
    # PGL's LowRank global adjacency (ref pgl.py:138-154)
    ("PGL", dict(mode="global", reg_weight=0.01)),
    # DualGNN/DRAGON u-u co-occurrence graph buffers (ref dualgnn.py:207-266)
    ("DualGNN", dict(reg_weight=0.001, learning_rate=0.001)),
    ("DRAGON", dict(reg_weight=0.001, learning_rate=0.001)),
    # LGMRec's hypergraph matmuls (ref lgmrec.py:117-126)
    ("LGMRec", dict()),
    # BM3's no-negative bootstrap path
    ("BM3", dict()),
]


@pytest.mark.parametrize("name,overrides", SHARD_CASES)
def test_sharded_matches_unsharded(ds, name, overrides):
    score_s, valid_s, tr = _run(ds, [4, 2], True, epochs=2,
                                model_name=name, **overrides)
    score_r, valid_r, _ = _run(ds, None, False, epochs=2,
                               model_name=name, **overrides)
    # same seed + same device-count-independent math => close results
    assert abs(score_s - score_r) < 0.02, (name, valid_s, valid_r)
    assert tr.mesh is not None and tr.mesh.shape == {"data": 4, "model": 2}


def test_graft_entry_single():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[1].shape[0]
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_distributed_topk_matches_plain():
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from recommendar_systems_tpu.ops.topk import distributed_topk

    mesh = make_mesh([1, 8])
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(16, 640)).astype(np.float32))
    scores = jax.device_put(scores, NamedSharding(mesh, P(None, "model")))
    v, i = jax.jit(
        lambda s: distributed_topk(s, 10, mesh, axis="model")
    )(scores)
    v_ref, i_ref = jax.lax.top_k(scores, 10)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=1e-6)
    # indices may differ on exact ties; values above pin correctness, and
    # with continuous random scores ties are absent:
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
