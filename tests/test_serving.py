"""Serving subsystem tests: export/load round trip, exclusion semantics,
int8 quantized ranking quality, cold-start fold-in, topk-table fallback,
and mesh-sharded serving equivalence.

The reference has no serving path (its closest artifact is the top-k CSV
dump, `/root/reference/src/utils/topk_evaluator.py:74-87`); these tests pin
the capability-upgrade contract instead: engine results must reproduce the
offline evaluator's ranking from the exported state.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from recommendar_systems_tpu.data.arrays import build_data_bundle
from recommendar_systems_tpu.data.synthetic import generate_synthetic
from recommendar_systems_tpu.models import get_model
from recommendar_systems_tpu.serve import ServingEngine, export_artifact
from recommendar_systems_tpu.train.trainer import Trainer

from conftest import make_config


@pytest.fixture(scope="module")
def ds():
    # enough items that random top-10 overlap (~4%) is far below signal
    return generate_synthetic(
        n_users=400, n_items=240, n_inter=8000, v_dim=24, t_dim=16, seed=23
    )


@pytest.fixture(scope="module")
def fitted(ds):
    cfg = make_config("LightGCN", epochs=6, reg_weight=0.001, n_layers=2)
    data = build_data_bundle(ds, cfg)
    cls = get_model("LightGCN")
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)
    trainer = Trainer(cfg, model, ctx, data)
    trainer.init_state(3)
    trainer.fit(saved=False, verbose=False)
    return trainer, data


@pytest.fixture(scope="module")
def artifact(fitted, tmp_path_factory):
    trainer, _ = fitted
    out = tmp_path_factory.mktemp("serve") / "lightgcn"
    export_artifact(trainer, str(out))
    return str(out)


def _oracle_topk(ue, ie, seen_lists, users, k, exclude=True):
    scores = ue[users] @ ie.T
    if exclude:
        for r, u in enumerate(users):
            scores[r, seen_lists[u]] = -1e10
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(scores, idx, axis=1)


def _seen_lists(data):
    indptr = np.asarray(data.pos_indptr)
    pos = np.asarray(data.pos_items)
    return [pos[indptr[u]: indptr[u + 1]] for u in range(data.n_users)]


def test_export_load_topk_matches_oracle(fitted, artifact):
    trainer, data = fitted
    eng = ServingEngine.load(artifact)
    assert eng.n_users == data.n_users and eng.n_items == data.n_items

    users = np.asarray([0, 7, 55, 120, 399], dtype=np.int32)
    items, scores = eng.topk(users, k=10)

    ue = np.asarray(eng.user_emb)
    ie = np.asarray(eng.item_emb)
    seen = _seen_lists(data)
    o_items, o_scores = _oracle_topk(ue, ie, seen, users, 10)
    # scores must match exactly; indices may differ only at exact ties
    np.testing.assert_allclose(scores, o_scores, rtol=1e-5, atol=1e-5)
    assert (items == o_items).mean() > 0.95


def test_exclude_seen(fitted, artifact):
    _, data = fitted
    eng = ServingEngine.load(artifact)
    users = np.arange(50, dtype=np.int32)
    items, _ = eng.topk(users, k=20, exclude_seen=True)
    seen = _seen_lists(data)
    for r, u in enumerate(users):
        assert not np.intersect1d(items[r], seen[u]).size


def test_include_seen_differs(fitted, artifact):
    eng = ServingEngine.load(artifact)
    users = np.arange(30, dtype=np.int32)
    inc, _ = eng.topk(users, k=10, exclude_seen=False)
    exc, _ = eng.topk(users, k=10, exclude_seen=True)
    # a trained model ranks seen items highly; the two must differ somewhere
    assert (inc != exc).any()


def test_pairwise_score(fitted, artifact):
    eng = ServingEngine.load(artifact)
    s = eng.score([3, 5, 9], [10, 11, 12])
    ue, ie = np.asarray(eng.user_emb), np.asarray(eng.item_emb)
    exp = (ue[[3, 5, 9]] * ie[[10, 11, 12]]).sum(axis=1)
    np.testing.assert_allclose(s, exp, rtol=1e-5, atol=1e-6)


def test_quantized_int8_ranking_close(fitted, tmp_path):
    trainer, data = fitted
    out = tmp_path / "q"
    export_artifact(trainer, str(out), quantize_int8=True)
    eng_q = ServingEngine.load(str(out))
    assert eng_q.item_q is not None  # quantized table active

    out_f = tmp_path / "f"
    export_artifact(trainer, str(out_f))
    eng_f = ServingEngine.load(str(out_f))

    users = np.arange(0, data.n_users, 7, dtype=np.int32)
    qi, _ = eng_q.topk(users, k=20)
    fi, _ = eng_f.topk(users, k=20)
    overlap = np.mean([
        len(np.intersect1d(qi[r], fi[r])) / 20 for r in range(len(users))
    ])
    assert overlap > 0.9, overlap


def test_fold_in_overlap(fitted, artifact):
    _, data = fitted
    eng = ServingEngine.load(artifact)
    seen = _seen_lists(data)
    users = np.asarray([u for u in range(0, 200, 10) if len(seen[u]) >= 3],
                       dtype=np.int32)
    hist = [seen[u] for u in users]

    cold_items, _ = eng.topk_for_history(hist, k=10)
    warm_items, _ = eng.topk(users, k=10)
    overlap = np.mean([
        len(np.intersect1d(cold_items[r], warm_items[r])) / 10
        for r in range(len(users))
    ])
    # random overlap ~ 10/240 = 4%; fold-in must recover real signal
    assert overlap > 0.3, overlap
    # history must be excluded
    for r in range(len(users)):
        assert not np.intersect1d(cold_items[r], hist[r]).size


def test_export_stateful_model(ds, tmp_path):
    """Export must capture flax net_state models correctly — MVGAE's eval
    embeddings read `result_embed` carried in the 'state' collection (the
    reference scores eval from the last training forward, PARITY.md)."""
    cfg = make_config("MVGAE", epochs=2)
    for ax in cfg["hyper_parameters"]:
        if isinstance(cfg[ax], list) and cfg[ax]:
            cfg[ax] = cfg[ax][0]
    data = build_data_bundle(ds, cfg)
    cls = get_model("MVGAE")
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)
    trainer = Trainer(cfg, model, ctx, data)
    trainer.init_state(1)
    trainer.fit(saved=False, verbose=False)

    out = tmp_path / "mvgae"
    export_artifact(trainer, str(out))
    eng = ServingEngine.load(str(out))
    ue, ie = trainer._eval_embeddings_jit(
        trainer.params, trainer.net_state, trainer.ctx)
    np.testing.assert_allclose(np.asarray(eng.user_emb), np.asarray(ue),
                               rtol=1e-6, atol=1e-6)
    items, _ = eng.topk([0, 1], k=5)
    assert items.shape == (2, 5)


def test_topk_table_mode(ds, tmp_path):
    cfg = make_config("ItemKNNCBF", epochs=1)
    for ax in cfg["hyper_parameters"]:
        if isinstance(cfg[ax], list) and cfg[ax]:
            cfg[ax] = cfg[ax][0]
    data = build_data_bundle(ds, cfg)
    cls = get_model("ItemKNNCBF")
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)
    trainer = Trainer(cfg, model, ctx, data)
    trainer.init_state(1)
    trainer.fit(saved=False, verbose=False)

    out = tmp_path / "knn"
    export_artifact(trainer, str(out), fallback_topk=30)
    eng = ServingEngine.load(str(out))
    assert eng.mode == "topk_table"

    users = np.asarray([1, 2, 3], dtype=np.int32)
    items, scores = eng.topk(users, k=10)
    assert items.shape == (3, 10)
    seen = _seen_lists(data)
    for r, u in enumerate(users):
        assert not np.intersect1d(items[r], seen[u]).size
    # monotone non-increasing scores
    assert (np.diff(scores, axis=1) <= 1e-6).all()


def test_topk_table_loud_semantics(ds, tmp_path):
    """topk_table artifacts cannot express include-seen or approx ranking;
    they must fail loudly instead of silently diverging from embedding-mode
    semantics, and warn when k exceeds the stored width."""
    cfg = make_config("ItemKNNCBF", epochs=1)
    for ax in cfg["hyper_parameters"]:
        if isinstance(cfg[ax], list) and cfg[ax]:
            cfg[ax] = cfg[ax][0]
    data = build_data_bundle(ds, cfg)
    cls = get_model("ItemKNNCBF")
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)
    trainer = Trainer(cfg, model, ctx, data)
    trainer.init_state(1)
    trainer.fit(saved=False, verbose=False)
    out = tmp_path / "knn2"
    export_artifact(trainer, str(out), fallback_topk=15)
    eng = ServingEngine.load(str(out))
    with pytest.raises(NotImplementedError, match="exclude_seen"):
        eng.topk([0], k=5, exclude_seen=False)
    with pytest.raises(NotImplementedError, match="approx"):
        eng.topk([0], k=5, approx=True)
    with pytest.warns(UserWarning, match="fallback_topk"):
        items, _ = eng.topk([0], k=50)
    assert items.shape == (1, 15)


def test_quantized_artifact_drops_fp32_table(fitted, tmp_path):
    """quantize_int8 exports serve entirely from the int8 table; the f32
    item table is omitted unless keep_fp32 re-opts in."""
    trainer, data = fitted
    out = tmp_path / "qlean"
    export_artifact(trainer, str(out), quantize_int8=True)
    z = np.load(str(out / "embeddings.npz"))
    assert "item_emb" not in z.files and "item_q" in z.files
    eng = ServingEngine.load(str(out))
    # every embedding-mode surface works from the quantized table alone
    s = eng.score([3, 5], [10, 11])
    assert np.isfinite(s).all()
    emb = eng.fold_in([[1, 2, 3]])
    assert emb.shape == (1, eng.dim) and np.isfinite(emb).all()
    items, _ = eng.topk_for_history([[1, 2, 3]], k=5)
    assert items.shape == (1, 5)
    uid = eng.add_user([4, 7, 9])
    items2, _ = eng.topk([uid], k=5)
    assert items2.shape == (1, 5)

    out_keep = tmp_path / "qkeep"
    export_artifact(trainer, str(out_keep), quantize_int8=True, keep_fp32=True)
    z2 = np.load(str(out_keep / "embeddings.npz"))
    assert "item_emb" in z2.files

    # quantized fold-in must agree with f32 fold-in up to rounding
    out_f = tmp_path / "f32"
    export_artifact(trainer, str(out_f))
    eng_f = ServingEngine.load(str(out_f))
    hist = [[1, 2, 3, 4], [9, 17]]
    np.testing.assert_allclose(
        eng.fold_in(hist), eng_f.fold_in(hist), rtol=0.05, atol=0.01)


def test_cold_start_executable_cache(fitted, artifact):
    """topk_for_history hits a cached executable per (k, L, B) bucket —
    repeated arrivals with nearby shapes must not grow the cache
    (advisor round-4 medium finding)."""
    eng = ServingEngine.load(artifact)
    eng.topk_for_history([[1, 2, 3]], k=10)
    n0 = len(eng._fns)
    # same bucket: L in (4] pad bucket, B in min bucket
    eng.topk_for_history([[5, 6]], k=10)
    eng.topk_for_history([[7], [8, 9, 10]], k=10)
    assert len(eng._fns) == n0


def test_approx_topk_close_to_exact(fitted, artifact):
    """`approx=True` (lax.approx_max_k wide-catalog path) must broadly agree
    with the exact ranking and keep the exclusion semantics."""
    _, data = fitted
    eng = ServingEngine.load(artifact)
    users = np.arange(0, 120, 3, dtype=np.int32)
    ex_i, _ = eng.topk(users, k=10)
    ap_i, ap_v = eng.topk(users, k=10, approx=True)
    overlap = np.mean([
        len(np.intersect1d(ex_i[r], ap_i[r])) / 10 for r in range(len(users))
    ])
    assert overlap > 0.8, overlap
    assert ap_v.dtype == np.float32
    seen = _seen_lists(data)
    for r, u in enumerate(users):
        assert not np.intersect1d(ap_i[r], seen[u]).size


def test_quick_start_export_dir(tmp_path, monkeypatch):
    """`export_dir=` on the CLI/quick_start path exports the BEST sweep
    combo at its best-valid state; the artifact loads and serves."""
    from recommendar_systems_tpu.quick_start import quick_start

    monkeypatch.chdir(tmp_path)
    out = tmp_path / "artifact"
    result = quick_start(
        "LightGCN", "synthetic",
        config_dict={
            "device": "cpu", "epochs": 3, "train_batch_size": 256,
            "eval_batch_size": 128, "stopping_step": 3, "topk": [5, 10, 20],
            "reg_weight": [0.01, 0.001], "hyper_parameters": ["reg_weight"],
            "seed": [7], "n_layers": 2,
            "synthetic_users": 150, "synthetic_items": 80,
            "synthetic_inters": 2500,
            "data_path": str(tmp_path) + "/data/",
            "log_dir": str(tmp_path) + "/log/",
            "checkpoint_dir": str(tmp_path) + "/saved/",
            "export_dir": str(out),
        },
        save_model=False,
    )
    eng = ServingEngine.load(str(out))
    assert eng.meta["model"] == "LightGCN"
    items, _ = eng.topk([0, 1, 2], k=5)
    assert items.shape == (3, 5)
    assert np.isfinite(result["best_valid_score"])


def test_serve_cli(fitted, artifact):
    import json
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "recommendar_systems_tpu.serve",
         "-a", artifact, "-u", "0,5", "-k", "5", "--device", "cpu"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert len(out["results"]) == 2
    assert len(out["results"][0]["items"]) == 5


def test_engine_matches_offline_eval_topk(fitted, artifact):
    """End-to-end closure: the engine's ranking equals the trainer's own
    offline-eval top-k (same masking semantics, same scoring state)."""
    trainer, data = fitted
    eng = ServingEngine.load(artifact)
    bundle = data.valid_eval
    topk = np.asarray(trainer._eval_cached_jit(
        trainer.params, trainer.net_state, trainer.ctx,
        bundle.users, bundle.mask_rows, bundle.mask_items,
    ))  # [n_batches, B, max_k]
    users0 = np.asarray(bundle.users[0])[: bundle.n_valid[0]]
    eval_topk = topk[0, : bundle.n_valid[0]]
    k = eval_topk.shape[1]
    served, _ = eng.topk(users0, k=k)
    assert (served == eval_topk).mean() > 0.95  # ties only


def test_format_version_guard(artifact, tmp_path):
    import json as _json
    import shutil

    bad = tmp_path / "future"
    shutil.copytree(artifact, bad)
    meta = _json.load(open(bad / "meta.json"))
    meta["format_version"] = 999
    _json.dump(meta, open(bad / "meta.json", "w"))
    with pytest.raises(ValueError, match="format_version"):
        ServingEngine.load(str(bad))


def test_online_add_interactions(fitted, artifact):
    """Recording new interactions excludes them from future top-k and
    drifts the user embedding toward the added items."""
    _, data = fitted
    eng = ServingEngine.load(artifact)
    u = 17
    cand, _ = eng.topk([u], k=5)  # unseen, highly-ranked items
    new_items = cand[0][:3]
    before = eng.score([u] * 3, new_items).mean()
    eng.add_interactions(u, new_items, alpha=0.5)
    after = eng.score([u] * 3, new_items).mean()
    assert after > before  # blended toward the added items' mean
    items, _ = eng.topk([u], k=20)
    assert not np.intersect1d(items[0], new_items).size


def test_online_add_interactions_widens_seen(fitted, artifact):
    _, data = fitted
    eng = ServingEngine.load(artifact)
    maxp = eng.seen.shape[1]
    u = 3
    many = np.arange(0, maxp + 10, dtype=np.int32)  # force widening
    eng.add_interactions(u, many, refresh_embedding=False)
    assert eng.seen.shape[1] >= maxp + 5
    items, _ = eng.topk([u], k=10)
    assert not np.intersect1d(items[0], many).size
    # other users unaffected
    items2, _ = eng.topk([5], k=10)
    assert items2.shape == (1, 10)


def test_online_add_user(fitted, artifact):
    eng = ServingEngine.load(artifact)
    n0 = eng.n_users
    hist = [3, 17, 42, 99]
    uid = eng.add_user(hist)
    assert uid == n0 and eng.n_users == n0 + 1
    items, _ = eng.topk([uid], k=10)
    ref_items, _ = eng.topk_for_history([hist], k=10)
    overlap = len(np.intersect1d(items[0], ref_items[0])) / 10
    assert overlap > 0.9  # same fold-in embedding, same exclusion
    assert not np.intersect1d(items[0], hist).size


def test_sustained_updates_quality_holds(fitted, artifact):
    """A sustained online-update stream (hundreds of add_interactions +
    fold-in add_user calls, including seen-matrix widening) must keep the
    approx candidate path's overlap vs exact and the exclusion invariant
    (VERDICT r4 item 9; campaign-scale version in
    tools/probe_serving_updates.py)."""
    _, data = fitted
    eng = ServingEngine.load(artifact)
    rng = np.random.default_rng(3)
    users = np.arange(0, 100, dtype=np.int32)

    for n in range(200):
        u = int(rng.integers(0, eng.n_users))
        new = rng.integers(0, eng.n_items, size=int(rng.integers(1, 6)))
        eng.add_interactions(u, new)
    new_ids = []
    for _ in range(25):
        s = int(rng.integers(0, data.n_users))
        h = eng.seen[s][eng.seen[s] < eng.n_items].tolist()
        new_ids.append(eng.add_user(h))

    ex_i, _ = eng.topk(users, k=10)
    ap_i, _ = eng.topk(users, k=10, approx=True)
    overlap = np.mean([
        len(np.intersect1d(ex_i[r], ap_i[r])) / 10 for r in range(len(users))
    ])
    assert overlap > 0.9, overlap
    # exclusion invariant after the stream, incl. fold-in users
    check = list(users[:20]) + new_ids[:10]
    items, _ = eng.topk(np.asarray(check, dtype=np.int32), k=10)
    for r, u in enumerate(check):
        seen_u = eng.seen[u][eng.seen[u] < eng.n_items]
        assert not np.intersect1d(items[r], seen_u).size
    # host and device copies stayed in sync through row writes + widenings
    np.testing.assert_array_equal(np.asarray(eng._seen_j), eng.seen)


def test_slmrec_sigmoid_serving(ds, tmp_path):
    """SLMRec serves in embedding mode: sigmoid is strictly monotone, so
    the raw-factor ranking equals full_scores' ranking; the recorded
    transform is re-applied to the k returned scores."""
    cfg = make_config("SLMRec", epochs=2)
    for ax in cfg["hyper_parameters"]:
        if isinstance(cfg[ax], list) and cfg[ax]:
            cfg[ax] = cfg[ax][0]
    data = build_data_bundle(ds, cfg)
    cls = get_model("SLMRec")
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)
    trainer = Trainer(cfg, model, ctx, data)
    trainer.init_state(1)
    trainer.fit(saved=False, verbose=False)

    out = tmp_path / "slmrec"
    export_artifact(trainer, str(out))
    eng = ServingEngine.load(str(out))
    assert eng.mode == "embedding" and eng.score_transform == "sigmoid"

    users = np.asarray([0, 3, 9], dtype=np.int32)
    items, scores = eng.topk(users, k=10, exclude_seen=False)
    # oracle through the model's own full_scores (sigmoid applied)
    variables = {"params": trainer.params}
    if trainer.has_net_state:
        variables["state"] = trainer.net_state
    oracle = np.asarray(trainer.model.apply(
        variables, trainer.ctx, jnp.asarray(users), method="full_scores"))
    o_idx = np.argsort(-oracle, axis=1, kind="stable")[:, :10]
    assert (items == o_idx).mean() > 0.9  # ties only
    np.testing.assert_allclose(
        scores, np.take_along_axis(oracle, items, axis=1), rtol=1e-4,
        atol=1e-5)
    assert (scores <= 1.0).all() and (scores >= 0.0).all()


def test_sharded_approx_serving(fitted, artifact):
    from recommendar_systems_tpu.parallel.mesh import make_mesh

    eng = ServingEngine.load(artifact)
    users = np.arange(0, 64, dtype=np.int32)
    base_i, _ = eng.topk(users, k=10)

    eng_s = ServingEngine.load(artifact)
    eng_s.shard_items(make_mesh([1, 8]))
    sh_i, sh_v = eng_s.topk(users, k=10, approx=True)
    overlap = np.mean([
        len(np.intersect1d(sh_i[r], base_i[r])) / 10 for r in range(len(users))
    ])
    assert overlap > 0.8, overlap
    # exclusion still holds through the candidate postfilter
    _, data = fitted
    seen = _seen_lists(data)
    for r, u in enumerate(users):
        assert not np.intersect1d(sh_i[r], seen[u]).size


def test_sharded_serving_equivalence(fitted, artifact):
    from recommendar_systems_tpu.parallel.mesh import make_mesh

    eng = ServingEngine.load(artifact)
    users = np.arange(0, 64, dtype=np.int32)
    base_i, base_v = eng.topk(users, k=10)

    eng_s = ServingEngine.load(artifact)
    eng_s.shard_items(make_mesh([1, 8]))
    sh_i, sh_v = eng_s.topk(users, k=10)

    np.testing.assert_allclose(sh_v, base_v, rtol=1e-5, atol=1e-5)
    assert (sh_i == base_i).mean() > 0.95  # ties only
