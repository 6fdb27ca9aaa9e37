"""Exact parity vs the unmodified reference: the MessagePassing family.

GRCN note: the reference's preference-routing loop is provably dead code —
it propagates over the UNIDIRECTIONAL (user -> item) edge list with PyG's
default ``flow='source_to_target'``, so every aggregated message lands on an
item node and ``x_hat_1[:num_user]`` is all zeros; re-normalizing the
already-normalized preference is then a no-op (`grcn.py:149-156`; verified
empirically: reference loss is bit-identical for n_layers in {0, 3, 7}).
Our GRCN implements the PUBLISHED items->users routing instead, so exact
parity is pinned at ``num_routing=0`` on our side vs ``n_layers=3`` on the
reference side (see PARITY.md).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import ref_compat as rc
from tests.test_parity_batch2 import _init_our


def _grcn_setup(tmp_path, seed):
    data = rc.tiny_mm_data(tmp_path, seed=seed)
    ref_mod = rc.import_ref_model("grcn")
    hp = {"embedding_size": 8, "latent_embedding": 8, "n_layers": 3,
          "reg_weight": 0.01, "train_batch_size": 8}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        **hp,
    )
    ref = ref_mod.GRCN(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    rc.fill_ref_params(ref, seed=seed)
    ref.eval()

    our_hp = dict(hp)
    our_hp["n_layers"] = 0  # reference routing is a no-op (module docstring)
    model, ctx, _, _ = rc.our_model_and_ctx("GRCN", data, our_hp)
    init = _init_our(model, ctx)
    mapping = {
        ("id_embedding",): "id_gcn.id_embedding",
        ("model_specific_conf",): "model_specific_conf",
        ("v_preference",): "v_gcn.preference",
        ("t_preference",): "t_gcn.preference",
        ("v_mlp", "kernel"): ("v_gcn.MLP.weight", "T"),
        ("v_mlp", "bias"): "v_gcn.MLP.bias",
        ("t_mlp", "kernel"): ("t_gcn.MLP.weight", "T"),
        ("t_mlp", "bias"): "t_gcn.MLP.bias",
    }
    params = rc.map_flax_params(init, mapping, rc.fill_ref_params(ref, seed=seed))
    return data, ref, model, ctx, params


def test_grcn_loss_parity(tmp_path):
    """GRCN loss: matmul-BPR over [B, 2] scores + reg on raw id/preference
    tables (`grcn.py:300-333`; the computed-but-unused ``reg_confid_loss``
    at :327 is likewise dropped)."""
    data, ref, model, ctx, params = _grcn_setup(tmp_path, seed=31)
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp, bn)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)


def _tower_map(ours, theirs):
    return {
        (ours, "preference"): f"{theirs}.preference",
        (ours, "MLP", "kernel"): (f"{theirs}.MLP.weight", "T"),
        (ours, "MLP", "bias"): f"{theirs}.MLP.bias",
        (ours, "MLP_1", "kernel"): (f"{theirs}.MLP_1.weight", "T"),
        (ours, "MLP_1", "bias"): f"{theirs}.MLP_1.bias",
    }


def test_mentor_loss_parity(tmp_path):
    """MENTOR: 3 preference towers + mm item residual + Gaussian moment
    alignment + stop-grad MLP cosine mask loss (`mentor.py:361-446`).

    ``mask_weight_g=0`` neutralizes the SimGCL noise views (the reference
    samples ``torch.rand_like`` noise unconditionally, `mentor.py:533-538`,
    so that term can never be pinned deterministically); ``dropout=0`` makes
    the mask-f views deterministic (the reference applies ``F.dropout`` with
    ``training=True`` even under eval, `mentor.py:373-375`).  The reference's
    modality edge-drop graphs are dead in its forward (`mentor.py:235-237`
    passes them; GCN.forward `mentor.py:526-541` only propagates the full
    ``edge_index``), and with 9 items ``int(0.1 * 9) = 0`` edges would drop
    anyway."""
    data = rc.tiny_mm_data(tmp_path, seed=33)
    # MENTOR loads a pre-built u-u graph dict at init (`mentor.py:58-60`);
    # only topk_sample (not exercised here) reads its contents
    ug = {i: [[], []] for i in range(data.n_users)}
    np.save(f"{data.data_path}{data.dataset}/user_graph_dict.npy",
            np.array(ug, dtype=object))
    ref_mod = rc.import_ref_model("mentor")
    hp = {"embedding_size": 64, "feat_embed_dim": 64, "n_mm_layers": 1,
          "knn_k": 3, "mm_image_weight": 0.4, "reg_weight": 0.01,
          "align_weight": 0.1, "mask_weight_f": 1.5, "mask_weight_g": 0.0,
          "temp": 0.4, "dropout": 0.0, "train_batch_size": 8,
          "user_graph_dict_file": "user_graph_dict.npy"}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        **hp,
    )
    ref = ref_mod.MENTOR(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    # On CUDA `nn.Parameter(...).to(device)` yields a PLAIN tensor, so the
    # reference's `self.result_embed = torch.cat(...)` re-assignments in
    # forward work (`mentor.py:170-182,325-334`); on CPU `.to` is a no-op and
    # the attribute stays a registered Parameter — de-register to match.
    for name in [n for n in list(ref._parameters) if n.startswith("result_embed")]:
        t = ref._parameters.pop(name).data
        setattr(ref, name, t)
    vals = rc.fill_ref_params(
        ref, seed=33, exclude=("image_embedding.weight", "text_embedding.weight"))
    ref.eval()
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)

    model, ctx, _, _ = rc.our_model_and_ctx("MENTOR", data, hp)
    init = _init_our(model, ctx)
    mapping = {
        ("id_feat",): "id_feat",
        ("weight_u",): "weight_u",
        ("weight_i",): "weight_i",
        ("mlp", "kernel"): ("mlp.weight", "T"),
        ("mlp", "bias"): "mlp.bias",
    }
    for ours, theirs in [("v_gcn", "v_gcn"), ("t_gcn", "t_gcn"),
                         ("id_gcn", "id_gcn"), ("v_gcn_n1", "v_gcn_n1"),
                         ("v_gcn_n2", "v_gcn_n2"), ("t_gcn_n1", "t_gcn_n1"),
                         ("t_gcn_n2", "t_gcn_n2")]:
        mapping.update(_tower_map(ours, theirs))
    params = rc.map_flax_params(init, mapping, vals)
    import jax

    ours, parts = rc.our_loss_value(
        model, ctx, params, bu, bp, bn,
        rngs={"dropout": jax.random.key(0), "noise": jax.random.key(3)},
    )
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)


def _deregister_result_embed(ref):
    """On CUDA `nn.Parameter(...).to(device)` yields a PLAIN tensor, so the
    reference's `self.result_embed = torch.cat(...)` re-assignment in forward
    works; on CPU `.to` is a no-op and the attribute stays a registered
    Parameter — de-register to match (`dualgnn.py:130,175`, `dragon.py:155`)."""
    for name in [n for n in list(ref._parameters) if n.startswith("result_embed")]:
        t = ref._parameters.pop(name).data
        setattr(ref, name, t)


def _user_graph_dict(data, k=40, seed=7):
    """Deterministic u-u graph: every user has exactly k neighbors or none
    (the reference pads short non-empty lists with `np.random.randint`,
    `dualgnn.py:220-227`, which cannot be seeded across frameworks)."""
    rng = np.random.default_rng(seed)
    dic = {}
    idx = np.zeros((data.n_users, k), np.int32)
    w = np.zeros((data.n_users, k), np.float32)
    for uu in range(data.n_users):
        if uu % 5 == 0:
            dic[uu] = [[], []]  # empty row -> zero aggregation
            continue
        ids = [int(x) for x in rng.integers(0, data.n_users, k)]
        wts = [float(x) for x in rng.normal(size=k)]
        dic[uu] = [ids, wts]
        idx[uu] = ids
        e = np.exp(np.float32(wts) - np.max(np.float32(wts)))
        w[uu] = e / e.sum()
    np.save(f"{data.data_path}{data.dataset}/user_graph_dict.npy",
            np.array(dic, dtype=object))
    return idx, w


def test_dualgnn_loss_parity(tmp_path):
    """DualGNN: weighted_sum user blend + u-u top-k aggregation + log2-BPR
    (`dualgnn.py:141-197,252-266`)."""
    data = rc.tiny_mm_data(tmp_path, seed=34)
    idx, w = _user_graph_dict(data, seed=34)
    ref_mod = rc.import_ref_model("dualgnn")
    hp = {"embedding_size": 64, "aggr_mode": "add", "reg_weight": 0.01,
          "train_batch_size": 8, "user_graph_dict_file": "user_graph_dict.npy"}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        **hp,
    )
    ref = ref_mod.DualGNN(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    _deregister_result_embed(ref)
    vals = rc.fill_ref_params(
        ref, seed=34, exclude=("image_embedding.weight", "text_embedding.weight"))
    ref.eval()
    ref.pre_epoch_processing()
    # this torch no longer accepts a nested python list as tensor-style
    # advanced indexing (`dualgnn.py:261`); the original CUDA-era torch did
    ref.epoch_user_graph = torch.tensor(ref.epoch_user_graph, dtype=torch.long)
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)

    model, ctx, _, _ = rc.our_model_and_ctx("DualGNN", data, hp)
    ctx["ug_idx"] = idx
    ctx["ug_w"] = w
    init = _init_our(model, ctx)
    mapping = {("weight_u",): "weight_u", ("weight_i",): "weight_i"}
    mapping.update(_tower_map("v_gcn", "v_gcn"))
    mapping.update(_tower_map("t_gcn", "t_gcn"))
    params = rc.map_flax_params(init, mapping, vals)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp, bn)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)


def test_dragon_loss_parity(tmp_path):
    """DRAGON: construction='cat' (blend-weighted user concat), frozen mm
    item-graph residual, u-u aggregation, log2-BPR + reg on preferences and
    weight_u only (`dragon.py:192-277`)."""
    data = rc.tiny_mm_data(tmp_path, seed=35)
    idx, w = _user_graph_dict(data, seed=35)
    ref_mod = rc.import_ref_model("dragon")
    hp = {"embedding_size": 64, "feat_embed_dim": 64, "n_mm_layers": 1,
          "knn_k": 3, "mm_image_weight": 0.4, "aggr_mode": "add",
          "reg_weight": 0.01, "train_batch_size": 8,
          "user_graph_dict_file": "user_graph_dict.npy"}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        **hp,
    )
    ref = ref_mod.DRAGON(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    _deregister_result_embed(ref)
    vals = rc.fill_ref_params(
        ref, seed=35, exclude=("image_embedding.weight", "text_embedding.weight"))
    ref.eval()
    ref.pre_epoch_processing()
    ref.epoch_user_graph = torch.tensor(ref.epoch_user_graph, dtype=torch.long)
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)

    model, ctx, _, _ = rc.our_model_and_ctx("DRAGON", data, hp)
    ctx["ug_idx"] = idx
    ctx["ug_w"] = w
    init = _init_our(model, ctx)
    mapping = {("weight_u",): "weight_u", ("weight_i",): "weight_i"}
    mapping.update(_tower_map("v_gcn", "v_gcn"))
    mapping.update(_tower_map("t_gcn", "t_gcn"))
    params = rc.map_flax_params(init, mapping, vals)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp, bn)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)


def test_grcn_prediction_parity(tmp_path):
    """GRCN full-catalog scores: confid-gated EGCN + concat fusion
    (`grcn.py:265-296,335-343`)."""
    data, ref, model, ctx, params = _grcn_setup(tmp_path, seed=32)
    users = np.arange(data.n_users, dtype=np.int64)
    with torch.no_grad():
        ref.forward()
        ref_scores = ref.full_sort_predict([torch.from_numpy(users)]).numpy()
    ue, ie = model.apply({"params": params}, ctx, method="eval_embeddings")
    ours = np.asarray(ue @ ie.T)
    assert np.abs(ours - ref_scores).max() < 1e-4
