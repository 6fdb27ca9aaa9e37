"""Exact parity vs the unmodified reference: BPR, ItemKNNCBF, LayerGCN,
SELFCFED_LGN, TEST.

Stochastic surfaces are switched off identically on both sides:
LayerGCN/TEST per-epoch edge pruning via ``dropout=0``
(`layergcn.py:51-54`, `test.py:134-137`); SELFCFED's per-forward adjacency
dropout via the encoder's own ``drop_flag`` toggle (`common/encoders.py:25`,
an attribute the reference exposes for exactly this) plus ``dropout=0`` for
the target-view ``F.dropout`` (`selfcfed_lgn.py:47-48`, applied with
``training=True`` even under eval).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import ref_compat as rc
from tests.test_parity_batch2 import _init_our


def test_bpr_loss_parity(tmp_path):
    """BPR: mean-form BPR(gamma) + EmbLoss on batch rows (`bpr.py:67-88`)."""
    data = rc.tiny_mm_data(tmp_path, seed=40)
    ref_mod = rc.import_ref_model("bpr")
    hp = {"embedding_size": 8, "reg_weight": 0.01, "train_batch_size": 8}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=False,
        data_path=data.data_path, dataset=data.dataset,
        **hp,
    )
    ref = ref_mod.BPR(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    vals = rc.fill_ref_params(ref, seed=40)
    ref.eval()
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)

    model, ctx, _, _ = rc.our_model_and_ctx("BPR", data, hp)
    init = _init_our(model, ctx)
    mapping = {
        ("user_embedding",): "user_embedding.weight",
        ("item_embedding",): "item_embedding.weight",
    }
    params = rc.map_flax_params(init, mapping, vals)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp, bn)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)


def test_itemknncbf_prediction_parity(tmp_path):
    """ItemKNNCBF full-catalog scores: R @ topk(shrink-cosine sim)
    (`itemknncbf.py:53-65,107-111`).  Non-parametric — prediction IS the
    model."""
    data = rc.tiny_mm_data(tmp_path, seed=41)
    ref_mod = rc.import_ref_model("itemknncbf")
    hp = {"knn_k": 3, "shrink": 0.5, "train_batch_size": 8}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        **hp,
    )
    ref = ref_mod.ItemKNNCBF(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    ref.eval()
    users = np.arange(data.n_users, dtype=np.int64)
    with torch.no_grad():
        ref_scores = ref.full_sort_predict([torch.from_numpy(users)]).numpy()

    model, ctx, _, _ = rc.our_model_and_ctx("ItemKNNCBF", data, hp)
    init = _init_our(model, ctx)
    import jax.numpy as jnp

    ours = np.asarray(
        model.apply({"params": init}, ctx, jnp.asarray(users), method="full_scores")
    )
    assert np.abs(ours - ref_scores).max() < 1e-4


def test_layergcn_loss_parity(tmp_path):
    """LayerGCN: cosine-reweighted layer sum, SUM-form BPR + L2
    (`layergcn.py:127-177`)."""
    data = rc.tiny_mm_data(tmp_path, seed=42)
    ref_mod = rc.import_ref_model("layergcn")
    hp = {"embedding_size": 8, "n_layers": 3, "reg_weight": 0.01,
          "dropout": 0.0, "train_batch_size": 8}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=False,
        data_path=data.data_path, dataset=data.dataset,
        **hp,
    )
    ref = ref_mod.LayerGCN(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    vals = rc.fill_ref_params(ref, seed=42)
    ref.eval()
    ref.pre_epoch_processing()  # dropout 0 -> masked_adj = norm_adj
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)

    model, ctx, _, _ = rc.our_model_and_ctx("LayerGCN", data, hp)
    init = _init_our(model, ctx)
    mapping = {
        ("user_embeddings",): "user_embeddings",
        ("item_embeddings",): "item_embeddings",
    }
    params = rc.map_flax_params(init, mapping, vals)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp, bn)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)


def test_selfcfed_lgn_loss_parity(tmp_path):
    """SELFCF_ed: LightGCN encoder + stop-grad target views + predictor
    negative-cosine + L2 (`selfcfed_lgn.py:41-70`)."""
    data = rc.tiny_mm_data(tmp_path, seed=43)
    ref_mod = rc.import_ref_model("selfcfed_lgn")
    hp = {"embedding_size": 8, "n_layers": 2, "dropout": 0.0,
          "reg_weight": 0.01, "train_batch_size": 8}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=False,
        data_path=data.data_path, dataset=data.dataset,
        **hp,
    )
    ref = ref_mod.SELFCFED_LGN(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    ref.online_encoder.drop_flag = False  # see module docstring
    vals = rc.fill_ref_params(ref, seed=43)
    ref.eval()
    bu, bp, _ = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp)

    model, ctx, _, _ = rc.our_model_and_ctx("SELFCFED_LGN", data, hp)
    init = _init_our(model, ctx, with_neg=False)
    mapping = {
        ("user_emb",): "online_encoder.embedding_dict.user_emb",
        ("item_emb",): "online_encoder.embedding_dict.item_emb",
        ("predictor", "kernel"): ("predictor.weight", "T"),
        ("predictor", "bias"): "predictor.bias",
    }
    params = rc.map_flax_params(init, mapping, vals)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp, train=False)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)


def test_testmodel_loss_parity(tmp_path):
    """TEST (`test.py:195-215`): FREEDOM's exact mechanism under its own
    registry name — BPR + reg_weight * modality-BPR terms."""
    data = rc.tiny_mm_data(tmp_path, seed=44)
    ref_mod = rc.import_ref_model("test")
    hp = {"embedding_size": 8, "feat_embed_dim": 8, "knn_k": 3,
          "lambda_coeff": 0.9, "cf_model": "lightgcn", "n_mm_layers": 1,
          "n_ui_layers": 2, "mm_image_weight": 0.4, "dropout": 0.0,
          "degree_ratio": 1.0, "reg_weight": 0.1, "train_batch_size": 8}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        **hp,
    )
    ref = ref_mod.TEST(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    vals = rc.fill_ref_params(
        ref, seed=44, exclude=("image_embedding.weight", "text_embedding.weight"))
    ref.eval()
    ref.pre_epoch_processing()  # dropout 0 -> masked_adj = norm_adj
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)

    model, ctx, _, _ = rc.our_model_and_ctx("TEST", data, hp)
    init = _init_our(model, ctx)
    mapping = {
        ("user_embedding",): "user_embedding.weight",
        ("item_id_embedding",): "item_id_embedding.weight",
        ("image_trs", "kernel"): ("image_trs.weight", "T"),
        ("image_trs", "bias"): "image_trs.bias",
        ("text_trs", "kernel"): ("text_trs.weight", "T"),
        ("text_trs", "bias"): "text_trs.bias",
    }
    params = rc.map_flax_params(init, mapping, vals)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp, bn)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)
