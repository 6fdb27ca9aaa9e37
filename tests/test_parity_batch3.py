"""Exact parity vs the unmodified reference: SLMRec (FAC) and PGL.

SLMRec's FD/FM SSL branches are unexecutable in the reference itself for
non-kwai datasets (they reference `a_dense`, whose construction is commented
out — `slmrec.py:125-127,156-158` vs `:420-427`), so FAC — the configured
task (`configs/model/SLMRec.yaml`) — is the parity surface.

PGL 'local' loss is pinned on the full normalized graph (the reference's
``sub_graph`` before any epoch sampling is the stochastic 30% subsample;
here both sides propagate the full graph) with dropout 0; 'global' differs
by design (exact low-rank filter vs the reference's 1e-3-thresholded dense
product — see PARITY.md) and is covered by prediction parity over
``norm_adj`` instead.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import ref_compat as rc
from tests.test_parity_batch2 import _init_our


def test_slmrec_fac_loss_parity(tmp_path):
    """SLMRec: 3-channel LightGCN + concat fusion heads + in-batch CE main
    loss + FAC hierarchical SSL (`slmrec.py:278-305,329-336,369-378`)."""
    data = rc.tiny_mm_data(tmp_path, seed=20)
    ref_mod = rc.import_ref_model("slmrec")
    hp = {"recdim": 8, "layer_num": 2, "mm_fusion_mode": "concat",
          "temp": 0.2, "ssl_temp": 0.1, "ssl_alpha": 0.05,
          "ssl_task": "FAC", "init": "xavier", "adj_type": "pre",
          "train_batch_size": 8}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        **hp,
    )
    ref = ref_mod.SLMRec(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    vals = rc.fill_ref_params(ref, seed=20)
    ref.eval()
    bu, bp, _ = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp)

    our_hp = dict(hp)
    our_hp["embedding_size"] = 8
    model, ctx, _, _ = rc.our_model_and_ctx("SLMRec", data, our_hp)
    init = _init_our(model, ctx, with_neg=False)
    mapping = {
        ("embedding_user",): "embedding_user.weight",
        ("embedding_item",): "embedding_item.weight",
    }
    for ours, theirs in [
        ("v_dense", "v_dense"), ("t_dense", "t_dense"),
        ("user_after_GCN", "embedding_user_after_GCN"),
        ("item_after_GCN", "embedding_item_after_GCN"),
        ("g_i_iv", "g_i_iv"), ("g_v_iv", "g_v_iv"), ("g_iv_iva", "g_iv_iva"),
        ("g_iva_ivat", "g_iva_ivat"), ("g_t_ivat", "g_t_ivat"),
    ]:
        mapping[(ours, "kernel")] = (f"{theirs}.weight", "T")
        mapping[(ours, "bias")] = f"{theirs}.bias"
    params = rc.map_flax_params(init, mapping, vals)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)


def _pgl_setup(tmp_path, mode, seed):
    data = rc.tiny_mm_data(tmp_path, seed=seed)
    ref_mod = rc.import_ref_model("pgl")
    hp = {"embedding_size": 8, "feat_embed_dim": 8, "knn_k": 3,
          "lambda_coeff": 0.9, "n_mm_layers": 1, "n_ui_layers": 2,
          "reg_weight": 0.05, "mm_image_weight": 0.4, "mode": mode,
          "dropout": 0.0, "train_batch_size": 8}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        **hp,
    )
    ref = ref_mod.PGL(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    vals = rc.fill_ref_params(
        ref, seed=seed, exclude=("image_embedding.weight", "text_embedding.weight"))
    ref.eval()
    model, ctx, _, _ = rc.our_model_and_ctx("PGL", data, hp)
    init = _init_our(model, ctx)
    mapping = {
        ("user_image",): "user_image.weight",
        ("user_text",): "user_text.weight",
        ("image_trs", "kernel"): ("image_trs.weight", "T"),
        ("image_trs", "bias"): "image_trs.bias",
        ("text_trs", "kernel"): ("text_trs.weight", "T"),
        ("text_trs", "bias"): "text_trs.bias",
    }
    params = rc.map_flax_params(init, mapping, vals)
    return data, ref, model, ctx, params


def test_pgl_loss_parity_full_graph(tmp_path):
    """PGL loss composition (BPR + reg_weight * dropout-view InfoNCE,
    `pgl.py:245-259`) on the full normalized graph, dropout 0."""
    data, ref, model, ctx, params = _pgl_setup(tmp_path, "local", seed=21)
    ref.sub_graph = ref.norm_adj  # pre-sampling graph == full graph
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp, bn)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)


def test_pgl_prediction_parity(tmp_path):
    """PGL full-catalog scores over norm_adj (`pgl.py:261-269`)."""
    import jax.numpy as jnp

    data, ref, model, ctx, params = _pgl_setup(tmp_path, "local", seed=22)
    users = np.arange(data.n_users, dtype=np.int64)
    with torch.no_grad():
        ref_scores = ref.full_sort_predict([torch.from_numpy(users)]).numpy()
    ue, ie = model.apply({"params": params}, ctx, method="eval_embeddings")
    ours = np.asarray(ue @ ie.T)
    assert np.abs(ours - ref_scores).max() < 1e-4
