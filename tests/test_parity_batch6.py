"""Exact parity vs the unmodified reference: MMGCN, MVGAE, LightGCNCLIP.

MMGCN/MVGAE reference quirk: ``id_embedding`` / ``preference`` /
``collaborative`` are created as raw tensors that ``.to(device)`` detaches
from the parameter list (`mmgcn.py:55-56,126-141`, `mvgae.py:43,201-215`) —
frozen random projections.  Our models store them in ctx; the tests copy
the reference's actual tensors across.  MVGAE is pinned in eval mode
(``reparametrize`` returns mu, `mvgae.py:66-70`); its conv dropout
(`mvgae.py:345`) is off under eval on both sides.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import ref_compat as rc
from tests.test_parity_batch2 import _init_our


def _t2n(t):
    return np.asarray(t.detach().cpu().numpy())


def test_mmgcn_loss_parity(tmp_path):
    """MMGCN: 3 fixed conv blocks per modality tower, modality mean,
    matmul-BPR via the [[1],[-1]] weight + reg on frozen id/preference
    (`mmgcn.py:64-97,164-188`)."""
    data = rc.tiny_mm_data(tmp_path, seed=50)
    ref_mod = rc.import_ref_model("mmgcn")
    hp = {"embedding_size": 8, "n_layers": 2, "reg_weight": 0.01,
          "train_batch_size": 8}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        **hp,
    )
    ref = ref_mod.MMGCN(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    vals = rc.fill_ref_params(ref, seed=50)
    ref.eval()
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)

    model, ctx, _, _ = rc.our_model_and_ctx("MMGCN", data, hp)
    # frozen non-parameter tensors ride in ctx
    ctx["id_embedding"] = _t2n(ref.id_embedding)
    ctx["v_preference"] = _t2n(ref.v_gcn.preference)
    ctx["t_preference"] = _t2n(ref.t_gcn.preference)
    init = _init_our(model, ctx)
    mapping = {
        ("v_gcn", "MLP", "kernel"): ("v_gcn.MLP.weight", "T"),
        ("v_gcn", "MLP", "bias"): "v_gcn.MLP.bias",
    }
    for tower in ("v_gcn", "t_gcn"):
        for k in (1, 2, 3):
            mapping[(tower, f"conv_w{k}")] = f"{tower}.conv_embed_{k}.weight"
            mapping[(tower, f"linear{k}", "kernel")] = (
                f"{tower}.linear_layer{k}.weight", "T")
            mapping[(tower, f"linear{k}", "bias")] = f"{tower}.linear_layer{k}.bias"
            mapping[(tower, f"g{k}", "kernel")] = (f"{tower}.g_layer{k}.weight", "T")
            mapping[(tower, f"g{k}", "bias")] = f"{tower}.g_layer{k}.bias"
    params = rc.map_flax_params(init, mapping, vals)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp, bn)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)


def test_mvgae_loss_parity(tmp_path):
    """MVGAE: 3 variational towers -> double PoE fusion; per-space recon
    (sigmoided max-neg decode, raw item ids — `mvgae.py:73-136`) + beta*KL,
    eval mode (z == mu)."""
    data = rc.tiny_mm_data(tmp_path, seed=51)
    ref_mod = rc.import_ref_model("mvgae")
    hp = {"embedding_size": 8, "n_layers": 2, "beta": 0.1,
          "train_batch_size": 8}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        **hp,
    )
    ref = ref_mod.MVGAE(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    vals = rc.fill_ref_params(ref, seed=51)
    ref.eval()
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)

    model, ctx, _, _ = rc.our_model_and_ctx("MVGAE", data, hp)
    ctx["collaborative"] = _t2n(ref.collaborative)
    ctx["v_preference"] = _t2n(ref.v_gcn.preference)
    ctx["t_preference"] = _t2n(ref.t_gcn.preference)
    ctx["c_preference"] = _t2n(ref.c_gcn.preference)
    variables = _init_our(model, ctx, state=True)
    init = variables["params"]
    mapping = {}
    for tower in ("v_gcn", "t_gcn", "c_gcn"):
        mapping[(tower, "MLP", "kernel")] = (f"{tower}.MLP.weight", "T")
        mapping[(tower, "MLP", "bias")] = f"{tower}.MLP.bias"
        for k in (1, 2, 4, 5):
            mapping[(tower, f"conv_w{k}")] = f"{tower}.conv_embed_{k}.weight"
            mapping[(tower, f"conv_b{k}")] = f"{tower}.conv_embed_{k}.bias"
            mapping[(tower, f"g{k}", "kernel")] = (f"{tower}.g_layer{k}.weight", "T")
            mapping[(tower, f"g{k}", "bias")] = f"{tower}.g_layer{k}.bias"
        for k in (4, 5):
            mapping[(tower, f"linear{k}", "kernel")] = (
                f"{tower}.linear_layer{k}.weight", "T")
            mapping[(tower, f"linear{k}", "bias")] = f"{tower}.linear_layer{k}.bias"
    params = rc.map_flax_params(init, mapping, vals)
    ours, parts = rc.our_loss_value(
        model, ctx, params, bu, bp, bn, train=False,
        extra_vars={"state": variables["state"]},
    )
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)


def test_lightgcnclip_loss_parity(tmp_path):
    """LightGCNCLIP: LightGCN over id + degree-gated normalized modality
    residual branch; BPR + EmbLoss (+ optional cosine align,
    `lightgcnclip.py:152-247`)."""
    import jax.numpy as jnp

    data = rc.tiny_mm_data(tmp_path, seed=52)
    ref_mod = rc.import_ref_model("lightgcnclip")
    hp = {"embedding_size": 8, "n_layers": 2, "reg_weight": 0.01,
          "feat_embed_dim": 8, "use_branch_norm": True,
          "use_degree_gate": True, "modal_drop_rate": 0.0,
          "res_alpha": 0.2, "res_alpha_min": 0.0,
          "mod_align_weight": 0.1, "mod_align_use_cosine": True,
          "train_batch_size": 8}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        **hp,
    )
    ref = ref_mod.LightGCNCLIP(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    vals = rc.fill_ref_params(
        ref, seed=52, exclude=("image_embedding.weight", "text_embedding.weight"))
    ref.eval()
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)

    model, ctx, _, _ = rc.our_model_and_ctx("LightGCNCLIP", data, hp)
    init = _init_our(model, ctx)
    mapping = {
        ("user_emb",): "embedding_dict.user_emb",
        ("item_emb",): "embedding_dict.item_emb",
        ("all_trs", "kernel"): ("all_trs.weight", "T"),
        ("all_trs", "bias"): "all_trs.bias",
    }
    params = rc.map_flax_params(init, mapping, vals)
    # ours stores res_alpha as shape (1,) (0-d params pathological on the
    # axon backend, see CLAUDE.md); the reference keeps a 0-d scalar
    params["res_alpha"] = jnp.asarray(vals["res_alpha"]).reshape(1)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp, bn)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)
