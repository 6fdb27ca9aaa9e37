"""Exact loss parity vs the unmodified reference: MGCN, LATTICE, LGMRec.

Same harness as `test_parity_smore_family`: identical tiny graph, identical
parameters, identical batch, loss match to 1e-4.  LGMRec's gumbel-softmax
draws noise that cannot be equated across torch/jax RNGs, so BOTH sides get
the noise zeroed (softmax(logits/tau)) — every other line of the reference
executes unmodified.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import ref_compat as rc
from tests.test_parity_smore_family import _gate, _query


def _init_our(model, ctx, with_neg=True, state=False):
    import jax

    batch = {"users": np.zeros(2, np.int32), "pos_items": np.zeros(2, np.int32),
             "weight": np.ones(2)}
    if with_neg:
        batch["neg_items"] = np.zeros(2, np.int32)
    out = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "sample": jax.random.key(2)},
        ctx, batch, True, method="loss",
    )
    return out if state else out["params"]


def test_mgcn_loss_parity(tmp_path):
    """MGCN: purifier gates + fuser attention + InfoNCE at tau 0.2
    (`/root/reference/src/models/mgcn.py:146-253`)."""
    data = rc.tiny_mm_data(tmp_path, seed=10)
    ref_mod = rc.import_ref_model("mgcn")
    hp = {"embedding_size": 8, "n_ui_layers": 2, "n_layers": 1, "knn_k": 3,
          "reg_weight": 0.01, "cl_loss": 0.1, "train_batch_size": 8}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        **hp,
    )
    ref = ref_mod.MGCN(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    vals = rc.fill_ref_params(
        ref, seed=10, exclude=("image_embedding.weight", "text_embedding.weight"))
    ref.eval()
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)

    model, ctx, _, _ = rc.our_model_and_ctx("MGCN", data, hp)
    init = _init_our(model, ctx)
    mapping = {
        ("user_embedding",): "user_embedding.weight",
        ("item_id_embedding",): "item_id_embedding.weight",
        ("image_trs", "kernel"): ("image_trs.weight", "T"),
        ("image_trs", "bias"): "image_trs.bias",
        ("text_trs", "kernel"): ("text_trs.weight", "T"),
        ("text_trs", "bias"): "text_trs.bias",
    }
    for g in ("gate_v", "gate_t", "gate_image_prefer", "gate_text_prefer"):
        mapping.update(_gate(g))
    mapping.update(_query("query_common"))
    params = rc.map_flax_params(init, mapping, vals)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp, bn)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)


@pytest.mark.parametrize("cf_model", ["mf", "lightgcn", "ngcf"])
def test_lattice_loss_parity(tmp_path, cf_model):
    """LATTICE: learned blended item graph + rw-normalized self-loop u-i
    adjacency, all 3 CF branches (`lattice.py:132-197`)."""
    data = rc.tiny_mm_data(tmp_path, seed=11)
    ref_mod = rc.import_ref_model("lattice")
    hp = {"embedding_size": 8, "feat_embed_dim": 8, "weight_size": [8, 8],
          "knn_k": 3, "lambda_coeff": 0.7, "cf_model": cf_model,
          "n_layers": 1, "reg_weight": 0.02, "mess_dropout": [0.0, 0.0],
          "train_batch_size": 8}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        **hp,
    )
    ref = ref_mod.LATTICE(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    vals = rc.fill_ref_params(
        ref, seed=11, exclude=("image_embedding.weight", "text_embedding.weight"))
    ref.eval()
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)

    model, ctx, _, _ = rc.our_model_and_ctx("LATTICE", data, hp)
    variables = _init_our(model, ctx, state=True)
    init = variables["params"]
    state = {"state": variables["state"]}
    mapping = {
        ("user_embedding",): "user_embedding.weight",
        ("item_id_embedding",): "item_id_embedding.weight",
        ("image_trs", "kernel"): ("image_trs.weight", "T"),
        ("image_trs", "bias"): "image_trs.bias",
        ("text_trs", "kernel"): ("text_trs.weight", "T"),
        ("text_trs", "bias"): "text_trs.bias",
        ("modal_weight",): "modal_weight",
    }
    if cf_model == "ngcf":
        for i in range(2):
            mapping[(f"gc_{i}", "kernel")] = (f"GC_Linear_list.{i}.weight", "T")
            mapping[(f"gc_{i}", "bias")] = f"GC_Linear_list.{i}.bias"
            mapping[(f"bi_{i}", "kernel")] = (f"Bi_Linear_list.{i}.weight", "T")
            mapping[(f"bi_{i}", "bias")] = f"Bi_Linear_list.{i}.bias"
    params = rc.map_flax_params(init, mapping, vals)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp, bn,
                                    extra_vars=state)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)


def test_lgmrec_loss_parity(tmp_path, monkeypatch):
    """LGMRec: CGE+MGE local, hypergraph global, sum-form contrastive,
    norm-based reg (`lgmrec.py:115-194`).  Gumbel noise zeroed on both
    sides; keep_rate=1 turns the hyperedge dropout off."""
    import torch.nn.functional as F
    import jax
    import jax.numpy as jnp

    data = rc.tiny_mm_data(tmp_path, seed=12)
    ref_mod = rc.import_ref_model("lgmrec")
    # zero-noise gumbel: plain softmax(logits / tau) on both sides
    monkeypatch.setattr(
        F, "gumbel_softmax",
        lambda logits, tau=1.0, dim=1, hard=False: torch.softmax(logits / tau, dim=dim),
    )
    import recommendar_systems_tpu.models.lgmrec as our_mod

    monkeypatch.setattr(
        our_mod, "gumbel_softmax",
        lambda rng, logits, tau: jax.nn.softmax(logits / tau, axis=1),
    )

    hp = {"embedding_size": 8, "feat_embed_dim": 8, "cf_model": "lightgcn",
          "n_mm_layers": 1, "n_ui_layers": 2, "n_hyper_layer": 1,
          "hyper_num": 4, "keep_rate": 1.0, "alpha": 0.3,
          "cl_weight": 0.01, "reg_weight": 0.1, "train_batch_size": 8}
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        **hp,
    )
    ref = ref_mod.LGMRec(cfg, rc.FakeRefDataset(data.u, data.i, data.n_users, data.n_items))
    vals = rc.fill_ref_params(
        ref, seed=12, exclude=("image_embedding.weight", "text_embedding.weight"))
    ref.eval()
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)

    model, ctx, _, _ = rc.our_model_and_ctx("LGMRec", data, hp)
    init = _init_our(model, ctx)
    mapping = {
        ("user_embedding",): "user_embedding.weight",
        ("item_id_embedding",): "item_id_embedding.weight",
        ("item_image_trs",): "item_image_trs",
        ("item_text_trs",): "item_text_trs",
        ("v_hyper",): "v_hyper",
        ("t_hyper",): "t_hyper",
    }
    params = rc.map_flax_params(init, mapping, vals)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp, bn)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)
