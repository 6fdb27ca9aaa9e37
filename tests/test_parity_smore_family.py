"""Exact loss parity for the SMORE family vs the UNMODIFIED reference.

The reference hard-codes ``.cuda()`` (`smore.py:63,73`); `ref_compat`
identity-patches it so the reference's own code runs on CPU.  Each test
builds one tiny graph, instantiates both models, copies identical parameter
values into both, feeds the same batch, and asserts the total loss agrees to
1e-4 — pinning adjacency normalization, kNN graph construction, rFFT
spectral filtering, the preference module, and the loss composition
(`smore.py:366-411`).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import ref_compat as rc


# Shared gate/query mapping pieces: reference `smore.py:84-126` <-> our
# GateMLP/QueryMLP submodule layout.
def _gate(prefix):
    return {
        (prefix, "Dense_0", "kernel"): (f"{prefix}.0.weight", "T"),
        (prefix, "Dense_0", "bias"): f"{prefix}.0.bias",
    }


def _query(prefix):
    return {
        (prefix, "Dense_0", "kernel"): (f"{prefix}.0.weight", "T"),
        (prefix, "Dense_0", "bias"): f"{prefix}.0.bias",
        (prefix, "Dense_1", "kernel"): (f"{prefix}.2.weight", "T"),
    }


def _smore_mapping():
    m = {
        ("user_embedding",): "user_embedding.weight",
        ("item_id_embedding",): "item_id_embedding.weight",
        ("image_trs", "kernel"): ("image_trs.weight", "T"),
        ("image_trs", "bias"): "image_trs.bias",
        ("text_trs", "kernel"): ("text_trs.weight", "T"),
        ("text_trs", "bias"): "text_trs.bias",
        ("image_complex_weight",): "image_complex_weight",
        ("text_complex_weight",): "text_complex_weight",
        ("fusion_complex_weight",): "fusion_complex_weight",
    }
    for g in ("gate_v", "gate_t", "gate_f", "gate_image_prefer",
              "gate_text_prefer", "gate_fusion_prefer"):
        m.update(_gate(g))
    for q in ("query_v", "query_t"):
        m.update(_query(q))
    return m


_SMORE_HP = {
    "embedding_size": 8, "n_ui_layers": 2, "n_layers": 1,
    "reg_weight": 0.01, "cl_loss": 0.1, "cl_temp": 0.2,
    "image_knn_k": 3, "text_knn_k": 2, "dropout_rate": 0.0,
    "inject_mode": "residual", "inject_scale": 0.7,
    "spectral_weight_norm": True, "train_batch_size": 8,
}

_FEATURE_TABLES = ("image_embedding.weight", "text_embedding.weight")


def _run_smore_like(tmp_path, module_name, class_name, extra_ref_cfg,
                    extra_our_cfg, mapping_extra=None, seed=0,
                    ref_class_name=None, pre_epoch=False):
    data = rc.tiny_mm_data(tmp_path, seed=seed)
    ref_mod = rc.import_ref_model(module_name)
    class_name_ref = ref_class_name or class_name
    hp = dict(_SMORE_HP)
    hp.update(extra_ref_cfg)
    cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=data.data_path, dataset=data.dataset,
        vision_feature_file="image_feat.npy",
        text_feature_file="text_feat.npy",
        **hp,
    )
    ref = getattr(ref_mod, class_name_ref)(cfg, rc.FakeRefDataset(
        data.u, data.i, data.n_users, data.n_items))
    vals = rc.fill_ref_params(ref, seed=seed, exclude=_FEATURE_TABLES)
    ref.eval()  # dropout off (we also set dropout_rate=0)
    if pre_epoch:
        # advance to epoch 1: SMOREDiffX's scheduled diff_beta only updates
        # in pre_epoch_processing (`smorediffx.py:241-248`); our side derives
        # it from ctx['epoch'] (default 1) inside the jitted loss
        ref.pre_epoch_processing()
    bu, bp, bn = rc.make_batch(data)
    ref_loss = rc.ref_loss_value(ref, bu, bp, bn)

    our_cfg = dict(_SMORE_HP)
    our_cfg.update(extra_our_cfg)
    model, ctx, bundle, _ = rc.our_model_and_ctx(
        class_name if class_name != "SMORE1" else "SMORE1", data, our_cfg)
    if pre_epoch and "epoch" in ctx:
        import jax.numpy as jnp

        ctx["epoch"] = jnp.asarray(1.0)  # mirror ref.pre_epoch_processing()
    import jax

    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        ctx, {"users": np.zeros(2, np.int32), "pos_items": np.zeros(2, np.int32),
              "neg_items": np.zeros(2, np.int32), "weight": np.ones(2)},
        True, method="loss",
    )
    init = variables["params"]
    extra_vars = (
        {"state": variables["state"]} if "state" in variables else None
    )
    mapping = _smore_mapping()
    if mapping_extra:
        mapping.update(mapping_extra)
    params = rc.map_flax_params(init, mapping, vals)
    ours, parts = rc.our_loss_value(model, ctx, params, bu, bp, bn,
                                    extra_vars=extra_vars)
    assert abs(ours - ref_loss) < 1e-4, (ours, ref_loss, parts)


def test_smore_loss_parity(tmp_path):
    """SMORE: rFFT filters + 3 graph views + preference module + BPR/CL
    (`/root/reference/src/models/smore.py:366-411`)."""
    _run_smore_like(tmp_path, "smore", "SMORE", {}, {})


def test_smore_loss_parity_mul_inject(tmp_path):
    """SMORE 'mul' injection branch (`smore.py:265-268`)."""
    _run_smore_like(
        tmp_path, "smore", "SMORE",
        {"inject_mode": "mul"}, {"inject_mode": "mul"}, seed=3,
    )


def test_smore_loss_parity_no_weight_norm(tmp_path):
    """SMORE with raw (non-unit-magnitude) spectral weights
    (`smore.py:221-229`)."""
    _run_smore_like(
        tmp_path, "smore", "SMORE",
        {"spectral_weight_norm": False}, {"spectral_weight_norm": False},
        seed=4,
    )


def test_smore1_loss_parity(tmp_path):
    """SMORE1: cleaned SMORE with modality flags, 'mul' injection, fixed
    cl temperature 0.2 (`smore1.py:370-380`)."""
    _run_smore_like(tmp_path, "smore1", "SMORE1", {}, {}, seed=5,
                    ref_class_name="SMORE")


@pytest.mark.parametrize("spec_method", ["fft", "dwt", "wiener"])
def test_smorex_loss_parity(tmp_path, spec_method):
    """SMOREX: selectable spectral method — fft / Haar-DWT top-p / Wiener
    shrinkage (`smorex.py:143-194,254-283`)."""
    _run_smore_like(
        tmp_path, "smorex", "SMOREX",
        {"spec_method": spec_method, "dwt_keep_ratio": 0.5,
         "wiener_alpha": 0.5},
        {"spec_method": spec_method, "dwt_keep_ratio": 0.5,
         "wiener_alpha": 0.5},
        seed=6,
    )


_SMOREMG_GATE = {
    ("item_freq_gate", "kernel"): ("item_freq_gate.0.weight", "T"),
    ("item_freq_gate", "bias"): "item_freq_gate.0.bias",
}


def test_smoremg_loss_parity(tmp_path):
    """SMOREMG: item-aware band gate + freq residual injection + low-band
    consistency loss (`smoremg.py:190-223,235-243,319-331,345-369`).
    MG stochastic consistency stays 0 under eval/no-dropout on both sides."""
    extra = {"use_freq_residual": True, "freq_residual_alpha": 0.25,
             "low_freq_ratio": 0.3, "freq_consistency_weight": 0.05,
             "mg_consistency_weight": 0.0}
    _run_smore_like(tmp_path, "smoremg", "SMOREMG",
                    {**extra, "model": "SMOREMG"}, extra,
                    mapping_extra=_SMOREMG_GATE, seed=8)


def test_smoremg_loss_parity_mul_fallback(tmp_path):
    """SMOREMG multiplicative fallback branch (`smoremg.py:239-243`)."""
    extra = {"use_freq_residual": False, "freq_consistency_weight": 0.0}
    _run_smore_like(tmp_path, "smoremg", "SMOREMG",
                    {**extra, "model": "SMOREMG"}, extra,
                    mapping_extra=_SMOREMG_GATE, seed=9)


def test_smorediff_loss_parity_no_mvp(tmp_path):
    """SMOREDiff with diffusion off: spectrum conv + 3 views + CL through
    the Diff code path (`smorediff.py:431-569`); edge-NCE off (its negative
    sampling draws `torch.randint`/`randperm`, `smorediff.py:205-221` —
    unpinnable across frameworks)."""
    extra = {"use_diffusion_mvp": False, "use_edge_nce": False}
    _run_smore_like(tmp_path, "smorediff", "SMOREDiff",
                    extra, extra, seed=12)


def test_smorediff_loss_parity_soft_r(tmp_path):
    """SMOREDiff soft-R reweighting ON: conditional cosine lift, z-score
    gate, tanh down-weighting (`smorediff.py:300-395,443-449`)."""
    extra = {"use_diffusion_mvp": True, "use_edge_nce": False,
             "diff_beta": 0.3, "diff_temp": 0.6, "diff_gamma": 1.2,
             "diff_z_thres": 0.5}
    _run_smore_like(tmp_path, "smorediff", "SMOREDiff",
                    extra, extra, seed=13)


def test_smorediffx_loss_parity(tmp_path):
    """SMOREDiffX with NoiseRecipe off (it draws gaussian noise,
    `smorediffx.py:23-60`) and edge-NCE off: DSPDenoiser + soft-R + CL
    composition (`smorediffx.py:189-330`)."""
    extra = {"use_diffusion_mvp": True, "use_edge_nce": False,
             "noise_recipe_on": False}
    _run_smore_like(tmp_path, "smorediffx", "SMOREDiffX",
                    extra, extra, seed=14, pre_epoch=True)


def test_smorex_loss_parity_softthr(tmp_path):
    """SMOREX DWT soft-threshold branch (`smorex.py:168-172`)."""
    _run_smore_like(
        tmp_path, "smorex", "SMOREX",
        {"spec_method": "dwt", "dwt_use_softthr": True, "dwt_softthr_k": 0.5},
        {"spec_method": "dwt", "dwt_use_softthr": True, "dwt_softthr_k": 0.5},
        seed=7,
    )
