"""Numerical parity against the actual reference implementation.

Builds a tiny interaction graph, instantiates the UNMODIFIED reference model
(`/root/reference/src`, torch CPU) and ours, copies the SAME parameter
values into both, feeds the SAME batch, and asserts the loss values match to
float tolerance.  This pins the exact math (adjacency normalization,
propagation, loss composition) rather than just end-metric similarity.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _stub_torchvision():
    tv = types.ModuleType("torchvision")
    tv.__path__ = []
    transforms = types.ModuleType("torchvision.transforms")
    transforms.__path__ = []
    functional = types.ModuleType("torchvision.transforms.functional")
    for name in ("Normalize", "Compose", "ToTensor", "Resize"):
        setattr(transforms, name, lambda *a, **k: None)
    functional.pad = lambda *a, **k: None
    functional.resize = lambda *a, **k: None
    tv.transforms = transforms
    transforms.functional = functional
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", transforms)
    sys.modules.setdefault("torchvision.transforms.functional", functional)


@pytest.fixture(scope="module")
def ref_modules():
    _stub_torchvision()
    sys.path.insert(0, "/root/reference/src")
    import importlib

    lightgcn = importlib.import_module("models.lightgcn")
    return {"lightgcn": lightgcn}


class _FakeRefDataset:
    """Duck-types the reference TrainDataLoader for model constructors."""

    def __init__(self, u, i, n_users, n_items):
        from scipy.sparse import coo_matrix

        self._mat = coo_matrix(
            (np.ones(len(u), np.float32), (u, i)), shape=(n_users, n_items)
        )

        class _DS:
            def get_user_num(self_inner):
                return n_users

            def get_item_num(self_inner):
                return n_items

        self.dataset = _DS()

    def inter_matrix(self, form="coo"):
        return self._mat if form == "coo" else self._mat.tocsr()


def _ref_config(**kw):
    base = {
        "USER_ID_FIELD": "userID", "ITEM_ID_FIELD": "itemID",
        "NEG_PREFIX": "neg__", "train_batch_size": 8, "device": "cpu",
        "end2end": True, "is_multimodal_model": False,
        "embedding_size": 8, "n_layers": 2, "reg_weight": 0.01,
    }
    base.update(kw)
    return base


def test_lightgcn_loss_parity(ref_modules):
    import jax
    import jax.numpy as jnp

    from recommendar_systems_tpu.data.dataset import build_rec_dataset
    from recommendar_systems_tpu.data.arrays import build_data_bundle
    from recommendar_systems_tpu.models.lightgcn import LightGCN
    from recommendar_systems_tpu.utils.configurator import Config

    rng = np.random.default_rng(0)
    n_users, n_items, E = 12, 9, 40
    u = rng.integers(0, n_users, E)
    i = rng.integers(0, n_items, E)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0], pairs[:, 1]

    # ---- reference model
    ref_cls = ref_modules["lightgcn"].LightGCN
    ref = ref_cls(_ref_config(), _FakeRefDataset(u, i, n_users, n_items))
    ue = rng.normal(size=(n_users, 8)).astype(np.float32)
    ie = rng.normal(size=(n_items, 8)).astype(np.float32)
    with torch.no_grad():
        ref.embedding_dict["user_emb"].copy_(torch.from_numpy(ue))
        ref.embedding_dict["item_emb"].copy_(torch.from_numpy(ie))

    B = 6
    bu = rng.integers(0, n_users, B)
    bp = i[rng.integers(0, len(i), B)]
    bn = rng.integers(0, n_items, B)
    ref_loss = float(
        ref.calculate_loss(
            [torch.from_numpy(bu).long(), torch.from_numpy(bp).long(),
             torch.from_numpy(bn).long()]
        )
    )

    # ---- ours with the same parameters
    labels = np.zeros(len(u), dtype=np.int64)
    ds = build_rec_dataset(np.concatenate([u, [n_users - 1]]),
                           np.concatenate([i, [n_items - 1]]),
                           np.concatenate([labels, [0]]))
    # counts must match exactly
    assert ds.n_users == n_users and ds.n_items == n_items
    cfg = Config("LightGCN", "synthetic", config_dict={
        "embedding_size": 8, "n_layers": 2, "reg_weight": 0.01,
        "eval_batch_size": 8,
    })
    data = build_data_bundle(ds, cfg)
    model = LightGCN.from_config(cfg, data)
    # ctx built from ds train (includes the one extra anchor edge) — rebuild
    # the adjacency from exactly the reference's edges instead:
    from recommendar_systems_tpu.graph.build import build_norm_adj

    ctx = {"norm_adj": build_norm_adj(u, i, n_users, n_items)}
    params = {"user_emb": jnp.asarray(ue), "item_emb": jnp.asarray(ie)}
    batch = {
        "users": jnp.asarray(bu, dtype=jnp.int32),
        "pos_items": jnp.asarray(bp, dtype=jnp.int32),
        "neg_items": jnp.asarray(bn, dtype=jnp.int32),
        "weight": jnp.ones(B),
    }
    total, parts = model.apply({"params": params}, ctx, batch, True, method="loss")
    assert abs(float(total) - ref_loss) < 1e-4, (float(total), ref_loss)


def test_vbpr_loss_parity(ref_modules, tmp_path):
    import importlib

    import jax.numpy as jnp

    vbpr_ref = importlib.import_module("models.vbpr")

    rng = np.random.default_rng(2)
    n_users, n_items, d = 9, 7, 8
    v_feat = rng.normal(size=(n_items, 12)).astype(np.float32)
    t_feat = rng.normal(size=(n_items, 10)).astype(np.float32)
    ds_dir = tmp_path / "tiny2"
    ds_dir.mkdir()
    np.save(ds_dir / "image_feat.npy", v_feat)
    np.save(ds_dir / "text_feat.npy", t_feat)

    ref_cfg = _ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=str(tmp_path) + "/", dataset="tiny2",
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        reg_weight=0.05,
    )
    u = rng.integers(0, n_users, 20)
    i = rng.integers(0, n_items, 20)
    ref = vbpr_ref.VBPR(ref_cfg, _FakeRefDataset(u, i, n_users, n_items))
    ue = rng.normal(size=(n_users, 2 * d)).astype(np.float32)
    ie = rng.normal(size=(n_items, d)).astype(np.float32)
    w_lin = rng.normal(size=(d, 22)).astype(np.float32) * 0.1
    b_lin = rng.normal(size=(d,)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref.u_embedding.copy_(torch.from_numpy(ue))
        ref.i_embedding.copy_(torch.from_numpy(ie))
        ref.item_linear.weight.copy_(torch.from_numpy(w_lin))
        ref.item_linear.bias.copy_(torch.from_numpy(b_lin))
    B = 5
    bu = rng.integers(0, n_users, B)
    bp = rng.integers(0, n_items, B)
    bn = rng.integers(0, n_items, B)
    ref_loss = float(ref.calculate_loss(
        [torch.from_numpy(bu).long(), torch.from_numpy(bp).long(),
         torch.from_numpy(bn).long()]).detach())

    from recommendar_systems_tpu.data.dataset import build_rec_dataset
    from recommendar_systems_tpu.data.arrays import build_data_bundle
    from recommendar_systems_tpu.models.vbpr import VBPR
    from recommendar_systems_tpu.utils.configurator import Config

    ds = build_rec_dataset(u, i, np.zeros(len(u), np.int64),
                           v_feat=v_feat, t_feat=t_feat)
    cfg = Config("VBPR", "synthetic", config_dict={
        "embedding_size": d, "reg_weight": 0.05, "eval_batch_size": 8,
    })
    data = build_data_bundle(ds, cfg)
    model = VBPR.from_config(cfg, data)
    ctx = VBPR.build_ctx(cfg, data)
    params = {
        "u_embedding": jnp.asarray(ue),
        "i_embedding": jnp.asarray(ie),
        "item_linear": {"kernel": jnp.asarray(w_lin.T), "bias": jnp.asarray(b_lin)},
    }
    batch = {
        "users": jnp.asarray(bu, dtype=jnp.int32),
        "pos_items": jnp.asarray(bp, dtype=jnp.int32),
        "neg_items": jnp.asarray(bn, dtype=jnp.int32),
        "weight": jnp.ones(B),
    }
    total, _ = model.apply({"params": params}, ctx, batch, True, method="loss")
    assert abs(float(total) - ref_loss) < 1e-4, (float(total), ref_loss)


def test_bm3_loss_parity(ref_modules, tmp_path):
    """BM3 with dropout=0 (deterministic targets)."""
    import importlib

    import jax
    import jax.numpy as jnp

    bm3_ref = importlib.import_module("models.bm3")

    rng = np.random.default_rng(3)
    n_users, n_items, d = 9, 7, 8
    v_feat = rng.normal(size=(n_items, 12)).astype(np.float32)
    t_feat = rng.normal(size=(n_items, 10)).astype(np.float32)
    ds_dir = tmp_path / "tiny3"
    ds_dir.mkdir()
    np.save(ds_dir / "image_feat.npy", v_feat)
    np.save(ds_dir / "text_feat.npy", t_feat)

    u = rng.integers(0, n_users, 20)
    i = rng.integers(0, n_items, 20)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0], pairs[:, 1]

    ref_cfg = _ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=str(tmp_path) + "/", dataset="tiny3",
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        n_layers=1, reg_weight=0.1, cl_weight=2.0, dropout=0.0,
    )
    ref = bm3_ref.BM3(ref_cfg, _FakeRefDataset(u, i, n_users, n_items))
    ue = rng.normal(size=(n_users, d)).astype(np.float32)
    ie = rng.normal(size=(n_items, d)).astype(np.float32)
    w_p = rng.normal(size=(d, d)).astype(np.float32) * 0.1
    b_p = rng.normal(size=(d,)).astype(np.float32) * 0.1
    w_i = rng.normal(size=(d, 12)).astype(np.float32) * 0.1
    b_i = rng.normal(size=(d,)).astype(np.float32) * 0.1
    w_t = rng.normal(size=(d, 10)).astype(np.float32) * 0.1
    b_t = rng.normal(size=(d,)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref.user_embedding.weight.copy_(torch.from_numpy(ue))
        ref.item_id_embedding.weight.copy_(torch.from_numpy(ie))
        ref.predictor.weight.copy_(torch.from_numpy(w_p))
        ref.predictor.bias.copy_(torch.from_numpy(b_p))
        ref.image_trs.weight.copy_(torch.from_numpy(w_i))
        ref.image_trs.bias.copy_(torch.from_numpy(b_i))
        ref.text_trs.weight.copy_(torch.from_numpy(w_t))
        ref.text_trs.bias.copy_(torch.from_numpy(b_t))
    ref.eval()  # dropout off
    B = 5
    bu = rng.integers(0, n_users, B)
    bp = rng.integers(0, n_items, B)
    ref_loss = float(ref.calculate_loss(
        [torch.from_numpy(bu).long(), torch.from_numpy(bp).long()]).detach())

    from recommendar_systems_tpu.data.dataset import build_rec_dataset
    from recommendar_systems_tpu.data.arrays import build_data_bundle
    from recommendar_systems_tpu.models.bm3 import BM3
    from recommendar_systems_tpu.utils.configurator import Config

    ds = build_rec_dataset(u, i, np.zeros(len(u), np.int64),
                           v_feat=v_feat, t_feat=t_feat)
    assert ds.n_users == n_users and ds.n_items == n_items
    cfg = Config("BM3", "synthetic", config_dict={
        "embedding_size": d, "n_layers": 1, "reg_weight": 0.1,
        "cl_weight": 2.0, "dropout": 0.0, "eval_batch_size": 8,
    })
    data = build_data_bundle(ds, cfg)
    model = BM3.from_config(cfg, data)
    ctx = BM3.build_ctx(cfg, data)
    params = {
        "user_embedding": jnp.asarray(ue),
        "item_id_embedding": jnp.asarray(ie),
        "predictor": {"kernel": jnp.asarray(w_p.T), "bias": jnp.asarray(b_p)},
        "image_trs": {"kernel": jnp.asarray(w_i.T), "bias": jnp.asarray(b_i)},
        "text_trs": {"kernel": jnp.asarray(w_t.T), "bias": jnp.asarray(b_t)},
    }
    batch = {
        "users": jnp.asarray(bu, dtype=jnp.int32),
        "pos_items": jnp.asarray(bp, dtype=jnp.int32),
        "weight": jnp.ones(B),
    }
    total, _ = model.apply(
        {"params": params}, ctx, batch, True, method="loss",
        rngs={"dropout": jax.random.key(0)},
    )
    assert abs(float(total) - ref_loss) < 1e-4, (float(total), ref_loss)


def test_freedom_loss_parity(ref_modules, tmp_path):
    """FREEDOM: frozen mm kNN graph + LightGCN + modality-BPR regularizers.

    (Models that hard-code ``.cuda()`` — GRCN/LATTICE/MENTOR/MGCN/SMORE* —
    are covered by the `test_parity_*` files via `ref_compat`'s identity
    patch; FREEDOM runs unpatched.)
    """
    import importlib

    import jax.numpy as jnp

    freedom_ref = importlib.import_module("models.freedom")

    rng = np.random.default_rng(1)
    n_users, n_items, E, d = 10, 8, 30, 8
    u = rng.integers(0, n_users, E)
    i = rng.integers(0, n_items, E)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0], pairs[:, 1]
    v_feat = rng.normal(size=(n_items, 12)).astype(np.float32)
    t_feat = rng.normal(size=(n_items, 10)).astype(np.float32)

    ds_dir = tmp_path / "tiny"
    ds_dir.mkdir()
    np.save(ds_dir / "image_feat.npy", v_feat)
    np.save(ds_dir / "text_feat.npy", t_feat)

    ref_cfg = _ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=str(tmp_path) + "/", dataset="tiny",
        vision_feature_file="image_feat.npy", text_feature_file="text_feat.npy",
        feat_embed_dim=d, knn_k=3, lambda_coeff=0.9, cf_model="lightgcn",
        n_mm_layers=1, n_ui_layers=2, mm_image_weight=0.4,
        dropout=0.0, degree_ratio=1.0, reg_weight=0.1,
    )
    ref = freedom_ref.FREEDOM(ref_cfg, _FakeRefDataset(u, i, n_users, n_items))
    ref.pre_epoch_processing()  # dropout 0 -> masked_adj = norm_adj

    ue = rng.normal(size=(n_users, d)).astype(np.float32)
    ie = rng.normal(size=(n_items, d)).astype(np.float32)
    w_img = rng.normal(size=(d, 12)).astype(np.float32) * 0.1
    b_img = rng.normal(size=(d,)).astype(np.float32) * 0.1
    w_txt = rng.normal(size=(d, 10)).astype(np.float32) * 0.1
    b_txt = rng.normal(size=(d,)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref.user_embedding.weight.copy_(torch.from_numpy(ue))
        ref.item_id_embedding.weight.copy_(torch.from_numpy(ie))
        ref.image_trs.weight.copy_(torch.from_numpy(w_img))
        ref.image_trs.bias.copy_(torch.from_numpy(b_img))
        ref.text_trs.weight.copy_(torch.from_numpy(w_txt))
        ref.text_trs.bias.copy_(torch.from_numpy(b_txt))

    B = 5
    bu = rng.integers(0, n_users, B)
    bp = i[rng.integers(0, len(i), B)]
    bn = rng.integers(0, n_items, B)
    ref_loss = float(
        ref.calculate_loss(
            [torch.from_numpy(bu).long(), torch.from_numpy(bp).long(),
             torch.from_numpy(bn).long()]
        ).detach()
    )

    # ---- ours
    from recommendar_systems_tpu.data.dataset import build_rec_dataset
    from recommendar_systems_tpu.data.arrays import build_data_bundle
    from recommendar_systems_tpu.models.freedom import FREEDOM
    from recommendar_systems_tpu.utils.configurator import Config

    ds = build_rec_dataset(u, i, np.zeros(len(u), np.int64),
                           v_feat=v_feat, t_feat=t_feat)
    assert ds.n_users == n_users and ds.n_items == n_items
    cfg = Config("FREEDOM", "synthetic", config_dict={
        "embedding_size": d, "feat_embed_dim": d, "knn_k": 3,
        "n_mm_layers": 1, "n_ui_layers": 2, "mm_image_weight": 0.4,
        "dropout": 0.0, "reg_weight": 0.1, "eval_batch_size": 8,
        "data_path": str(tmp_path) + "/nocache-",
    })
    data = build_data_bundle(ds, cfg)
    model = FREEDOM.from_config(cfg, data)
    ctx = FREEDOM.build_ctx(cfg, data)
    params = {
        "user_embedding": jnp.asarray(ue),
        "item_id_embedding": jnp.asarray(ie),
        "image_trs": {"kernel": jnp.asarray(w_img.T), "bias": jnp.asarray(b_img)},
        "text_trs": {"kernel": jnp.asarray(w_txt.T), "bias": jnp.asarray(b_txt)},
    }
    batch = {
        "users": jnp.asarray(bu, dtype=jnp.int32),
        "pos_items": jnp.asarray(bp, dtype=jnp.int32),
        "neg_items": jnp.asarray(bn, dtype=jnp.int32),
        "weight": jnp.ones(B),
    }
    total, parts = model.apply({"params": params}, ctx, batch, True, method="loss")
    assert abs(float(total) - ref_loss) < 1e-4, (float(total), ref_loss)
