"""Compatibility layer for executing the UNMODIFIED reference models on CPU.

The reference hard-codes ``.cuda()`` in several models (`smore.py:63,73`,
`grcn.py:127,318`) and depends on native extensions that are absent from
this image (`torch_geometric`, `torch_scatter`, `sparsesvd`).  To pin exact
numeric parity against the reference's own code, this module provides:

- a monkeypatch turning ``Tensor.cuda`` / ``Module.cuda`` into identity;
- a faithful minimal ``torch_geometric`` shim implementing the PyG
  ``MessagePassing`` semantics the reference actually uses (flow
  source_to_target: messages from ``edge_index[0]`` aggregated onto
  ``edge_index[1]``; ``_i``/``_j`` argument resolution; add/mean/max
  aggregation), plus ``softmax`` / ``degree`` / self-loop utilities;
- ``torch_scatter.scatter_add`` (used by `utils.py:139-152`);
- ``sparsesvd`` backed by dense numpy SVD (used by `pgl.py:140`).

Only generic library plumbing is shimmed — every line of model math that the
parity tests execute is the reference's own.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch


# --------------------------------------------------------------------------
# scatter primitives
# --------------------------------------------------------------------------

def _scatter(src, index, dim=0, dim_size=None, reduce="add"):
    if dim_size is None:
        dim_size = int(index.max()) + 1 if index.numel() else 0
    shape = list(src.shape)
    shape[dim] = dim_size
    idx = index
    if src.dim() > 1:
        view = [1] * src.dim()
        view[dim] = -1
        idx = index.view(view).expand_as(src)
    if reduce in ("add", "sum"):
        return torch.zeros(shape, dtype=src.dtype).scatter_add_(dim, idx, src)
    if reduce == "mean":
        out = torch.zeros(shape, dtype=src.dtype).scatter_add_(dim, idx, src)
        cnt = torch.zeros(dim_size, dtype=src.dtype).scatter_add_(
            0, index, torch.ones_like(index, dtype=src.dtype)
        )
        cnt = cnt.clamp(min=1)
        view = [1] * src.dim()
        view[dim] = -1
        return out / cnt.view(view)
    if reduce == "max":
        out = torch.full(shape, float("-inf"), dtype=src.dtype)
        out = out.scatter_reduce_(dim, idx, src, reduce="amax", include_self=True)
        return out.masked_fill(out == float("-inf"), 0.0)
    raise ValueError(f"unknown reduce {reduce}")


def _pyg_softmax(src, index, num_nodes=None):
    """Edge-softmax grouped by ``index`` (PyG ``utils.softmax`` semantics)."""
    n = num_nodes if num_nodes is not None else int(index.max()) + 1
    fill = torch.full((n,) + src.shape[1:], float("-inf"), dtype=src.dtype)
    idx = index
    if src.dim() > 1:
        idx = index.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
        grouped_max = fill.scatter_reduce(0, idx, src, reduce="amax", include_self=True)
    else:
        grouped_max = fill.scatter_reduce(0, idx, src, reduce="amax", include_self=True)
    out = (src - grouped_max.index_select(0, index)).exp()
    denom = _scatter(out, index, dim=0, dim_size=n, reduce="add")
    return out / (denom.index_select(0, index) + 1e-16)


# --------------------------------------------------------------------------
# torch_geometric shim
# --------------------------------------------------------------------------

def _build_torch_geometric():
    import inspect

    tg = types.ModuleType("torch_geometric")
    tg.__path__ = []
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn.__path__ = []
    tg_conv = types.ModuleType("torch_geometric.nn.conv")
    tg_inits = types.ModuleType("torch_geometric.nn.inits")
    tg_utils = types.ModuleType("torch_geometric.utils")

    class MessagePassing(torch.nn.Module):
        """PyG MessagePassing core: flow='source_to_target' (j=row 0 sends,
        i=row 1 receives), signature-inspected message/update kwargs."""

        def __init__(self, aggr="add", flow="source_to_target", node_dim=0, **kw):
            super().__init__()
            self.aggr = aggr
            self.flow = flow
            self.node_dim = node_dim

        def propagate(self, edge_index, size=None, **kwargs):
            x = kwargs.get("x")
            if size is None:
                n = x.size(self.node_dim) if torch.is_tensor(x) else None
                size = [n, n]
            else:
                size = list(size)
            i, j = (1, 0) if self.flow == "source_to_target" else (0, 1)
            idx_i, idx_j = edge_index[i], edge_index[j]

            def resolve(name):
                if name.endswith("_i") or name.endswith("_j"):
                    base, suf = name[:-2], name[-1]
                    eidx = idx_i if suf == "i" else idx_j
                    dim = size[i] if suf == "i" else size[j]
                    if base == "edge_index":
                        return eidx
                    if base == "size":
                        return dim
                    val = kwargs[base]
                    return val.index_select(self.node_dim, eidx)
                if name == "edge_index":
                    return edge_index
                if name == "size":
                    return size
                return kwargs[name]

            msg_names = [
                p for p in inspect.signature(self.message).parameters
                if p not in ("self",)
            ]
            out = self.message(**{n: resolve(n) for n in msg_names})
            dim_size = size[i] if size[i] is not None else None
            out = _scatter(out, idx_i, dim=self.node_dim,
                           dim_size=dim_size, reduce=self.aggr)
            upd_names = list(inspect.signature(self.update).parameters)[1:]
            return self.update(out, **{n: resolve(n) for n in upd_names})

        def message(self, x_j):  # pragma: no cover - always overridden
            return x_j

        def update(self, aggr_out):  # pragma: no cover - always overridden
            return aggr_out

    def remove_self_loops(edge_index, edge_attr=None):
        mask = edge_index[0] != edge_index[1]
        edge_index = edge_index[:, mask]
        if edge_attr is not None:
            edge_attr = edge_attr[mask]
        return edge_index, edge_attr

    def add_self_loops(edge_index, edge_attr=None, num_nodes=None):
        n = num_nodes if num_nodes is not None else int(edge_index.max()) + 1
        loops = torch.arange(n, dtype=edge_index.dtype).unsqueeze(0).repeat(2, 1)
        return torch.cat([edge_index, loops], dim=1), edge_attr

    def degree(index, num_nodes=None, dtype=None):
        n = num_nodes if num_nodes is not None else int(index.max()) + 1
        out = torch.zeros(n, dtype=dtype or torch.float32)
        return out.scatter_add_(0, index, torch.ones_like(index, dtype=out.dtype))

    def dropout_adj(edge_index, edge_attr=None, p=0.5, training=True):
        if p == 0.0 or not training:
            return edge_index, edge_attr
        mask = torch.rand(edge_index.size(1)) >= p
        edge_index = edge_index[:, mask]
        if edge_attr is not None:
            edge_attr = edge_attr[mask]
        return edge_index, edge_attr

    def uniform(size, tensor):
        if tensor is not None:
            bound = 1.0 / np.sqrt(size)
            tensor.data.uniform_(-bound, bound)

    tg_conv.MessagePassing = MessagePassing
    tg_nn.conv = tg_conv
    tg_inits.uniform = uniform
    tg_nn.inits = tg_inits
    tg_utils.remove_self_loops = remove_self_loops
    tg_utils.add_self_loops = add_self_loops
    tg_utils.degree = degree
    tg_utils.softmax = _pyg_softmax
    tg_utils.dropout_adj = dropout_adj
    tg.nn = tg_nn
    tg.utils = tg_utils
    return {
        "torch_geometric": tg,
        "torch_geometric.nn": tg_nn,
        "torch_geometric.nn.conv": tg_conv,
        "torch_geometric.nn.inits": tg_inits,
        "torch_geometric.utils": tg_utils,
    }


def _build_torch_scatter():
    ts = types.ModuleType("torch_scatter")

    def scatter_add(src, index, dim=0, dim_size=None):
        return _scatter(src, index, dim=dim, dim_size=dim_size, reduce="add")

    def scatter(src, index, dim=0, dim_size=None, reduce="sum"):
        red = {"sum": "add"}.get(reduce, reduce)
        return _scatter(src, index, dim=dim, dim_size=dim_size, reduce=red)

    ts.scatter_add = scatter_add
    ts.scatter = scatter
    return {"torch_scatter": ts}


def _build_sparsesvd():
    mod = types.ModuleType("sparsesvd")

    def sparsesvd(smat, k):
        dense = np.asarray(smat.todense(), dtype=np.float64)
        u, s, vt = np.linalg.svd(dense, full_matrices=False)
        k = min(k, s.shape[0])
        return u[:, :k].T.astype(np.float32), s[:k].astype(np.float32), \
            vt[:k].astype(np.float32)

    mod.sparsesvd = sparsesvd
    return {"sparsesvd": mod}


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
    return {
        "torchvision": tv,
        "torchvision.transforms": transforms,
        "torchvision.transforms.functional": functional,
    }


_installed = False


def install_ref_shims():
    """Install every shim + the .cuda identity patch.  Idempotent."""
    global _installed
    if _installed:
        return
    mods = {}
    mods.update(_stub_torchvision())
    mods.update(_build_torch_geometric())
    mods.update(_build_torch_scatter())
    mods.update(_build_sparsesvd())
    for name, mod in mods.items():
        sys.modules.setdefault(name, mod)
    # reference models hard-code .cuda() (smore.py:63,73, grcn.py:127,318);
    # identity-patch so the unmodified code runs on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # `nn.Parameter(...).to('cuda')` yields a PLAIN tensor, so on GPU the
    # reference's forward-time re-assignments like `self.result_embed =
    # torch.cat(...)` target an ordinary attribute (`mentor.py:168-182`,
    # `dualgnn.py:130`, `dragon.py:155`); on CPU `.to` is a no-op, the name
    # stays a registered Parameter, and the same assignment raises.
    # Reproduce the CUDA end state: de-register and assign.
    _orig_setattr = torch.nn.Module.__setattr__

    def _cuda_like_setattr(self, name, value):
        params = self.__dict__.get("_parameters")
        if (
            params is not None and name in params
            and torch.is_tensor(value)
            and not isinstance(value, torch.nn.Parameter)
        ):
            del params[name]
            object.__setattr__(self, name, value)
            return
        _orig_setattr(self, name, value)

    torch.nn.Module.__setattr__ = _cuda_like_setattr
    # the reference targets scipy 1.7.3 whose dok_matrix had a private
    # `_update` bulk setter (used by `lgmrec.py:76`, `mmgcn`-family
    # `get_norm_adj_mat`); restore it on modern scipy
    import scipy.sparse as _sp

    if not hasattr(_sp.dok_matrix, "_update"):
        def _dok_update(self, data):
            self._dict.update(data)

        _sp.dok_matrix._update = _dok_update
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    _installed = True


def import_ref_model(module_name):
    """Import `models.<module_name>` from the reference tree."""
    install_ref_shims()
    import importlib

    return importlib.import_module(f"models.{module_name}")


# --------------------------------------------------------------------------
# dataset / config / parameter helpers
# --------------------------------------------------------------------------

class FakeRefDataset:
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


def ref_config(**kw):
    base = {
        "USER_ID_FIELD": "userID", "ITEM_ID_FIELD": "itemID",
        "NEG_PREFIX": "neg__", "train_batch_size": 8, "device": "cpu",
        "end2end": True, "is_multimodal_model": False,
        "embedding_size": 8, "n_layers": 2, "reg_weight": 0.01,
    }
    base.update(kw)

    class _Cfg(dict):
        def get(self, k, default=None):
            return dict.get(self, k, default)

    return _Cfg(base)


def fill_ref_params(ref, seed=0, scale=0.1, exclude=()):
    """Overwrite every reference parameter with seeded values; returns
    {torch_name: np.ndarray} so our side can mirror them exactly.

    ``exclude``: parameter names to keep at their init values (e.g. feature
    tables created with ``Embedding.from_pretrained`` whose init values are
    the modality features our side consumes as frozen inputs)."""
    rng = np.random.default_rng(seed)
    vals = {}
    with torch.no_grad():
        for name, p in sorted(ref.named_parameters()):
            if name in exclude:
                vals[name] = p.detach().numpy().copy()
                continue
            a = np.asarray(
                rng.normal(size=tuple(p.shape)) * scale, dtype=np.float32
            )
            p.copy_(torch.from_numpy(a))
            vals[name] = a
    return vals


def map_flax_params(init_params, mapping, ref_vals):
    """Overwrite leaves of a flax param tree from reference values.

    ``mapping``: {flax path tuple: torch_name or (torch_name, 'T')}.
    'T' transposes (torch Linear weight [out,in] -> flax kernel [in,out]).
    Unmapped leaves keep their init values (callers should map everything
    that affects the loss).
    """
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(init_params)
    for path, spec in mapping.items():
        if isinstance(spec, tuple):
            name, tf = spec
        else:
            name, tf = spec, None
        a = ref_vals[name]
        if tf == "T":
            a = a.T
        assert path in flat, (path, sorted(flat.keys()))
        assert flat[path].shape == a.shape, (path, flat[path].shape, a.shape)
        flat[path] = jnp.asarray(a)
    return unflatten_dict(flat)


def tiny_mm_data(tmp_path, seed=0, n_users=12, n_items=9, n_edges=40,
                 v_dim=12, t_dim=10, name="tinymm"):
    """Tiny interaction graph + modality features written like the reference
    expects (``<data_path>/<dataset>/{image,text}_feat.npy``)."""
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, n_edges)
    i = rng.integers(0, n_items, n_edges)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0].astype(np.int64), pairs[:, 1].astype(np.int64)
    # guarantee every user/item id appears so max-id counts match
    u = np.concatenate([u, np.arange(n_users)])
    i = np.concatenate([i, rng.integers(0, n_items, n_users)])
    u = np.concatenate([u, rng.integers(0, n_users, n_items)])
    i = np.concatenate([i, np.arange(n_items)])
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0], pairs[:, 1]
    v_feat = rng.normal(size=(n_items, v_dim)).astype(np.float32)
    t_feat = rng.normal(size=(n_items, t_dim)).astype(np.float32)
    ds_dir = tmp_path / name
    ds_dir.mkdir(exist_ok=True)
    np.save(ds_dir / "image_feat.npy", v_feat)
    np.save(ds_dir / "text_feat.npy", t_feat)
    return types.SimpleNamespace(
        u=u, i=i, n_users=n_users, n_items=n_items,
        v_feat=v_feat, t_feat=t_feat,
        data_path=str(tmp_path) + "/", dataset=name,
    )


def make_batch(data, batch=5, seed=1):
    rng = np.random.default_rng(seed)
    bu = rng.integers(0, data.n_users, batch).astype(np.int64)
    bp = data.i[rng.integers(0, len(data.i), batch)].astype(np.int64)
    bn = rng.integers(0, data.n_items, batch).astype(np.int64)
    return bu, bp, bn


def ref_loss_value(ref, bu, bp, bn=None):
    # copy: some reference forwards mutate the interaction in place
    # (`mentor.py:226-228` does `pos_item_nodes += self.n_users`), and
    # `torch.from_numpy` shares memory with the numpy batch we reuse
    ts = [torch.from_numpy(bu.copy()).long(), torch.from_numpy(bp.copy()).long()]
    if bn is not None:
        ts.append(torch.from_numpy(bn.copy()).long())
    out = ref.calculate_loss(ts)
    if isinstance(out, tuple):
        out = sum(o for o in out if torch.is_tensor(o))
    return float(out.detach())


def our_model_and_ctx(model_name, data, config_overrides, dense=None):
    """Build our model/ctx/data-bundle from the same tiny dataset."""
    from recommendar_systems_tpu.data.dataset import build_rec_dataset
    from recommendar_systems_tpu.data.arrays import build_data_bundle
    from recommendar_systems_tpu.utils.configurator import Config
    import importlib

    ds = build_rec_dataset(
        data.u, data.i, np.zeros(len(data.u), np.int64),
        v_feat=data.v_feat, t_feat=data.t_feat,
    )
    assert ds.n_users == data.n_users and ds.n_items == data.n_items
    cfg_dict = {"eval_batch_size": 8, "data_path": data.data_path + "ours-",
                "dataset": data.dataset}
    cfg_dict.update(config_overrides)
    cfg = Config(model_name, "synthetic", config_dict=cfg_dict)
    bundle = build_data_bundle(ds, cfg)
    from recommendar_systems_tpu.models import get_model

    cls = get_model(model_name)
    model = cls.from_config(cfg, bundle)
    try:
        ctx = cls.build_ctx(cfg, bundle, dense=dense)
    except TypeError:
        ctx = cls.build_ctx(cfg, bundle)
    return model, ctx, bundle, cfg


def our_loss_value(model, ctx, params, bu, bp, bn=None, weight=None, rngs=None,
                   extra_vars=None, train=True):
    import jax
    import jax.numpy as jnp

    batch = {
        "users": jnp.asarray(bu, dtype=jnp.int32),
        "pos_items": jnp.asarray(bp, dtype=jnp.int32),
        "weight": jnp.ones(len(bu)) if weight is None else jnp.asarray(weight),
    }
    if bn is not None:
        batch["neg_items"] = jnp.asarray(bn, dtype=jnp.int32)
    variables = {"params": params}
    mutable = False
    if extra_vars:
        variables.update(extra_vars)
        mutable = list(extra_vars.keys())
    out = model.apply(
        variables, ctx, batch, train, method="loss",
        rngs=rngs or {"dropout": jax.random.key(0), "sample": jax.random.key(2)},
        mutable=mutable,
    )
    if mutable:
        (total, parts), _ = out
    else:
        total, parts = out
    return float(total), parts
