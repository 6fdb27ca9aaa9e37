"""LATTICE (reference `/root/reference/src/models/lattice.py`, ACM MM'21).

Learned item-item graph: top-k of the cosine similarity of *projected*
modality features, blended across modalities by a learned softmax weight,
normalized, and mixed with the frozen original graph by ``lambda_coeff``
(`lattice.py:137-159`).  CF branch selectable mf / lightgcn / ngcf
(`lattice.py:165-197`); the u-i graph is row-normalized with self-loops
(`lattice.py:105-125`).

Fidelity note: the reference rebuilds the learned graph (with gradients)
only on the first batch of each epoch and reuses a detached copy afterwards
(`lattice.py:97-98, 137-160`).  Rebuilding is cheap on the MXU, so here it
is rebuilt differentiably every step — same estimator, fresher graph,
gradient signal every batch instead of once per epoch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommendar_systems_tpu.graph.build import build_rw_adj_selfloop
from recommendar_systems_tpu.graph.knn import build_sim_topk, knn_normalized_ell
from recommendar_systems_tpu.graph.sparse import ELL, spmm, spmm_ell
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.layers import (
    Dense,
    l2_normalize,
    lightgcn_propagate,
    xavier_uniform,
)
from recommendar_systems_tpu.models.losses import batch_sq_reg, bpr_loss


def topk_sim_ell(feats: jnp.ndarray, k: int) -> ELL:
    """Differentiable top-k cosine similarity graph (unnormalized values)."""
    f = l2_normalize(feats)
    sim = f @ f.T
    val, idx = jax.lax.top_k(sim, k)
    return ELL(idx=idx.astype(jnp.int32), val=val, n_cols=feats.shape[0])


def normalized_blend(ells, weights) -> ELL:
    """Normalized laplacian of sum_m w_m * A_m (`lattice.py:152-156`):
    degrees are row sums of the blended values, both endpoint scalings come
    from the row-sum vector (`utils.py:125-131`)."""
    idx = jnp.concatenate([e.idx for e in ells], axis=1)
    val = jnp.concatenate(
        [w * e.val for w, e in zip(weights, ells)], axis=1
    )
    deg = val.sum(axis=1)
    d = jnp.where(deg > 0, deg ** -0.5, 0.0)
    return ELL(idx=idx, val=d[:, None] * val * d[idx], n_cols=ells[0].n_cols)


class LATTICE(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    feat_embed_dim: int = 64
    knn_k: int = 10
    lambda_coeff: float = 0.9
    cf_model: str = "lightgcn"
    n_layers: int = 1
    n_ui_layers: int = 2
    reg_weight: float = 0.0
    mess_dropout: tuple = (0.1, 0.1)
    batch_size: int = 2048

    def setup(self):
        d = self.embedding_size
        self.user_embedding = self.param(
            "user_embedding", xavier_uniform, (self.n_users, d)
        )
        self.item_id_embedding = self.param(
            "item_id_embedding", xavier_uniform, (self.n_items, d)
        )
        self.image_trs = Dense(self.feat_embed_dim)
        self.text_trs = Dense(self.feat_embed_dim)
        self.modal_weight = self.param(
            "modal_weight", lambda k, s: jnp.array([0.5, 0.5]), (2,)
        )
        # epoch-cached learned item graph (reference `lattice.py:97-98,
        # 218-219`): pre_epoch_processing arms a flag, the FIRST batch of
        # the epoch rebuilds the graph (gradients flow to trs/modal_weight
        # on that batch), later batches reuse it DETACHED.  Width: learned
        # blend (2k) + the two frozen original graphs (k each).
        w_adj = 4 * self.knn_k
        self.adj_idx_cache = self.variable(
            "state", "item_adj_idx",
            lambda: jnp.zeros((self.n_items, w_adj), jnp.int32),
        )
        self.adj_val_cache = self.variable(
            "state", "item_adj_val",
            lambda: jnp.zeros((self.n_items, w_adj), jnp.float32),
        )
        if self.cf_model == "ngcf":
            self.gc_linears = [Dense(d, name=f"gc_{i}") for i in range(self.n_ui_layers)]
            self.bi_linears = [Dense(d, name=f"bi_{i}") for i in range(self.n_ui_layers)]
            self.drops = [
                nn.Dropout(rate=p, name=f"drop_{i}")
                for i, p in enumerate(self.mess_dropout)
            ]

    def item_graph(self, ctx):
        weight = jax.nn.softmax(self.modal_weight, axis=0)
        image_feats = self.image_trs(ctx["v_feat"])
        text_feats = self.text_trs(ctx["t_feat"])
        learned = normalized_blend(
            [topk_sim_ell(image_feats, self.knn_k), topk_sim_ell(text_feats, self.knn_k)],
            [weight[0], weight[1]],
        )
        # original adjacencies are pre-normalized per modality; blend scales
        original_idx = jnp.concatenate(
            [ctx["image_original_adj"].idx, ctx["text_original_adj"].idx], axis=1
        )
        original_val = jnp.concatenate(
            [
                weight[0] * ctx["image_original_adj"].val,
                weight[1] * ctx["text_original_adj"].val,
            ],
            axis=1,
        )
        idx = jnp.concatenate([learned.idx, original_idx], axis=1)
        val = jnp.concatenate(
            [(1.0 - self.lambda_coeff) * learned.val, self.lambda_coeff * original_val],
            axis=1,
        )
        return ELL(idx=idx, val=val, n_cols=self.n_items)

    def propagate(self, ctx, train: bool, step_id=None):
        if step_id is None or self.is_initializing():
            item_adj = self.item_graph(ctx)
            if self.is_initializing() and step_id is not None:
                assert item_adj.idx.shape == self.adj_idx_cache.value.shape, (
                    item_adj.idx.shape, self.adj_idx_cache.value.shape)
        else:
            cached_idx = self.adj_idx_cache.value
            cached_val = jax.lax.stop_gradient(self.adj_val_cache.value)

            def build(_):
                a = self.item_graph(ctx)
                return a.idx, a.val

            def reuse(_):
                return cached_idx, cached_val

            idx, val = jax.lax.cond(step_id == 0, build, reuse, None)
            self.adj_idx_cache.value = idx
            self.adj_val_cache.value = jax.lax.stop_gradient(val)
            item_adj = ELL(idx=idx, val=val, n_cols=self.n_items)
        h = self.item_id_embedding
        for _ in range(self.n_layers):
            h = spmm_ell(item_adj, h)
        h = l2_normalize(h)

        if self.cf_model == "mf":
            return self.user_embedding, self.item_id_embedding + h
        ego = jnp.concatenate([self.user_embedding, self.item_id_embedding], axis=0)
        if self.cf_model == "ngcf":
            layers = [ego]
            x = ego
            for i in range(self.n_ui_layers):
                side = spmm(ctx["norm_adj"], x)
                s = nn.leaky_relu(self.gc_linears[i](side), negative_slope=0.01)
                b = nn.leaky_relu(self.bi_linears[i](x * side), negative_slope=0.01)
                x = self.drops[i](s + b, deterministic=not train)
                layers.append(l2_normalize(x))
            all_emb = jnp.stack(layers, 1).mean(1)
        else:  # lightgcn
            all_emb = lightgcn_propagate(ctx["norm_adj"], ego, self.n_ui_layers)
        return all_emb[: self.n_users], all_emb[self.n_users :] + h

    def loss(self, ctx, batch, train: bool = True):
        ue, ie = self.propagate(ctx, train, step_id=batch.get("step_id"))
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        u, pe, ne = ue[users], ie[pos], ie[neg]
        mf = bpr_loss(jnp.sum(u * pe, 1), jnp.sum(u * ne, 1), gamma=0.0, weight=w)
        reg = self.reg_weight * batch_sq_reg(
            u, pe, ne, batch_size=self.batch_size, weight=w
        )
        total = mf + reg
        return total, {"mf_loss": mf, "emb_loss": reg}

    def eval_embeddings(self, ctx):
        return self.propagate(ctx, train=False)

    @classmethod
    def from_config(cls, config, data) -> "LATTICE":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            feat_embed_dim=int(config["feat_embed_dim"] or config["embedding_size"]),
            knn_k=int(cfg_scalar(config, "knn_k", 10)),
            lambda_coeff=float(cfg_scalar(config, "lambda_coeff", 0.9)),
            cf_model=str(config.get("cf_model") or "lightgcn"),
            n_layers=int(cfg_scalar(config, "n_layers", 1)),
            n_ui_layers=len(config["weight_size"] or [64, 64]),
            reg_weight=float(_s(config["reg_weight"])),
            mess_dropout=tuple(config.get("mess_dropout") or (0.1, 0.1)),
            batch_size=int(config["train_batch_size"]),
        )

    @classmethod
    def build_ctx(cls, config, data):
        import os

        knn_k = int(cfg_scalar(config, "knn_k", 10))
        cache_dir = os.path.join(str(config["data_path"]), str(config["dataset"]))
        # frozen per-modality graphs: raw-feature topk sim + normalized
        # laplacian (`lattice.py:67-87`)
        from recommendar_systems_tpu.graph.knn import build_knn_ell

        return {
            "norm_adj": build_rw_adj_selfloop(
                data.train_users_np, data.train_items_np, data.n_users, data.n_items
            ),
            "image_original_adj": build_knn_ell(
                data.v_feat, knn_k, cache_dir=cache_dir, cache_key="lattice_image",
                dense=False,  # blended slot-wise with the learned graph
            ),
            "text_original_adj": build_knn_ell(
                data.t_feat, knn_k, cache_dir=cache_dir, cache_key="lattice_text",
                dense=False,
            ),
            "v_feat": data.v_feat,
            "t_feat": data.t_feat,
        }


MODEL = LATTICE
