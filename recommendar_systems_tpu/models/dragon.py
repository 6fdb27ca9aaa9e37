"""DRAGON (reference `/root/reference/src/models/dragon.py`).

DualGNN-style per-modality towers with construction='cat'
(`dragon.py:44, 206-244`): the full representation is concat(v_rep, t_rep)
[N, 2d]; the user side applies the learned blend weights before concat; a
FREEDOM-style frozen mm item graph adds an item-side residual
(`dragon.py:248-252`); the u-u co-occurrence graph adds a user-side
residual (`dragon.py:253-255`).  Loss = log2-BPR + reg on preferences and
weight_u (`dragon.py:262-277`).
"""

from __future__ import annotations

import jax.numpy as jnp

from recommendar_systems_tpu.graph.build import build_norm_adj
from recommendar_systems_tpu.graph.knn import build_knn_ell
from recommendar_systems_tpu.graph.sparse import spmm
from recommendar_systems_tpu.graph.usergraph import (
    build_user_topk_cooccurrence,
    user_graph_aggregate,
)
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.dualgnn import _ModalTower, softmax_xavier
from recommendar_systems_tpu.models.freedom import blend_modality_ells
from recommendar_systems_tpu.models.losses import _wmean, bpr_loss_log2


class DRAGON(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    feat_embed_dim: int = 64
    n_mm_layers: int = 1
    reg_weight: float = 1e-3
    has_v: bool = True
    has_t: bool = True

    def setup(self):
        if self.has_v:
            self.v_gcn = _ModalTower(self.n_users, self.embedding_size, name="v_gcn")
        if self.has_t:
            self.t_gcn = _ModalTower(self.n_users, self.embedding_size, name="t_gcn")
        self.weight_u = self.param("weight_u", softmax_xavier, (self.n_users, 2, 1))
        self.weight_i = self.param("weight_i", softmax_xavier, (self.n_items, 2, 1))

    def representation(self, ctx):
        # both tower propagations are linear: one double-width pass over the
        # shared adjacency (columnwise equivalent to two per-tower chains)
        d = self.embedding_size
        x = jnp.concatenate(
            [self.v_gcn.embed(ctx["v_feat"]), self.t_gcn.embed(ctx["t_feat"])],
            axis=1,
        )
        h = spmm(ctx["adj"], x)
        h_1 = spmm(ctx["adj"], h)
        out = x + h + h_1
        v_rep, t_rep = out[:, :d], out[:, d:]
        v_pref = self.v_gcn.preference
        t_pref = self.t_gcn.preference
        rep = jnp.concatenate([v_rep, t_rep], axis=1)  # [N, 2d]

        # user side: blend-weighted concat (`dragon.py:231-244`)
        wu = jnp.swapaxes(self.weight_u, 1, 2)  # [U, 1, 2]
        stacked = jnp.stack(
            [v_rep[: self.n_users], t_rep[: self.n_users]], axis=2
        )  # [U, d, 2]
        weighted = wu * stacked
        user_rep = jnp.concatenate([weighted[:, :, 0], weighted[:, :, 1]], axis=1)

        item_rep = rep[self.n_users :]
        h = item_rep
        for _ in range(self.n_mm_layers):
            h = spmm(ctx["mm_adj"], h)
        h_u1 = user_graph_aggregate(user_rep, ctx["ug_idx"], ctx["ug_w"])
        user_rep = user_rep + h_u1
        item_rep = item_rep + h
        return jnp.concatenate([user_rep, item_rep], axis=0), v_pref, t_pref

    def loss(self, ctx, batch, train: bool = True):
        out, v_pref, t_pref = self.representation(ctx)
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        u = out[users]
        pos_s = jnp.sum(u * out[pos + self.n_users], 1)
        neg_s = jnp.sum(u * out[neg + self.n_users], 1)
        mf = bpr_loss_log2(pos_s, neg_s, weight=w)
        reg = _wmean(jnp.mean(v_pref[users] ** 2, axis=1), w) + _wmean(
            jnp.mean(t_pref[users] ** 2, axis=1), w
        )
        reg = reg + jnp.mean(self.weight_u ** 2)
        total = mf + self.reg_weight * reg
        return total, {"mf_loss": mf, "reg_loss": reg}

    def eval_embeddings(self, ctx):
        out, *_ = self.representation(ctx)
        return out[: self.n_users], out[self.n_users :]

    @classmethod
    def from_config(cls, config, data) -> "DRAGON":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            feat_embed_dim=int(cfg_scalar(config, "feat_embed_dim", 64)),
            n_mm_layers=int(cfg_scalar(config, "n_mm_layers", 1)),
            reg_weight=float(_s(config["reg_weight"])),
            has_v=data.v_feat is not None,
            has_t=data.t_feat is not None,
        )

    @classmethod
    def build_ctx(cls, config, data):
        import os

        knn_k = int(cfg_scalar(config, "knn_k", 10))
        w_img = float(cfg_scalar(config, "mm_image_weight", 0.1))
        cache_dir = os.path.join(str(config["data_path"]), str(config["dataset"]))
        img = build_knn_ell(
            data.v_feat, knn_k, weighted=False,
            cache_dir=cache_dir, cache_key="dragon_image",
        )
        txt = build_knn_ell(
            data.t_feat, knn_k, weighted=False,
            cache_dir=cache_dir, cache_key="dragon_text",
        )
        ug_idx, ug_w = build_user_topk_cooccurrence(
            data.train_users_np, data.train_items_np, data.n_users, data.n_items,
            k=40, weight_mode="softmax",
        )
        return {
            "adj": build_norm_adj(
                data.train_users_np, data.train_items_np, data.n_users, data.n_items
            ),
            "mm_adj": blend_modality_ells(img, txt, w_img),
            "ug_idx": ug_idx,
            "ug_w": ug_w,
            "v_feat": data.v_feat,
            "t_feat": data.t_feat,
        }


MODEL = DRAGON
