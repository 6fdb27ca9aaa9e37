"""MGCN (reference `/root/reference/src/models/mgcn.py`).

Behavior-guided purifier: ``item_id * gate(modal_feats)`` (`mgcn.py:152-154`);
per-modality item-item graph propagation with user lift through R
(`mgcn.py:169-185`); behavior-aware fuser: softmax attention over the common
view, modality-specific parts separated and preference-gated
(`mgcn.py:187-199`); BPR + batch-sq reg + InfoNCE(side, content) at tau=0.2
(`mgcn.py:233-253`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommendar_systems_tpu.graph.build import build_norm_adj_and_r
from recommendar_systems_tpu.graph.knn import build_knn_ell
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.layers import Dense, xavier_uniform
from recommendar_systems_tpu.models.losses import batch_sq_reg, bpr_loss, infonce
from recommendar_systems_tpu.models.multiview import (
    modality_views_batched,
    GateMLP,
    QueryMLP,
    modality_view,
    ui_content_view,
)


class MGCN(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    n_ui_layers: int = 2
    n_layers: int = 1
    reg_weight: float = 1e-4
    cl_loss: float = 0.01
    batch_size: int = 2048

    def setup(self):
        d = self.embedding_size
        self.user_embedding = self.param(
            "user_embedding", xavier_uniform, (self.n_users, d)
        )
        self.item_id_embedding = self.param(
            "item_id_embedding", xavier_uniform, (self.n_items, d)
        )
        self.image_trs = Dense(d)
        self.text_trs = Dense(d)
        self.query_common = QueryMLP(d, out_dim=1)
        self.gate_v = GateMLP(d)
        self.gate_t = GateMLP(d)
        self.gate_image_prefer = GateMLP(d)
        self.gate_text_prefer = GateMLP(d)

    def views(self, ctx):
        image_feats = self.image_trs(ctx["v_feat"])
        text_feats = self.text_trs(ctx["t_feat"])

        # behavior-guided purifier (`mgcn.py:152-154`)
        image_item = self.item_id_embedding * self.gate_v(image_feats)
        text_item = self.item_id_embedding * self.gate_t(text_feats)

        content = ui_content_view(
            ctx["norm_adj"], self.user_embedding, self.item_id_embedding,
            self.n_ui_layers,
        )
        image_embeds, text_embeds = modality_views_batched(
            [ctx["image_adj"], ctx["text_adj"]], ctx["R"],
            [image_item, text_item], self.n_layers,
        )

        # behavior-aware fuser (`mgcn.py:187-199`)
        att = jnp.concatenate(
            [self.query_common(image_embeds), self.query_common(text_embeds)], axis=-1
        )
        w = jax.nn.softmax(att, axis=-1)
        common = w[:, 0:1] * image_embeds + w[:, 1:2] * text_embeds
        sep_image = (image_embeds - common) * self.gate_image_prefer(content)
        sep_text = (text_embeds - common) * self.gate_text_prefer(content)
        side = (sep_image + sep_text + common) / 3.0

        return content + side, side, content

    def loss(self, ctx, batch, train: bool = True):
        all_embeds, side, content = self.views(ctx)
        ue, ie = all_embeds[: self.n_users], all_embeds[self.n_users :]
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        u = ue[users]
        pos_e, neg_e = ie[pos], ie[neg]
        mf = bpr_loss(jnp.sum(u * pos_e, 1), jnp.sum(u * neg_e, 1), gamma=0.0, weight=w)
        reg = self.reg_weight * batch_sq_reg(
            u, pos_e, neg_e, batch_size=self.batch_size, weight=w
        )
        side_u, side_i = side[: self.n_users], side[self.n_users :]
        cont_u, cont_i = content[: self.n_users], content[self.n_users :]
        cl = infonce(side_i[pos], cont_i[pos], 0.2, weight=w) + infonce(
            side_u[users], cont_u[users], 0.2, weight=w
        )
        total = mf + reg + self.cl_loss * cl
        return total, {"mf_loss": mf, "emb_loss": reg, "cl_loss": cl}

    def eval_embeddings(self, ctx):
        all_embeds, _, _ = self.views(ctx)
        return all_embeds[: self.n_users], all_embeds[self.n_users :]

    @classmethod
    def from_config(cls, config, data) -> "MGCN":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            n_ui_layers=int(cfg_scalar(config, "n_ui_layers", 2)),
            n_layers=int(cfg_scalar(config, "n_layers", 1)),
            reg_weight=float(_s(config["reg_weight"])),
            cl_loss=float(_s(config["cl_loss"])),
            batch_size=int(config["train_batch_size"]),
        )

    @classmethod
    def build_ctx(cls, config, data):
        import os

        knn_k = int(cfg_scalar(config, "knn_k", 10))
        cache_dir = os.path.join(str(config["data_path"]), str(config["dataset"]))
        norm_adj, r_hat = build_norm_adj_and_r(
            data.train_users_np, data.train_items_np, data.n_users, data.n_items
        )
        return {
            "norm_adj": norm_adj,
            "R": r_hat,
            "image_adj": build_knn_ell(
                data.v_feat, knn_k, cache_dir=cache_dir, cache_key="image"
            ),
            "text_adj": build_knn_ell(
                data.t_feat, knn_k, cache_dir=cache_dir, cache_key="text"
            ),
            "v_feat": data.v_feat,
            "t_feat": data.t_feat,
        }


MODEL = MGCN
