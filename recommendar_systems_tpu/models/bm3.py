"""BM3 (reference `/root/reference/src/models/bm3.py`).

Bootstrap latent multimodal recommendation: LightGCN backbone
(`bm3.py:86-97`), a linear predictor, dropout-perturbed stop-gradient
targets (`bm3.py:108-122`), and symmetric 1-cos losses between
user/item online-target pairs plus intra/inter-modal pairs
(`bm3.py:131-149`).  No negative sampling (``use_neg_sampling: False``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommendar_systems_tpu.graph.build import build_norm_adj
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.layers import (
    Dense,
    l2_normalize,
    lightgcn_propagate,
    xavier_uniform,
)
from recommendar_systems_tpu.models.losses import _wmean, emb_loss


def one_minus_cos(a, b, weight=None):
    sim = jnp.sum(l2_normalize(a) * l2_normalize(b), axis=-1)
    return _wmean(1.0 - sim, weight)


class BM3(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    n_layers: int = 1
    reg_weight: float = 0.1
    cl_weight: float = 2.0
    dropout: float = 0.3
    has_v: bool = True
    has_t: bool = True

    def setup(self):
        self.user_embedding = self.param(
            "user_embedding", xavier_uniform, (self.n_users, self.embedding_size)
        )
        self.item_id_embedding = self.param(
            "item_id_embedding", xavier_uniform, (self.n_items, self.embedding_size)
        )
        self.predictor = Dense(self.embedding_size)
        if self.has_v:
            self.image_trs = Dense(self.embedding_size)
        if self.has_t:
            self.text_trs = Dense(self.embedding_size)
        self.drop = nn.Dropout(rate=self.dropout)

    def propagate(self, ctx):
        h = self.item_id_embedding
        ego = jnp.concatenate([self.user_embedding, self.item_id_embedding], axis=0)
        all_emb = lightgcn_propagate(ctx["norm_adj"], ego, self.n_layers)
        return all_emb[: self.n_users], all_emb[self.n_users :] + h

    def loss(self, ctx, batch, train: bool = True):
        u_online_ori, i_online_ori = self.propagate(ctx)
        users, items = batch["users"], batch["pos_items"]
        w = batch.get("weight")

        t_online = self.text_trs(ctx["t_feat"]) if self.has_t else None
        v_online = self.image_trs(ctx["v_feat"]) if self.has_v else None

        # dropout-perturbed stop-gradient targets (`bm3.py:108-122`)
        u_target = self.drop(
            jax.lax.stop_gradient(u_online_ori), deterministic=not train
        )
        i_target = self.drop(
            jax.lax.stop_gradient(i_online_ori), deterministic=not train
        )

        u_online = self.predictor(u_online_ori)[users]
        i_online = self.predictor(i_online_ori)[items]
        u_target = u_target[users]
        i_target = i_target[items]

        loss_t = loss_v = loss_tv = loss_vt = 0.0
        if self.has_t:
            t_target = self.drop(
                jax.lax.stop_gradient(t_online), deterministic=not train
            )[items]
            t_on = self.predictor(t_online)[items]
            loss_t = one_minus_cos(t_on, jax.lax.stop_gradient(i_target), w)
            loss_tv = one_minus_cos(t_on, jax.lax.stop_gradient(t_target), w)
        if self.has_v:
            v_target = self.drop(
                jax.lax.stop_gradient(v_online), deterministic=not train
            )[items]
            v_on = self.predictor(v_online)[items]
            loss_v = one_minus_cos(v_on, jax.lax.stop_gradient(i_target), w)
            loss_vt = one_minus_cos(v_on, jax.lax.stop_gradient(v_target), w)

        loss_ui = one_minus_cos(u_online, jax.lax.stop_gradient(i_target), w)
        loss_iu = one_minus_cos(i_online, jax.lax.stop_gradient(u_target), w)

        reg = emb_loss(u_online_ori, i_online_ori)
        total = (
            loss_ui + loss_iu
            + self.reg_weight * reg
            + self.cl_weight * (loss_t + loss_v + loss_tv + loss_vt)
        )
        return total, {
            "bootstrap": loss_ui + loss_iu,
            "reg_loss": reg,
            "modal": loss_t + loss_v + loss_tv + loss_vt,
        }

    def eval_embeddings(self, ctx):
        u_online, i_online = self.propagate(ctx)
        return self.predictor(u_online), self.predictor(i_online)

    @classmethod
    def from_config(cls, config, data) -> "BM3":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            n_layers=int(cfg_scalar(config, "n_layers", 1)),
            reg_weight=float(_s(config["reg_weight"])),
            cl_weight=float(cfg_scalar(config, "cl_weight", 2.0)),
            dropout=float(cfg_scalar(config, "dropout", 0.3)),
            has_v=data.v_feat is not None,
            has_t=data.t_feat is not None,
        )

    @classmethod
    def build_ctx(cls, config, data):
        ctx = {
            "norm_adj": build_norm_adj(
                data.train_users_np, data.train_items_np, data.n_users, data.n_items
            )
        }
        if data.v_feat is not None:
            ctx["v_feat"] = data.v_feat
        if data.t_feat is not None:
            ctx["t_feat"] = data.t_feat
        return ctx


MODEL = BM3
