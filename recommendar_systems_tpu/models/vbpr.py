"""VBPR (reference `/root/reference/src/models/vbpr.py`).

MF plus a linear tower projecting the frozen concat(t_feat, v_feat) item
features to an embedding that is concatenated with the item id embedding;
the user table is 2x dim to match (`vbpr.py:31-75`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from recommendar_systems_tpu.models.base import RecModel, concat_modal_features
from recommendar_systems_tpu.models.layers import Dense, xavier_normal
from recommendar_systems_tpu.models.losses import bpr_loss, emb_loss


class VBPR(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    reg_weight: float = 1e-2

    def setup(self):
        self.u_embedding = self.param(
            "u_embedding", xavier_normal, (self.n_users, self.embedding_size * 2)
        )
        self.i_embedding = self.param(
            "i_embedding", xavier_normal, (self.n_items, self.embedding_size)
        )
        self.item_linear = Dense(self.embedding_size)

    def _item_embeddings(self, ctx) -> jnp.ndarray:
        feat_e = self.item_linear(ctx["item_raw_features"])
        return jnp.concatenate([self.i_embedding, feat_e], axis=-1)

    def loss(self, ctx, batch, train: bool = True):
        item_e = self._item_embeddings(ctx)
        u = self.u_embedding[batch["users"]]
        pos = item_e[batch["pos_items"]]
        neg = item_e[batch["neg_items"]]
        w = batch.get("weight")
        mf = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), weight=w)
        reg = emb_loss(u, pos, neg, weight=w)
        total = mf + self.reg_weight * reg
        return total, {"mf_loss": mf, "reg_loss": reg}

    def eval_embeddings(self, ctx):
        return self.u_embedding, self._item_embeddings(ctx)

    @classmethod
    def from_config(cls, config, data) -> "VBPR":
        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            reg_weight=float(config["reg_weight"]),
        )

    @classmethod
    def build_ctx(cls, config, data):
        return {"item_raw_features": concat_modal_features(data)}


MODEL = VBPR
