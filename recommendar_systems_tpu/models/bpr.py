"""BPR matrix factorization (reference `/root/reference/src/models/bpr.py`).

Pure user/item embedding tables with dot-product scoring, trained pairwise
with BPR + EmbLoss regularization (`bpr.py:70-88`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from recommendar_systems_tpu.models.base import RecModel
from recommendar_systems_tpu.models.layers import xavier_normal
from recommendar_systems_tpu.models.losses import bpr_loss, emb_loss


class BPR(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    reg_weight: float = 1e-2

    def setup(self):
        self.user_embedding = self.param(
            "user_embedding", xavier_normal, (self.n_users, self.embedding_size)
        )
        self.item_embedding = self.param(
            "item_embedding", xavier_normal, (self.n_items, self.embedding_size)
        )

    def loss(self, ctx, batch, train: bool = True):
        u = self.user_embedding[batch["users"]]
        pos = self.item_embedding[batch["pos_items"]]
        neg = self.item_embedding[batch["neg_items"]]
        w = batch.get("weight")
        pos_s = jnp.sum(u * pos, axis=1)
        neg_s = jnp.sum(u * neg, axis=1)
        mf = bpr_loss(pos_s, neg_s, weight=w)
        reg = emb_loss(u, pos, neg, weight=w)
        total = mf + self.reg_weight * reg
        return total, {"mf_loss": mf, "reg_loss": reg}

    def eval_embeddings(self, ctx):
        return self.user_embedding, self.item_embedding

    @classmethod
    def from_config(cls, config, data) -> "BPR":
        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            reg_weight=float(config["reg_weight"]),
        )


MODEL = BPR
