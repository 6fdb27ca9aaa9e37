"""LightGCN (reference `/root/reference/src/models/lightgcn.py`).

K-layer linear propagation over the normalized bipartite adjacency with
layer-mean pooling (`lightgcn.py:117-130`); BPR on propagated embeddings and
EmbLoss on the ego embeddings (`lightgcn.py:132-156`).  The scipy dok-loop
adjacency build (`lightgcn.py:77-103`) is replaced by the vectorized
row-sorted COO from `graph/build.py`.
"""

from __future__ import annotations

import jax.numpy as jnp

from recommendar_systems_tpu.graph.build import build_norm_adj
from recommendar_systems_tpu.models.base import RecModel
from recommendar_systems_tpu.models.layers import lightgcn_propagate, xavier_uniform
from recommendar_systems_tpu.models.losses import bpr_loss, emb_loss


class LightGCN(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    n_layers: int = 4
    reg_weight: float = 1e-2

    def setup(self):
        self.user_emb = self.param(
            "user_emb", xavier_uniform, (self.n_users, self.embedding_size)
        )
        self.item_emb = self.param(
            "item_emb", xavier_uniform, (self.n_items, self.embedding_size)
        )

    def propagate(self, ctx):
        ego = jnp.concatenate([self.user_emb, self.item_emb], axis=0)
        all_emb = lightgcn_propagate(ctx["norm_adj"], ego, self.n_layers)
        return all_emb[: self.n_users], all_emb[self.n_users :]

    def loss(self, ctx, batch, train: bool = True):
        ue, ie = self.propagate(ctx)
        u = ue[batch["users"]]
        pos = ie[batch["pos_items"]]
        neg = ie[batch["neg_items"]]
        w = batch.get("weight")
        mf = bpr_loss(jnp.sum(u * pos, 1), jnp.sum(u * neg, 1), weight=w)
        reg = emb_loss(
            self.user_emb[batch["users"]],
            self.item_emb[batch["pos_items"]],
            self.item_emb[batch["neg_items"]],
            weight=w,
        )
        total = mf + self.reg_weight * reg
        return total, {"mf_loss": mf, "reg_loss": reg}

    def eval_embeddings(self, ctx):
        return self.propagate(ctx)

    @classmethod
    def from_config(cls, config, data) -> "LightGCN":
        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            n_layers=int(config["n_layers"]),
            reg_weight=float(config["reg_weight"]),
        )

    @classmethod
    def build_ctx(cls, config, data):
        return {
            "norm_adj": build_norm_adj(
                data.train_users_np, data.train_items_np, data.n_users, data.n_items
            )
        }


MODEL = LightGCN
