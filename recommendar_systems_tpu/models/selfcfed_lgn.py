"""SELFCF_ED with LightGCN encoder (reference
`/root/reference/src/models/selfcfed_lgn.py` + `common/encoders.py`).

BYOL-style self-supervised CF: a shared LightGCN encoder produces online
embeddings; the target view is an embedding-dropout of the stop-gradient
online view (`selfcfed_lgn.py:41-50`); a linear predictor maps online, and
the loss is the symmetric negative cosine (`selfcfed_lgn.py:57-69`) plus L2.

The encoder applies *sparse dropout on the adjacency* during training with a
uniformly random rate per forward (`encoders.py:80-91,100`): edges are
Bernoulli-kept with prob (1-rate) and scaled 1/(1-rate).  Prediction scores
are ``pred(u)[user] @ i.T + u[user] @ pred(i).T`` (`selfcfed_lgn.py:71-78`).
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
from recommendar_systems_tpu.models.losses import _wmean, l2_loss


class SELFCFED_LGN(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    n_layers: int = 3
    dropout: float = 0.5
    reg_weight: float = 1e-4

    def setup(self):
        self.user_emb = self.param(
            "user_emb", xavier_uniform, (self.n_users, self.embedding_size)
        )
        self.item_emb = self.param(
            "item_emb", xavier_uniform, (self.n_items, self.embedding_size)
        )
        self.predictor = Dense(self.embedding_size)
        self.drop = nn.Dropout(rate=self.dropout)

    def encode(self, ctx, train: bool):
        adj = ctx["norm_adj"]
        if train:
            # adjacency sparse-dropout with per-forward uniform rate
            from recommendar_systems_tpu.graph.sparse import DenseBip

            rate = jax.random.uniform(self.make_rng("dropout"), ())
            if isinstance(adj, DenseBip):
                # elementwise Bernoulli on the dense block == per-edge
                # dropout (zero entries stay zero); the two directions get
                # independent masks like the symmetric COO slots
                ku = jax.random.uniform(
                    self.make_rng("dropout"), adj.ur.shape
                ) >= rate
                ki = jax.random.uniform(
                    self.make_rng("dropout"), (adj.ur.shape[1], adj.ur.shape[0])
                ) >= rate
                scale = 1.0 / (1.0 - rate)
                adj = DenseBip(
                    ur=jnp.where(ku, adj.ur * scale, 0.0),
                    iu=jnp.where(ki, adj.ur.T * scale, 0.0),
                    dims=adj.dims,  # preserve logical (U, I) of padded blocks
                )
            else:
                keep = (
                    jax.random.uniform(
                        self.make_rng("dropout"), adj.vals.shape
                    )
                    >= rate
                )
                vals = jnp.where(keep, adj.vals / (1.0 - rate), 0.0)
                adj = adj.with_values(vals)
        ego = jnp.concatenate([self.user_emb, self.item_emb], axis=0)
        all_emb = lightgcn_propagate(adj, ego, self.n_layers)
        return all_emb[: self.n_users], all_emb[self.n_users :]

    def loss(self, ctx, batch, train: bool = True):
        u_all, i_all = self.encode(ctx, train)
        users, items = batch["users"], batch["pos_items"]
        w = batch.get("weight")
        u_online = u_all[users]
        i_online = i_all[items]
        u_target = self.drop(
            jax.lax.stop_gradient(u_online), deterministic=not train
        )
        i_target = self.drop(
            jax.lax.stop_gradient(i_online), deterministic=not train
        )
        reg = l2_loss(
            u_online * (w[:, None] if w is not None else 1.0),
            i_online * (w[:, None] if w is not None else 1.0),
        )
        u_p = self.predictor(u_online)
        i_p = self.predictor(i_online)
        loss_ui = _wmean(-jnp.sum(l2_normalize(u_p) * l2_normalize(i_target), -1), w) / 2
        loss_iu = _wmean(-jnp.sum(l2_normalize(i_p) * l2_normalize(u_target), -1), w) / 2
        total = loss_ui + loss_iu + self.reg_weight * reg
        return total, {"neg_cos": loss_ui + loss_iu, "reg_loss": reg}

    def eval_embeddings(self, ctx):
        # sum of two dot products == one dot product of concatenations
        # (`selfcfed_lgn.py:71-78`)
        import jax.numpy as jnp

        u_all, i_all = self.encode(ctx, train=False)
        u_p = self.predictor(u_all)
        i_p = self.predictor(i_all)
        ue = jnp.concatenate([u_p, u_all], axis=1)
        ie = jnp.concatenate([i_all, i_p], axis=1)
        return ue, ie

    @classmethod
    def from_config(cls, config, data) -> "SELFCFED_LGN":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            n_layers=int(cfg_scalar(config, "n_layers", 3)),
            dropout=float(cfg_scalar(config, "dropout", 0.5)),
            reg_weight=float(cfg_scalar(config, "reg_weight", 1e-4)),
        )

    @classmethod
    def build_ctx(cls, config, data):
        return {
            # factored=False: encode() edits the dense block elementwise for
            # per-forward adjacency dropout, which needs plain edge values
            "norm_adj": build_norm_adj(
                data.train_users_np, data.train_items_np, data.n_users,
                data.n_items, factored=False,
            )
        }


MODEL = SELFCFED_LGN
