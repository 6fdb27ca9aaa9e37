"""DualGNN (reference `/root/reference/src/models/dualgnn.py`, TMM'21).

Per-modality GCN with a learnable user preference table prepended to the
projected features (`dualgnn.py:269-348`: x = normalize(concat(pref,
MLP_1(leaky(MLP(feat))))), two sym-normalized propagations, x + h + h1),
learned per-user modality blend weights ``weight_u`` (`dualgnn.py:63-69`,
initialized as softmax(xavier)), and a user-user co-occurrence aggregation
(`dualgnn.py:131-133, 207-266`; weights softmaxed over each user's top-k
co-occurring users).  Loss = log2-BPR + reg on preferences and blend
weights (`dualgnn.py:182-197`).

Fidelity notes: the reference's modality-specific edge-dropout graphs are
built but never used in its forward (`dualgnn.py:148-149` passes them,
`dualgnn.py:312-316` propagates on the full edge_index), so they are not
reproduced; the per-epoch ``topk_sample`` is deterministic except for
padding, so the [U, k] neighbor table is built once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from recommendar_systems_tpu.graph.build import build_norm_adj
from recommendar_systems_tpu.graph.sparse import spmm
from recommendar_systems_tpu.graph.usergraph import (
    build_user_topk_cooccurrence,
    user_graph_aggregate,
)
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.layers import Dense, l2_normalize, xavier_normal
from recommendar_systems_tpu.models.losses import _wmean, bpr_loss_log2


def softmax_xavier(key, shape, dtype=jnp.float32):
    w = xavier_normal(key, shape, dtype)
    return jax.nn.softmax(w, axis=1)


class _ModalTower(nn.Module):
    """`dualgnn.py:269-348`: preference + 2-layer sym GCN residual stack.

    ``perturbed=True`` adds SimGCL-style directional noise after each
    propagation (MENTOR `mentor.py:525-541`)."""

    n_users: int
    dim_latent: int = 64

    def setup(self):
        self.preference = self.param(
            "preference", xavier_normal, (self.n_users, self.dim_latent)
        )
        self.MLP = Dense(4 * self.dim_latent, name="MLP")
        self.MLP_1 = Dense(self.dim_latent, name="MLP_1")

    def embed(self, features):
        """Normalized [preference; projected features] node matrix."""
        h1 = nn.leaky_relu(self.MLP(features), negative_slope=0.01)
        temp = self.MLP_1(h1)
        return l2_normalize(jnp.concatenate([self.preference, temp], axis=0))

    def _noise(self, h):
        noise = jax.random.uniform(self.make_rng("noise"), h.shape)
        return h + jnp.sign(h) * l2_normalize(noise) * 0.1

    def __call__(self, adj, features, perturbed: bool = False):
        x = self.embed(features)
        h = spmm(adj, x)
        if perturbed:
            h = self._noise(h)
        h_1 = spmm(adj, h)
        if perturbed:
            h_1 = self._noise(h_1)
        return x + h + h_1, self.preference


class DualGNN(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    reg_weight: float = 1e-5
    construction: str = "weighted_sum"
    has_v: bool = True
    has_t: bool = True

    def setup(self):
        if self.has_v:
            self.v_gcn = _ModalTower(self.n_users, self.embedding_size, name="v_gcn")
        if self.has_t:
            self.t_gcn = _ModalTower(self.n_users, self.embedding_size, name="t_gcn")
        if self.construction == "weighted_sum":
            self.weight_u = self.param(
                "weight_u", softmax_xavier, (self.n_users, 2, 1)
            )
            self.weight_i = self.param(
                "weight_i", softmax_xavier, (self.n_items, 2, 1)
            )
        else:  # cat_mlp
            self.MLP_user = Dense(self.embedding_size, name="MLP_user")

    def representation(self, ctx):
        v_rep = t_rep = None
        prefs = {}
        rep = None
        if self.has_v and self.has_t:
            # the tower propagations are linear, so both ride ONE
            # double-width pass over the shared adjacency (columnwise
            # equivalent to two per-tower spmm chains)
            d = self.embedding_size
            x = jnp.concatenate(
                [self.v_gcn.embed(ctx["v_feat"]),
                 self.t_gcn.embed(ctx["t_feat"])], axis=1
            )
            h = spmm(ctx["adj"], x)
            h_1 = spmm(ctx["adj"], h)
            out = x + h + h_1
            v_rep, t_rep = out[:, :d], out[:, d:]
            prefs["v"] = self.v_gcn.preference
            prefs["t"] = self.t_gcn.preference
            rep = v_rep + t_rep
        elif self.has_v:
            v_rep, prefs["v"] = self.v_gcn(ctx["adj"], ctx["v_feat"])
            rep = v_rep
        elif self.has_t:
            t_rep, prefs["t"] = self.t_gcn(ctx["adj"], ctx["t_feat"])
            rep = t_rep if rep is None else rep + t_rep

        if self.has_v and self.has_t:
            # the reference's `representation = self.v_rep` then
            # `representation += self.t_rep` mutates v_rep IN PLACE
            # (`dualgnn.py:147-155`), so its executed user blend mixes
            # (v+t) with t — reproduced here for exact parity
            stacked = jnp.stack(
                [rep[: self.n_users], t_rep[: self.n_users]], axis=2
            )  # [U, d, 2]
            user_rep = jnp.einsum("udm,umo->ud", stacked, self.weight_u)
        else:
            only = v_rep if self.has_v else t_rep
            user_rep = only[: self.n_users]

        item_rep = rep[self.n_users :]
        h_u1 = user_graph_aggregate(user_rep, ctx["ug_idx"], ctx["ug_w"])
        user_rep = user_rep + h_u1
        return jnp.concatenate([user_rep, item_rep], axis=0), prefs

    def loss(self, ctx, batch, train: bool = True):
        out, prefs = self.representation(ctx)
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        u = out[users]
        pos_s = jnp.sum(u * out[pos + self.n_users], 1)
        neg_s = jnp.sum(u * out[neg + self.n_users], 1)
        mf = bpr_loss_log2(pos_s, neg_s, weight=w)
        reg = 0.0
        if "v" in prefs:
            reg = reg + _wmean(jnp.mean(prefs["v"][users] ** 2, axis=1), w)
        if "t" in prefs:
            reg = reg + _wmean(jnp.mean(prefs["t"][users] ** 2, axis=1), w)
        if self.construction == "weighted_sum":
            reg = reg + jnp.mean(self.weight_u ** 2) + jnp.mean(self.weight_i ** 2)
        total = mf + self.reg_weight * reg
        return total, {"mf_loss": mf, "reg_loss": reg}

    def eval_embeddings(self, ctx):
        out, _ = self.representation(ctx)
        return out[: self.n_users], out[self.n_users :]

    @classmethod
    def from_config(cls, config, data) -> "DualGNN":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            reg_weight=float(_s(config["reg_weight"])),
            construction=str(config.get("construction") or "weighted_sum"),
            has_v=data.v_feat is not None,
            has_t=data.t_feat is not None,
        )

    @classmethod
    def build_ctx(cls, config, data):
        k = int(cfg_scalar(config, "user_graph_k", 40))  # `dualgnn.py:34`
        ug_idx, ug_w = build_user_topk_cooccurrence(
            data.train_users_np, data.train_items_np, data.n_users, data.n_items,
            k=k, weight_mode=str(config.get("user_aggr_mode") or "softmax"),
        )
        ctx = {
            "adj": build_norm_adj(
                data.train_users_np, data.train_items_np, data.n_users, data.n_items
            ),
            "ug_idx": ug_idx,
            "ug_w": ug_w,
        }
        if data.v_feat is not None:
            ctx["v_feat"] = data.v_feat
        if data.t_feat is not None:
            ctx["t_feat"] = data.t_feat
        return ctx


MODEL = DualGNN
