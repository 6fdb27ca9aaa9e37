"""LayerGCN (reference `/root/reference/src/models/layergcn.py`).

Layer-refined GCN: after each propagation layer the embeddings are reweighted
per-node by their cosine similarity to the ego embeddings
(`layergcn.py:127-140`, the ``einsum('a,ab->ab')``), and the layer stack is
SUMMED (no ego layer).  Loss is the sum-form BPR (`layergcn.py:142-154`,
``sum`` not ``mean``) plus L2Loss.  Per-epoch edge pruning alternates between
degree-weighted and uniform sampling (`layergcn.py:51-70`,
``pruning_random`` flips each epoch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendar_systems_tpu.graph.build import (
    build_edge_info,
    build_norm_adj,
    sym_coo_with_perm,
)
from recommendar_systems_tpu.graph.sparse import spmm
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.freedom import degree_weighted_edge_dropout
from recommendar_systems_tpu.models.layers import l2_normalize, xavier_uniform
from recommendar_systems_tpu.models.losses import l2_loss


class LayerGCN(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    n_layers: int = 4
    reg_weight: float = 1e-2
    has_pre_epoch = True

    def setup(self):
        self.user_embeddings = self.param(
            "user_embeddings", xavier_uniform, (self.n_users, self.embedding_size)
        )
        self.item_embeddings = self.param(
            "item_embeddings", xavier_uniform, (self.n_items, self.embedding_size)
        )

    def propagate(self, ctx, adj):
        ego = jnp.concatenate([self.user_embeddings, self.item_embeddings], axis=0)
        h = ego
        acc = 0.0
        ego_n = l2_normalize(ego)
        for _ in range(self.n_layers):
            h = spmm(adj, h)
            weights = jnp.sum(l2_normalize(h) * ego_n, axis=-1)
            h = weights[:, None] * h
            acc = acc + h
        return acc[: self.n_users], acc[self.n_users :]

    def loss(self, ctx, batch, train: bool = True):
        ue, ie = self.propagate(ctx, ctx["masked_adj"])
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight", jnp.ones_like(users, dtype=jnp.float32))
        u = ue[users]
        pos_s = jnp.sum(u * ie[pos], 1)
        neg_s = jnp.sum(u * ie[neg], 1)
        # sum-form BPR (`layergcn.py:150-152`)
        mf = jnp.sum(-jax.nn.log_sigmoid(pos_s - neg_s) * w)
        reg = l2_loss(
            self.user_embeddings[users] * w[:, None],
            self.item_embeddings[pos] * w[:, None],
            self.item_embeddings[neg] * w[:, None],
        )
        total = mf + self.reg_weight * reg
        return total, {"mf_loss": mf, "reg_loss": reg}

    def eval_embeddings(self, ctx):
        return self.propagate(ctx, ctx["norm_adj"])

    @classmethod
    def from_config(cls, config, data) -> "LayerGCN":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            n_layers=int(cfg_scalar(config, "n_layers", 4)),
            reg_weight=float(_s(config["reg_weight"])),
        )

    @classmethod
    def build_ctx(cls, config, data):
        from recommendar_systems_tpu.graph.sparse import dense_ok
        from recommendar_systems_tpu.models.freedom import dense_masked_bip

        dense_ui = dense_ok(data.n_users, data.n_items)
        norm_adj = build_norm_adj(
            data.train_users_np, data.train_items_np, data.n_users, data.n_items,
            dense=dense_ui or False,
        )
        edges, edge_values = build_edge_info(
            data.train_users_np, data.train_items_np, data.n_users, data.n_items
        )
        edge_u = jnp.asarray(edges[0], dtype=jnp.int32)
        edge_i = jnp.asarray(edges[1], dtype=jnp.int32)
        if dense_ui:
            masked_adj = dense_masked_bip(
                edge_u, edge_i, jnp.asarray(edge_values),
                data.n_users, data.n_items,
            )
            sym_perm = None
        else:
            masked_coo, sym_perm = sym_coo_with_perm(
                data.train_users_np, data.train_items_np,
                data.n_users, data.n_items,
            )
            masked_adj = masked_coo.with_values(norm_adj.vals)
        return {
            "norm_adj": norm_adj,
            "masked_adj": masked_adj,
            "sym_perm": sym_perm,
            "edge_u": edge_u,
            "edge_i": edge_i,
            "edge_values": jnp.asarray(edge_values),
            # epoch parity for the alternating pruning mode
            "prune_random": jnp.zeros((), jnp.int32),
        }

    @classmethod
    def pre_epoch(cls, ctx, rng, config):
        dropout = cfg_scalar(config, "dropout", 0.0)
        if isinstance(dropout, list):
            dropout = dropout[0]
        dropout = float(dropout)
        from recommendar_systems_tpu.models.freedom import dense_masked_bip

        dense_ui = ctx["sym_perm"] is None
        n_users = int(config["__n_users__"])
        n_items = int(config["__n_items__"])
        ctx = dict(ctx)
        if dropout <= 0.0:
            if dense_ui:
                ctx["masked_adj"] = dense_masked_bip(
                    ctx["edge_u"], ctx["edge_i"], ctx["edge_values"],
                    n_users, n_items,
                )
            else:
                ctx["masked_adj"] = ctx["masked_adj"].with_values(
                    ctx["norm_adj"].vals
                )
            return ctx
        E = ctx["edge_values"].shape[0]
        keep_len = int(E * (1.0 - dropout))

        def weighted(rng):
            return degree_weighted_edge_dropout(
                rng, ctx["edge_u"], ctx["edge_i"], ctx["edge_values"],
                ctx["sym_perm"], n_users, n_items, keep_len, uniform=False,
            )

        def uniform(rng):
            return degree_weighted_edge_dropout(
                rng, ctx["edge_u"], ctx["edge_i"], ctx["edge_values"],
                ctx["sym_perm"], n_users, n_items, keep_len, uniform=True,
            )

        vals = jax.lax.cond(ctx["prune_random"] % 2 == 1, uniform, weighted, rng)
        if dense_ui:
            ctx["masked_adj"] = dense_masked_bip(
                ctx["edge_u"], ctx["edge_i"], vals, n_users, n_items
            )
        else:
            ctx["masked_adj"] = ctx["masked_adj"].with_values(vals)
        ctx["prune_random"] = ctx["prune_random"] + 1
        return ctx


MODEL = LayerGCN
