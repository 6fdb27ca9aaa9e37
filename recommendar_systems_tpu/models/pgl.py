"""PGL (reference `/root/reference/src/models/pgl.py`, AAAI'25).

Dual user towers (image/text embedding tables concatenated) with items
represented by normalized projected modality features (`pgl.py:202-225`);
frozen FREEDOM-style mm item graph; two training-graph modes:
- 'local': per-epoch 30% degree-weighted edge subsample (`pgl.py:168-181`);
- 'global': SVD-filtered graph built from the product of the top-25% and
  bottom-25% singular values of the normalized adjacency (`pgl.py:138-154`).

Loss = BPR + reg_weight * InfoNCE self-augmentation between two dropout
views of the same batch embeddings (`pgl.py:245-259`).

TPU notes: the 'global' SVD uses the randomized SpMM SVD (`ops/svd.py`)
instead of SuperLU `sparsesvd`, and keeps the filtered graph in exact
low-rank form (L @ R^T) rather than thresholding a dense product.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommendar_systems_tpu.graph.build import (
    build_edge_info,
    build_norm_adj,
    sym_coo_with_perm,
)
from recommendar_systems_tpu.graph.knn import build_knn_ell
from recommendar_systems_tpu.graph.sparse import LowRank, spmm, spmm_coo
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.freedom import (
    blend_modality_ells,
    degree_weighted_edge_dropout,
)
from recommendar_systems_tpu.models.layers import (
    Dense,
    l2_normalize,
    lightgcn_propagate,
    xavier_uniform,
)
from recommendar_systems_tpu.models.losses import bpr_loss, infonce
from recommendar_systems_tpu.ops.svd import randomized_svd


class PGL(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    feat_embed_dim: int = 64
    n_mm_layers: int = 1
    n_ui_layers: int = 2
    reg_weight: float = 0.0
    dropout: float = 0.2
    mode: str = "local"
    has_pre_epoch = True

    def setup(self):
        d = self.embedding_size
        self.user_image = self.param("user_image", xavier_uniform, (self.n_users, d))
        self.user_text = self.param("user_text", xavier_uniform, (self.n_users, d))
        self.image_trs = Dense(self.feat_embed_dim)
        self.text_trs = Dense(self.feat_embed_dim)
        self.dropf = nn.Dropout(rate=self.dropout)

    def propagate(self, ctx, adj):
        image_feats = l2_normalize(self.image_trs(ctx["v_feat"]))
        text_feats = l2_normalize(self.text_trs(ctx["t_feat"]))
        user_embeds = jnp.concatenate([self.user_image, self.user_text], axis=1)
        item_embeds = jnp.concatenate([image_feats, text_feats], axis=1)

        h = item_embeds
        for _ in range(self.n_mm_layers):
            h = spmm(ctx["mm_adj"], h)

        ego = jnp.concatenate([user_embeds, item_embeds], axis=0)
        all_emb = lightgcn_propagate(adj, ego, self.n_ui_layers)
        return all_emb[: self.n_users], all_emb[self.n_users :] + h

    def loss(self, ctx, batch, train: bool = True):
        adj = ctx["sub_graph"] if ctx.get("sub_graph") is not None else ctx["norm_adj"]
        if self.mode == "global":
            # global graph: norm_adj + low-rank SVD filter applied additively
            ue, ie = self._propagate_global(ctx)
        else:
            ue, ie = self.propagate(ctx, adj)
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        u, pe, ne = ue[users], ie[pos], ie[neg]
        mf = bpr_loss(jnp.sum(u * pe, 1), jnp.sum(u * ne, 1), gamma=0.0, weight=w)
        det = not train
        cl = (
            infonce(self.dropf(u, deterministic=det), self.dropf(u, deterministic=det), 0.2, weight=w)
            + infonce(self.dropf(pe, deterministic=det), self.dropf(pe, deterministic=det), 0.2, weight=w)
        ) / 2.0
        total = mf + self.reg_weight * cl
        return total, {"mf_loss": mf, "cl_loss": cl}

    def _propagate_global(self, ctx):
        """Training propagation over the SVD-filtered low-rank graph."""
        image_feats = l2_normalize(self.image_trs(ctx["v_feat"]))
        text_feats = l2_normalize(self.text_trs(ctx["t_feat"]))
        user_embeds = jnp.concatenate([self.user_image, self.user_text], axis=1)
        item_embeds = jnp.concatenate([image_feats, text_feats], axis=1)
        h = item_embeds
        for _ in range(self.n_mm_layers):
            h = spmm(ctx["mm_adj"], h)
        ego = jnp.concatenate([user_embeds, item_embeds], axis=0)
        all_emb = lightgcn_propagate(ctx["svd_graph"], ego, self.n_ui_layers)
        return all_emb[: self.n_users], all_emb[self.n_users :] + h

    def eval_embeddings(self, ctx):
        return self.propagate(ctx, ctx["norm_adj"])

    @classmethod
    def from_config(cls, config, data) -> "PGL":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            feat_embed_dim=int(config["feat_embed_dim"] or config["embedding_size"]),
            n_mm_layers=int(cfg_scalar(config, "n_mm_layers", 1)),
            n_ui_layers=int(cfg_scalar(config, "n_ui_layers", 2)),
            reg_weight=float(cfg_scalar(config, "reg_weight", 0.0)),
            dropout=float(cfg_scalar(config, "dropout", 0.2)),
            mode=str(_s(config["mode"]) or "local"),
        )

    @classmethod
    def build_ctx(cls, config, data):
        import os

        def _s(v):
            return v[0] if isinstance(v, list) else v

        knn_k = int(cfg_scalar(config, "knn_k", 10))
        w_img = float(cfg_scalar(config, "mm_image_weight", 0.1))
        mode = str(_s(config["mode"]) or "local")
        cache_dir = os.path.join(str(config["data_path"]), str(config["dataset"]))
        from recommendar_systems_tpu.graph.sparse import dense_ok
        from recommendar_systems_tpu.models.freedom import dense_masked_bip

        # global mode runs randomized SVD through spmm_coo -> stays sparse
        dense_ui = mode == "local" and dense_ok(data.n_users, data.n_items)
        norm_adj = build_norm_adj(
            data.train_users_np, data.train_items_np, data.n_users, data.n_items,
            dense=dense_ui or False,
        )
        edges, edge_values = build_edge_info(
            data.train_users_np, data.train_items_np, data.n_users, data.n_items
        )
        img = build_knn_ell(
            data.v_feat, knn_k, weighted=False,
            cache_dir=cache_dir, cache_key="pgl_image",
        )
        txt = build_knn_ell(
            data.t_feat, knn_k, weighted=False,
            cache_dir=cache_dir, cache_key="pgl_text",
        )
        edge_u = jnp.asarray(edges[0], dtype=jnp.int32)
        edge_i = jnp.asarray(edges[1], dtype=jnp.int32)
        if dense_ui:
            sub_graph = dense_masked_bip(
                edge_u, edge_i, jnp.asarray(edge_values),
                data.n_users, data.n_items,
            )
            sym_perm = None
        else:
            masked_adj, sym_perm = sym_coo_with_perm(
                data.train_users_np, data.train_items_np,
                data.n_users, data.n_items,
            )
            sub_graph = masked_adj.with_values(norm_adj.vals)
        ctx = {
            "norm_adj": norm_adj,
            "sub_graph": sub_graph,
            "sym_perm": sym_perm,
            "edge_u": edge_u,
            "edge_i": edge_i,
            "edge_values": jnp.asarray(edge_values),
            "mm_adj": blend_modality_ells(img, txt, w_img),
            "v_feat": data.v_feat,
            "t_feat": data.t_feat,
        }
        if mode == "global":
            k = int(config["embedding_size"])
            u_svd, s, v_svd = randomized_svd(
                matvec=lambda x: spmm_coo(norm_adj, x),
                rmatvec=lambda y: spmm_coo(norm_adj, y),  # symmetric
                n_rows=norm_adj.n_rows,
                n_cols=norm_adj.n_cols,
                k=k,
            )
            m = int(0.25 * k)
            prod = s[:m] * s[-m:]
            ctx["svd_graph"] = LowRank(
                left=u_svd[:, :m] * prod[None, :], right=v_svd[:, :m]
            )
        return ctx

    @classmethod
    def pre_epoch(cls, ctx, rng, config):
        def _s(v):
            return v[0] if isinstance(v, list) else v

        if str(_s(config.get("mode")) or "local") != "local":
            return ctx
        E = ctx["edge_values"].shape[0]
        keep_len = int(E * 0.3)  # `pgl.py:171`: keep 30%
        from recommendar_systems_tpu.models.freedom import dense_masked_bip

        vals = degree_weighted_edge_dropout(
            rng, ctx["edge_u"], ctx["edge_i"], ctx["edge_values"],
            ctx["sym_perm"], int(config["__n_users__"]), int(config["__n_items__"]),
            keep_len,
        )
        ctx = dict(ctx)
        if ctx["sym_perm"] is None:
            ctx["sub_graph"] = dense_masked_bip(
                ctx["edge_u"], ctx["edge_i"], vals,
                int(config["__n_users__"]), int(config["__n_items__"]),
            )
        else:
            ctx["sub_graph"] = ctx["sub_graph"].with_values(vals)
        return ctx


MODEL = PGL
