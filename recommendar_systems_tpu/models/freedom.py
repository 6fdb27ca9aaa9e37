"""FREEDOM (reference `/root/reference/src/models/freedom.py`).

Frozen item-item kNN modality graph blended as
``mm_image_weight * image_adj + (1 - mm_image_weight) * text_adj``
(`freedom.py:64-77`, unweighted edges normalized to ``1/k``), plus
degree-sensitive per-epoch edge dropout of the u-i graph
(`freedom.py:130-145`: multinomial without replacement on the normalized
edge values, kept subgraph renormalized).  Item representation = propagated
LightGCN item embedding + K_mm-layer mm-graph propagation of the id
embedding; loss = BPR + reg * (text-feature BPR + image-feature BPR)
(`freedom.py:191-212`).

TPU mapping: the mm graph is a concat-ELL (2k neighbors per item); edge
dropout is a Gumbel-top-k over edge values writing zero/renormalized values
into fixed COO slots (no shape change, no recompilation).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from recommendar_systems_tpu.graph.build import (
    build_edge_info,
    build_norm_adj,
    sym_coo_with_perm,
)
from recommendar_systems_tpu.graph.knn import build_knn_ell
from recommendar_systems_tpu.graph.sparse import ELL, spmm
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.layers import (
    Dense,
    lightgcn_propagate,
    xavier_uniform,
)
from recommendar_systems_tpu.models.losses import bpr_loss, emb_loss


def blend_modality_ells(image_ell, text_ell, image_weight: float):
    """w * image + (1-w) * text as a single concat-ELL (duplicate edges sum
    through SpMM, matching sparse-matrix addition in `freedom.py:74-76`)."""
    from recommendar_systems_tpu.graph.sparse import DenseMat

    if isinstance(image_ell, DenseMat) and isinstance(text_ell, DenseMat):
        return DenseMat(
            image_weight * image_ell.mat + (1.0 - image_weight) * text_ell.mat
        )
    idx = jnp.concatenate([image_ell.idx, text_ell.idx], axis=1)
    val = jnp.concatenate(
        [image_weight * image_ell.val, (1.0 - image_weight) * text_ell.val], axis=1
    )
    return ELL(idx=idx, val=val, n_cols=image_ell.n_cols)


def degree_weighted_edge_dropout(
    rng: jax.Array,
    edge_u: jnp.ndarray,
    edge_i: jnp.ndarray,
    edge_values: jnp.ndarray,
    sym_perm: jnp.ndarray,
    n_users: int,
    n_items: int,
    keep_len: int,
    uniform: bool = False,
) -> jnp.ndarray:
    """One epoch of degree-sensitive (or uniform) edge dropout.

    Samples ``keep_len`` edges without replacement — weighted by the
    normalized edge values (`freedom.py:135` / `layergcn.py:58-62`) via the
    Gumbel-top-k equivalence — renormalizes the kept bipartite subgraph
    (`freedom.py:147-157`), and scatters the values into the symmetric COO
    slot order given by ``sym_perm``.  Dropped edges get value 0.
    ``sym_perm=None`` returns the per-u-i-edge values instead (dense mode).
    """
    E = edge_values.shape[0]
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(rng, (E,)) + 1e-20) + 1e-20)
    keys = gumbel if uniform else jnp.log(edge_values + 1e-20) + gumbel
    _, keep_idx = jax.lax.top_k(keys, keep_len)
    mask = jnp.zeros((E,), jnp.float32).at[keep_idx].set(1.0)
    du = jax.ops.segment_sum(mask, edge_u, num_segments=n_users)
    di = jax.ops.segment_sum(mask, edge_i, num_segments=n_items)
    vals = mask * (du[edge_u] + 1e-7) ** -0.5 * (di[edge_i] + 1e-7) ** -0.5
    if sym_perm is None:
        return vals
    return jnp.concatenate([vals, vals])[sym_perm]


def dense_masked_bip(edge_u, edge_i, vals, n_users: int, n_items: int,
                     factored: bool = True):
    """Per-epoch masked dense block from per-edge values (one scatter per
    epoch, amortized over every step).

    ``factored`` (default): every value produced here — the initial graph's
    ``build_edge_info`` values AND ``degree_weighted_edge_dropout``'s
    renormalized survivors — has the separable form
    ``(deg_u'+1e-7)^-1/2 * (deg_i'+1e-7)^-1/2`` over the KEPT subgraph's
    degrees, so the block is stored as int8 surviving-edge counts plus
    recomputed row/col scales: half the HBM bytes of bf16 on every
    propagation read of the epoch, zero quantization error."""
    from recommendar_systems_tpu.graph.sparse import DenseBip

    if factored:
        m = (vals > 0).astype(jnp.float32)
        cnt = jnp.zeros((n_users, n_items), jnp.float32).at[edge_u, edge_i].add(m)
        du = jax.ops.segment_sum(m, edge_u, num_segments=n_users)
        di = jax.ops.segment_sum(m, edge_i, num_segments=n_items)
        return DenseBip(
            cnt.astype(jnp.int8),
            row_scale=(du + 1e-7) ** -0.5,
            col_scale=(di + 1e-7) ** -0.5,
        )
    ur = jnp.zeros((n_users, n_items), jnp.float32).at[edge_u, edge_i].add(vals)
    return DenseBip(ur)


class FREEDOM(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    feat_embed_dim: int = 64
    n_mm_layers: int = 1
    n_ui_layers: int = 2
    reg_weight: float = 1e-5
    has_v: bool = True
    has_t: bool = True
    has_pre_epoch = True

    def setup(self):
        self.user_embedding = self.param(
            "user_embedding", xavier_uniform, (self.n_users, self.embedding_size)
        )
        self.item_id_embedding = self.param(
            "item_id_embedding", xavier_uniform, (self.n_items, self.embedding_size)
        )
        if self.has_v:
            self.image_trs = Dense(self.feat_embed_dim)
        if self.has_t:
            self.text_trs = Dense(self.feat_embed_dim)

    def propagate(self, ctx, adj):
        # mm-graph propagation of the item id table (`freedom.py:166-169`)
        h = self.item_id_embedding
        for _ in range(self.n_mm_layers):
            h = spmm(ctx["mm_adj"], h)
        ego = jnp.concatenate([self.user_embedding, self.item_id_embedding], axis=0)
        all_emb = lightgcn_propagate(adj, ego, self.n_ui_layers)
        return all_emb[: self.n_users], all_emb[self.n_users :] + h

    def loss(self, ctx, batch, train: bool = True):
        ue, ie = self.propagate(ctx, ctx["masked_adj"])
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        u = ue[users]
        mf = bpr_loss(
            jnp.sum(u * ie[pos], 1), jnp.sum(u * ie[neg], 1), gamma=0.0, weight=w
        )
        mod = 0.0
        if self.has_t:
            tf = self.text_trs(ctx["t_feat"])
            mod = mod + bpr_loss(
                jnp.sum(u * tf[pos], 1), jnp.sum(u * tf[neg], 1), gamma=0.0, weight=w
            )
        if self.has_v:
            vf = self.image_trs(ctx["v_feat"])
            mod = mod + bpr_loss(
                jnp.sum(u * vf[pos], 1), jnp.sum(u * vf[neg], 1), gamma=0.0, weight=w
            )
        total = mf + self.reg_weight * mod
        return total, {"mf_loss": mf, "modal_bpr": mod}

    def eval_embeddings(self, ctx):
        return self.propagate(ctx, ctx["norm_adj"])

    @classmethod
    def from_config(cls, config, data) -> "FREEDOM":
        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            feat_embed_dim=int(config["feat_embed_dim"] or config["embedding_size"]),
            n_mm_layers=int(cfg_scalar(config, "n_mm_layers", 1)),
            n_ui_layers=int(cfg_scalar(config, "n_ui_layers", 2)),
            reg_weight=float(config["reg_weight"]),
            has_v=data.v_feat is not None,
            has_t=data.t_feat is not None,
        )

    @classmethod
    def build_ctx(cls, config, data):
        knn_k = int(cfg_scalar(config, "knn_k", 10))
        w_img = float(cfg_scalar(config, "mm_image_weight", 0.1))
        cache_dir = os.path.join(str(config["data_path"]), str(config["dataset"]))
        from recommendar_systems_tpu.graph.sparse import dense_ok

        dense_ui = dense_ok(data.n_users, data.n_items)
        norm_adj = build_norm_adj(
            data.train_users_np, data.train_items_np, data.n_users, data.n_items,
            dense=dense_ui or False,
        )
        edges, edge_values = build_edge_info(
            data.train_users_np, data.train_items_np, data.n_users, data.n_items
        )
        img_ell = txt_ell = None
        if data.v_feat is not None:
            img_ell = build_knn_ell(
                data.v_feat, knn_k, weighted=False,
                cache_dir=cache_dir, cache_key="freedom_image",
            )
        if data.t_feat is not None:
            txt_ell = build_knn_ell(
                data.t_feat, knn_k, weighted=False,
                cache_dir=cache_dir, cache_key="freedom_text",
            )
        if img_ell is not None and txt_ell is not None:
            mm_adj = blend_modality_ells(img_ell, txt_ell, w_img)
        else:
            mm_adj = img_ell if img_ell is not None else txt_ell
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
        ctx = {
            "norm_adj": norm_adj,
            # start with the full graph; pre_epoch overwrites values
            "masked_adj": masked_adj,
            "sym_perm": sym_perm,
            "edge_u": edge_u,
            "edge_i": edge_i,
            "edge_values": jnp.asarray(edge_values),
            "mm_adj": mm_adj,
        }
        if data.v_feat is not None:
            ctx["v_feat"] = data.v_feat
        if data.t_feat is not None:
            ctx["t_feat"] = data.t_feat
        return ctx

    @classmethod
    def pre_epoch(cls, ctx, rng, config):
        dropout = float(cfg_scalar(config, "dropout", 0.0))
        if isinstance(config.get("dropout"), list):
            dropout = float(config["dropout"][0])
        dense_ui = ctx["sym_perm"] is None
        n_items = int(config["__n_items__"])
        n_users = int(config["__n_users__"])
        if dropout <= 0.0:
            ctx = dict(ctx)
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
        vals = degree_weighted_edge_dropout(
            rng,
            ctx["edge_u"],
            ctx["edge_i"],
            ctx["edge_values"],
            ctx["sym_perm"],
            n_users,
            n_items,
            keep_len,
        )
        ctx = dict(ctx)
        if dense_ui:
            ctx["masked_adj"] = dense_masked_bip(
                ctx["edge_u"], ctx["edge_i"], vals, n_users, n_items
            )
        else:
            ctx["masked_adj"] = ctx["masked_adj"].with_values(vals)
        return ctx


MODEL = FREEDOM
