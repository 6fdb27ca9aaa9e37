"""LGMRec (reference `/root/reference/src/models/lgmrec.py`, AAAI'24).

Local: CGE LightGCN (`lgmrec.py:89-100`) + MGE modality propagation where
user features come from the raw interaction matrix times item features
scaled by 1/deg (`lgmrec.py:103-113`).  Global: hypergraph embeddings via
gumbel-softmax hyperedge assignments from modality features
(`lgmrec.py:117-126`) and a two-step dense HGNN (`lgmrec.py:202-214`).
Fusion ``lge + alpha * normalize(ghe)`` (`lgmrec.py:131-145`); loss = BPR +
cl_weight * hypergraph contrastive (sum-form, `lgmrec.py:159-166`) +
reg_weight * emb-norm loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommendar_systems_tpu.graph.build import build_norm_adj
from recommendar_systems_tpu.graph.sparse import COO, spmm
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.layers import l2_normalize, xavier_uniform
from recommendar_systems_tpu.models.losses import bpr_loss, emb_loss


def gumbel_softmax(rng, logits, tau: float):
    g = -jnp.log(-jnp.log(jax.random.uniform(rng, logits.shape) + 1e-20) + 1e-20)
    return jax.nn.softmax((logits + g) / tau, axis=1)


class LGMRec(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    feat_embed_dim: int = 64
    n_mm_layers: int = 2
    n_ui_layers: int = 2
    n_hyper_layer: int = 1
    hyper_num: int = 4
    keep_rate: float = 0.5
    alpha: float = 0.3
    cl_weight: float = 1e-4
    reg_weight: float = 1e-6
    tau: float = 0.2
    v_dim: int = 0
    t_dim: int = 0

    def setup(self):
        d = self.embedding_size
        self.user_embedding = self.param(
            "user_embedding", xavier_uniform, (self.n_users, d)
        )
        self.item_id_embedding = self.param(
            "item_id_embedding", xavier_uniform, (self.n_items, d)
        )
        self.item_image_trs = self.param(
            "item_image_trs", xavier_uniform, (self.v_dim, self.feat_embed_dim)
        )
        self.item_text_trs = self.param(
            "item_text_trs", xavier_uniform, (self.t_dim, self.feat_embed_dim)
        )
        self.v_hyper = self.param(
            "v_hyper", xavier_uniform, (self.v_dim, self.hyper_num)
        )
        self.t_hyper = self.param(
            "t_hyper", xavier_uniform, (self.t_dim, self.hyper_num)
        )
        self.drop = nn.Dropout(rate=1.0 - self.keep_rate)

    def cge(self, ctx):
        ego = jnp.concatenate([self.user_embedding, self.item_id_embedding], axis=0)
        layers = [ego]
        h = ego
        for _ in range(self.n_ui_layers):
            h = spmm(ctx["norm_adj"], h)
            layers.append(h)
        return jnp.stack(layers, 1).mean(1)

    def mge(self, ctx, modality: str):
        feats = ctx["v_feat"] if modality == "v" else ctx["t_feat"]
        trs = self.item_image_trs if modality == "v" else self.item_text_trs
        item_feats = feats @ trs
        user_feats = spmm(ctx["R_raw"], item_feats) * ctx["inv_deg_users"][:, None]
        h = jnp.concatenate([user_feats, item_feats], axis=0)
        for _ in range(self.n_mm_layers):
            h = spmm(ctx["norm_adj"], h)
        return h

    def hgnn(self, i_hyper, u_hyper, embeds):
        i_ret = embeds
        u_ret = None
        for _ in range(self.n_hyper_layer):
            lat = i_hyper.T @ i_ret
            i_ret = i_hyper @ lat
            u_ret = u_hyper @ lat
        return u_ret, i_ret

    def views(self, ctx, train: bool):
        det = not train
        kv = self.make_rng("sample") if train else jax.random.key(0)
        k1, k2, k3, k4 = jax.random.split(kv, 4)

        iv = ctx["v_feat"] @ self.v_hyper
        uv = spmm(ctx["R_raw"], iv)
        it = ctx["t_feat"] @ self.t_hyper
        ut = spmm(ctx["R_raw"], it)
        iv = gumbel_softmax(k1, iv, self.tau)
        uv = gumbel_softmax(k2, uv, self.tau)
        it = gumbel_softmax(k3, it, self.tau)
        ut = gumbel_softmax(k4, ut, self.tau)

        cge_embs = self.cge(ctx)
        v_feats = self.mge(ctx, "v")
        t_feats = self.mge(ctx, "t")
        mge_embs = l2_normalize(v_feats) + l2_normalize(t_feats)
        lge_embs = cge_embs + mge_embs

        item_cge = cge_embs[self.n_users :]
        uv_e, iv_e = self.hgnn(
            self.drop(iv, deterministic=det), self.drop(uv, deterministic=det), item_cge
        )
        ut_e, it_e = self.hgnn(
            self.drop(it, deterministic=det), self.drop(ut, deterministic=det), item_cge
        )
        ghe_embs = jnp.concatenate([uv_e, iv_e], axis=0) + jnp.concatenate(
            [ut_e, it_e], axis=0
        )
        all_embs = lge_embs + self.alpha * l2_normalize(ghe_embs)
        return all_embs, (uv_e, iv_e, ut_e, it_e)

    def ssl_triple_loss(self, emb1, emb2, all_emb, w):
        n1, n2, na = l2_normalize(emb1), l2_normalize(emb2), l2_normalize(all_emb)
        pos = jnp.sum(n1 * n2, axis=1) / self.tau
        lse = jax.nn.logsumexp(n1 @ na.T / self.tau, axis=1)
        per = -(pos - lse)
        if w is not None:
            per = per * w
        return per.sum()

    def loss(self, ctx, batch, train: bool = True):
        all_embs, (uv_e, iv_e, ut_e, it_e) = self.views(ctx, train)
        ue, ie = all_embs[: self.n_users], all_embs[self.n_users :]
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        u, pe, ne = ue[users], ie[pos], ie[neg]
        mf = bpr_loss(jnp.sum(u * pe, 1), jnp.sum(u * ne, 1), gamma=0.0, weight=w)
        hcl = self.ssl_triple_loss(uv_e[users], ut_e[users], ut_e, w) + \
            self.ssl_triple_loss(iv_e[pos], it_e[pos], it_e, w)
        reg = emb_loss(u, pe, ne, weight=w)
        total = mf + self.cl_weight * hcl + self.reg_weight * reg
        return total, {"mf_loss": mf, "hcl_loss": hcl, "reg_loss": reg}

    def eval_embeddings(self, ctx):
        all_embs, _ = self.views(ctx, train=False)
        return all_embs[: self.n_users], all_embs[self.n_users :]

    @classmethod
    def from_config(cls, config, data) -> "LGMRec":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            feat_embed_dim=int(config["feat_embed_dim"] or config["embedding_size"]),
            n_mm_layers=int(cfg_scalar(config, "n_mm_layers", 2)),
            n_ui_layers=int(cfg_scalar(config, "n_ui_layers", 2)),
            n_hyper_layer=int(cfg_scalar(config, "n_hyper_layer", 1)),
            hyper_num=int(cfg_scalar(config, "hyper_num", 4)),
            keep_rate=float(cfg_scalar(config, "keep_rate", 0.5)),
            alpha=float(cfg_scalar(config, "alpha", 0.3)),
            cl_weight=float(cfg_scalar(config, "cl_weight", 1e-4)),
            reg_weight=float(cfg_scalar(config, "reg_weight", 1e-6)),
            v_dim=int(data.v_feat.shape[1]),
            t_dim=int(data.t_feat.shape[1]),
        )

    @classmethod
    def build_ctx(cls, config, data):
        import numpy as np

        from recommendar_systems_tpu.graph.sparse import raw_ui_view

        u, i = data.train_users_np, data.train_items_np
        deg_u = np.bincount(u, minlength=data.n_users).astype(np.float32)
        norm_adj = build_norm_adj(u, i, data.n_users, data.n_items)
        # raw interaction lift rides the adjacency's factored count block
        # (same int8 HBM buffer, MXU matmul) instead of a per-step COO
        # gather/segment-sum — LGMRec 116k -> see matrix
        R_raw = raw_ui_view(norm_adj)
        if R_raw is None:
            order = np.lexsort((i, u))
            R_raw = COO(
                rows=jnp.asarray(u[order], dtype=jnp.int32),
                cols=jnp.asarray(i[order], dtype=jnp.int32),
                vals=jnp.ones(len(u), jnp.float32),
                n_rows=data.n_users,
                n_cols=data.n_items,
            )
        return {
            "norm_adj": norm_adj,
            "R_raw": R_raw,
            "inv_deg_users": jnp.asarray(1.0 / (deg_u + 1e-7)),
            "v_feat": data.v_feat,
            "t_feat": data.t_feat,
        }


MODEL = LGMRec
