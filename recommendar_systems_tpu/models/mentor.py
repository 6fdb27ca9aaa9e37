"""MENTOR (reference `/root/reference/src/models/mentor.py`).

DualGNN-style per-modality GCNs plus an id GCN over a learnable item
feature table, and four SimGCL-like noise-perturbed GCN copies
(`mentor.py:224-260, 525-541`); frozen FREEDOM-style mm item graph adds an
item residual per view (`mentor.py:344-347`); alignment via Gaussian moment
matching across the four embedding spaces (`mentor.py:349-441`); a masked
feature cosine loss through a stop-gradient MLP view (`mentor.py:421-432`),
and InfoNCE between the two noise views scaled by mask_weight_g
(`mentor.py:441-446`).  Loss = log2-BPR + reg + align + mask_f + mask_g.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendar_systems_tpu.graph.build import build_norm_adj
from recommendar_systems_tpu.graph.knn import build_knn_ell
from recommendar_systems_tpu.graph.sparse import spmm
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.dualgnn import _ModalTower, softmax_xavier
from recommendar_systems_tpu.models.freedom import blend_modality_ells
from recommendar_systems_tpu.models.layers import (
    Dense,
    l2_normalize,
    xavier_normal,
)
from recommendar_systems_tpu.models.losses import _wmean, bpr_loss_log2, infonce

from flax import linen as nn


class MENTOR(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    feat_embed_dim: int = 64
    n_mm_layers: int = 1
    reg_weight: float = 1e-3
    align_weight: float = 0.1
    mask_weight_f: float = 1.5
    mask_weight_g: float = 0.001
    temp: float = 0.4
    dropout: float = 0.5

    def setup(self):
        d = self.embedding_size
        self.v_gcn = _ModalTower(self.n_users, d, name="v_gcn")
        self.t_gcn = _ModalTower(self.n_users, d, name="t_gcn")
        self.id_gcn = _ModalTower(self.n_users, d, name="id_gcn")
        self.v_gcn_n1 = _ModalTower(self.n_users, d, name="v_gcn_n1")
        self.v_gcn_n2 = _ModalTower(self.n_users, d, name="v_gcn_n2")
        self.t_gcn_n1 = _ModalTower(self.n_users, d, name="t_gcn_n1")
        self.t_gcn_n2 = _ModalTower(self.n_users, d, name="t_gcn_n2")
        self.id_feat = self.param("id_feat", xavier_normal, (self.n_items, d))
        self.weight_u = self.param("weight_u", softmax_xavier, (self.n_users, 2, 1))
        self.weight_i = self.param("weight_i", softmax_xavier, (self.n_items, 2, 1))
        self.mlp = Dense(2 * d, name="mlp")
        self.mask_drop = nn.Dropout(rate=self.dropout)

    def _item_graph(self, ctx, h):
        for _ in range(self.n_mm_layers):
            h = spmm(ctx["mm_adj"], h)
        return h

    def _dup_user(self, rep):
        u = rep[: self.n_users]
        return jnp.concatenate([u, u], axis=1)

    def views(self, ctx, train: bool):
        adj = ctx["adj"]
        # all 7 towers share the adjacency: batch their propagations into one
        # wide SpMM over [N, 7d] (7x fewer gather/scatter passes; per-tower
        # math unchanged — SpMM is columnwise-independent)
        towers = [
            (self.v_gcn, ctx["v_feat"], False),
            (self.t_gcn, ctx["t_feat"], False),
            (self.id_gcn, self.id_feat, False),
            (self.v_gcn_n1, ctx["v_feat"], train),
            (self.t_gcn_n1, ctx["t_feat"], train),
            (self.v_gcn_n2, ctx["v_feat"], train),
            (self.t_gcn_n2, ctx["t_feat"], train),
        ]
        d = self.embedding_size
        xs = [tw.embed(f) for tw, f, _ in towers]
        X = jnp.concatenate(xs, axis=1)

        def propagate_with_noise(M):
            H = spmm(adj, M)
            parts = []
            for k, (tw, _, noisy) in enumerate(towers):
                sl = H[:, k * d : (k + 1) * d]
                parts.append(tw._noise(sl) if noisy else sl)
            return jnp.concatenate(parts, axis=1)

        H = propagate_with_noise(X)
        H1 = propagate_with_noise(H)
        outs = [
            xs[k] + H[:, k * d : (k + 1) * d] + H1[:, k * d : (k + 1) * d]
            for k in range(7)
        ]
        v_rep, t_rep, id_rep, v_n1, t_n1, v_n2, t_n2 = outs
        v_pref = self.v_gcn.preference
        t_pref = self.t_gcn.preference

        rep = jnp.concatenate([v_rep, t_rep], axis=1)
        guide_rep = jnp.concatenate([id_rep, id_rep], axis=1)
        v_full = jnp.concatenate([v_rep, v_rep], axis=1)
        t_full = jnp.concatenate([t_rep, t_rep], axis=1)
        rep_n1 = jnp.concatenate([v_n1, t_n1], axis=1)
        rep_n2 = jnp.concatenate([v_n2, t_n2], axis=1)

        wu = jnp.swapaxes(self.weight_u, 1, 2)  # [U, 1, 2]

        def blend_user(a, b):
            stacked = jnp.stack([a[: self.n_users], b[: self.n_users]], axis=2)
            weighted = wu * stacked
            return jnp.concatenate([weighted[:, :, 0], weighted[:, :, 1]], axis=1)

        user_rep = blend_user(v_rep, t_rep)
        user_n1 = blend_user(v_n1, t_n1)
        user_n2 = blend_user(v_n2, t_n2)
        guide_user = guide_rep[: self.n_users]
        v_user = v_full[: self.n_users]
        t_user = t_full[: self.n_users]

        def assemble(user, item_src):
            item = item_src[self.n_users :]
            item = item + self._item_graph(ctx, item)
            return jnp.concatenate([user, item], axis=0)

        result = assemble(user_rep, rep)
        result_guide = assemble(guide_user, guide_rep)
        result_v = assemble(v_user, v_full)
        result_t = assemble(t_user, t_full)
        result_n1 = assemble(user_n1, rep_n1)
        result_n2 = assemble(user_n2, rep_n2)
        return result, result_guide, result_v, result_t, result_n1, result_n2, v_pref, t_pref

    def loss(self, ctx, batch, train: bool = True):
        (result, guide, r_v, r_t, n1, n2, v_pref, t_pref) = self.views(ctx, train)
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        u = result[users]
        pos_s = jnp.sum(u * result[pos + self.n_users], 1)
        neg_s = jnp.sum(u * result[neg + self.n_users], 1)
        mf = bpr_loss_log2(pos_s, neg_s, weight=w)

        reg = _wmean(jnp.mean(v_pref[users] ** 2, axis=1), w) + _wmean(
            jnp.mean(t_pref[users] ** 2, axis=1), w
        )
        reg = self.reg_weight * (reg + jnp.mean(self.weight_u ** 2))

        # masked-feature cosine loss via MLP on stop-grad views (`mentor.py:421-432`)
        user_rep = result[: self.n_users]
        item_rep = result[self.n_users :]
        u_sg = jax.lax.stop_gradient(user_rep)
        i_sg = jax.lax.stop_gradient(item_rep)
        det = not train
        u2 = self.mlp(u_sg)
        i2 = self.mlp(i_sg)
        u1 = self.mask_drop(u_sg, deterministic=det)
        i1 = self.mask_drop(i_sg, deterministic=det)
        mask_f = self.mask_weight_f * (
            (1 - jnp.sum(l2_normalize(u1) * l2_normalize(u2), -1).mean())
            + (1 - jnp.sum(l2_normalize(i1) * l2_normalize(i2), -1).mean())
        )

        # Gaussian moment alignment over 4 spaces (`mentor.py:349-441`)
        def mv(x):
            return jnp.var(x), jnp.mean(x)

        r_var, r_mean = mv(result)
        g_var, g_mean = mv(guide)
        v_var, v_mean = mv(r_v)
        t_var, t_mean = mv(r_t)
        align = (
            jnp.abs(g_var - r_var) + jnp.abs(g_mean - r_mean)
            + jnp.abs(g_var - v_var) + jnp.abs(g_mean - v_mean)
            + jnp.abs(g_var - t_var) + jnp.abs(g_mean - t_mean)
            + jnp.abs(r_var - v_var) + jnp.abs(r_mean - v_mean)
            + jnp.abs(r_var - t_var) + jnp.abs(r_mean - t_mean)
            + jnp.abs(v_var - t_var) + jnp.abs(v_mean - t_mean)
        ) * self.align_weight

        # SimGCL-style noise-view InfoNCE (`mentor.py:441-446`)
        mask_g = self.mask_weight_g * (
            infonce(n1[: self.n_users], n2[: self.n_users], self.temp)
            + infonce(n1[self.n_users :], n2[self.n_users :], self.temp)
        )

        total = mf + reg + align + mask_f + mask_g
        return total, {
            "mf_loss": mf,
            "reg_loss": reg,
            "align": align,
            "mask_f": mask_f,
            "mask_g": mask_g,
        }

    def eval_embeddings(self, ctx):
        result, *_ = self.views(ctx, train=False)
        return result[: self.n_users], result[self.n_users :]

    @classmethod
    def from_config(cls, config, data) -> "MENTOR":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            feat_embed_dim=int(cfg_scalar(config, "feat_embed_dim", 64)),
            n_mm_layers=int(cfg_scalar(config, "n_mm_layers", 1)),
            reg_weight=float(_s(config["reg_weight"])),
            align_weight=float(cfg_scalar(config, "align_weight", 0.1)),
            mask_weight_f=float(cfg_scalar(config, "mask_weight_f", 1.5)),
            mask_weight_g=float(cfg_scalar(config, "mask_weight_g", 0.001)),
            temp=float(cfg_scalar(config, "temp", 0.4)),
            dropout=float(cfg_scalar(config, "dropout", 0.5)),
        )

    @classmethod
    def build_ctx(cls, config, data):
        import os

        knn_k = int(cfg_scalar(config, "knn_k", 10))
        w_img = float(cfg_scalar(config, "mm_image_weight", 0.1))
        cache_dir = os.path.join(str(config["data_path"]), str(config["dataset"]))
        img = build_knn_ell(
            data.v_feat, knn_k, weighted=False,
            cache_dir=cache_dir, cache_key="mentor_image",
        )
        txt = build_knn_ell(
            data.t_feat, knn_k, weighted=False,
            cache_dir=cache_dir, cache_key="mentor_text",
        )
        return {
            "adj": build_norm_adj(
                data.train_users_np, data.train_items_np, data.n_users, data.n_items
            ),
            "mm_adj": blend_modality_ells(img, txt, w_img),
            "v_feat": data.v_feat,
            "t_feat": data.t_feat,
        }


MODEL = MENTOR
