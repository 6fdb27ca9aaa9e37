"""LightGCNCLIP (reference `/root/reference/src/models/lightgcnclip.py`).

LightGCN with a CLIP-feature residual on the item embeddings: the concat of
raw modality features is projected by one linear ``all_trs``
(`lightgcnclip.py:84-90`), optionally L2-branch-normalized and modality-
dropped, scaled by the item-degree gate ``1/(1+log1p(deg))``
(`lightgcnclip.py:93-99`) and a clamped learnable residual ``res_alpha``,
then added to the item id table before propagation
(`lightgcnclip.py:152-185`).  Optional alignment loss pulls the modality
branch toward the (stop-grad) id embeddings of batch items
(`lightgcnclip.py:226-254`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from recommendar_systems_tpu.graph.build import build_norm_adj
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.layers import (
    Dense,
    l2_normalize,
    lightgcn_propagate,
    xavier_uniform,
)
from recommendar_systems_tpu.models.losses import _wmean, bpr_loss, emb_loss


class LightGCNCLIP(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    feat_embed_dim: int = 64
    n_layers: int = 4
    reg_weight: float = 1e-2
    use_branch_norm: bool = True
    use_degree_gate: bool = True
    modal_drop_rate: float = 0.0
    res_alpha_init: float = 0.2
    res_alpha_min: float = 0.0
    mod_align_weight: float = 0.0
    mod_align_use_cosine: bool = True

    def setup(self):
        self.user_emb = self.param(
            "user_emb", xavier_uniform, (self.n_users, self.embedding_size)
        )
        self.item_emb = self.param(
            "item_emb", xavier_uniform, (self.n_items, self.embedding_size)
        )
        self.all_trs = Dense(self.feat_embed_dim, name="all_trs")
        # shape (1,) not (): a 0-d param in the scanned-epoch carry hits a
        # pathological path on the axon backend (~290 ms/step regardless of
        # model size; measured 20.6 s -> sub-second epochs with this change)
        self.res_alpha = self.param(
            "res_alpha",
            lambda k, s: jnp.full((1,), self.res_alpha_init, jnp.float32),
            (1,),
        )
        if self.modal_drop_rate > 0:
            self.mod_drop = nn.Dropout(rate=self.modal_drop_rate)

    def _mod_branch(self, ctx, train: bool):
        feat_cat = ctx["feat_cat"]
        mod = self.all_trs(feat_cat)
        if self.use_branch_norm:
            mod = l2_normalize(mod)
        if self.modal_drop_rate > 0:
            mod = self.mod_drop(mod, deterministic=not train)
        if self.use_degree_gate:
            mod = ctx["item_gate"][:, None] * mod
        return mod

    def propagate(self, ctx, train: bool):
        alpha = jnp.maximum(self.res_alpha, self.res_alpha_min)
        item = self.item_emb + alpha * self._mod_branch(ctx, train)
        ego = jnp.concatenate([self.user_emb, item], axis=0)
        all_emb = lightgcn_propagate(ctx["norm_adj"], ego, self.n_layers)
        return all_emb[: self.n_users], all_emb[self.n_users :]

    def loss(self, ctx, batch, train: bool = True):
        ue, ie = self.propagate(ctx, train)
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        u = ue[users]
        mf = bpr_loss(jnp.sum(u * ie[pos], 1), jnp.sum(u * ie[neg], 1), weight=w)
        reg = emb_loss(
            self.user_emb[users], self.item_emb[pos], self.item_emb[neg], weight=w
        )
        total = mf + self.reg_weight * reg
        align = 0.0
        if self.mod_align_weight > 0:
            alpha = jnp.maximum(self.res_alpha, self.res_alpha_min)
            mod_post = alpha * self._mod_branch(ctx, train=False)
            ids = jnp.concatenate([pos, neg])
            # the reference means over torch.unique(ids)
            # (`lightgcnclip.py:238-247`); jit needs static shapes, so weigh
            # each id by its first occurrence instead (same mean), dropping
            # zero-weight padding rows
            keep = jnp.ones(ids.shape[0], bool) if w is None else (
                jnp.concatenate([w, w]) > 0
            )
            eq = ids[:, None] == ids[None, :]
            eq = eq & keep[None, :]
            first = jnp.argmax(eq, axis=1) == jnp.arange(ids.shape[0])
            uniq = (first & keep).astype(jnp.float32)
            mod_sel = mod_post[ids]
            id_sel = jax.lax.stop_gradient(self.item_emb)[ids]
            if self.mod_align_use_cosine:
                per = 1.0 - jnp.sum(
                    l2_normalize(mod_sel) * l2_normalize(id_sel), -1
                )
            else:
                per = jnp.mean((mod_sel - id_sel) ** 2, axis=-1)
            align = jnp.sum(per * uniq) / jnp.maximum(jnp.sum(uniq), 1.0)
            total = total + self.mod_align_weight * align
        return total, {"mf_loss": mf, "reg_loss": reg, "align": align}

    def eval_embeddings(self, ctx):
        return self.propagate(ctx, train=False)

    def tb_diagnostics(self, ctx):
        """Modality-branch health stats (`lightgcnclip.py:266-300`)."""
        mod = self._mod_branch(ctx, train=False)
        alpha = jnp.maximum(self.res_alpha, self.res_alpha_min)
        id_norm = jnp.linalg.norm(self.item_emb, axis=1)
        post = alpha * mod
        return {
            "w/res_alpha": alpha,
            "norm/id": id_norm.mean(),
            "norm/mod_pre": jnp.linalg.norm(mod, axis=1).mean(),
            "norm/mod_post": jnp.linalg.norm(post, axis=1).mean(),
            "ratio/mod_vs_id": (
                jnp.linalg.norm(post, axis=1) / (id_norm + 1e-12)
            ).mean(),
            "cos/id_mod": jnp.sum(
                l2_normalize(self.item_emb) * l2_normalize(mod), -1
            ).mean(),
        }

    @classmethod
    def from_config(cls, config, data) -> "LightGCNCLIP":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            feat_embed_dim=int(config.get("feat_embed_dim") or config["embedding_size"]),
            n_layers=int(cfg_scalar(config, "n_layers", 4)),
            reg_weight=float(_s(config["reg_weight"])),
            use_branch_norm=bool(
                True if config.get("use_branch_norm") is None
                else config.get("use_branch_norm")
            ),
            use_degree_gate=bool(
                True if config.get("use_degree_gate") is None
                else config.get("use_degree_gate")
            ),
            modal_drop_rate=float(cfg_scalar(config, "modal_drop_rate", 0.0)),
            res_alpha_init=float(cfg_scalar(config, "res_alpha", 0.2)),
            res_alpha_min=float(cfg_scalar(config, "res_alpha_min", 0.0)),
            mod_align_weight=float(cfg_scalar(config, "mod_align_weight", 0.0)),
            mod_align_use_cosine=bool(
                True if config.get("mod_align_use_cosine") is None
                else config.get("mod_align_use_cosine")
            ),
        )

    @classmethod
    def build_ctx(cls, config, data):
        feats = []
        if data.v_feat is not None:
            feats.append(data.v_feat)
        if data.t_feat is not None:
            feats.append(data.t_feat)
        deg = np.bincount(data.train_items_np, minlength=data.n_items).astype(
            np.float32
        )
        gate = 1.0 / (1.0 + np.log1p(deg))  # `lightgcnclip.py:96-98`
        return {
            "norm_adj": build_norm_adj(
                data.train_users_np, data.train_items_np, data.n_users, data.n_items
            ),
            "feat_cat": jnp.concatenate(feats, axis=1),
            "item_gate": jnp.asarray(gate),
        }


MODEL = LightGCNCLIP
