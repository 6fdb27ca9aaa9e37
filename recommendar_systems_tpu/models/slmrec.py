"""SLMRec (reference `/root/reference/src/models/slmrec.py`).

LightGCN per feature channel (id / visual / textual item embeddings, shared
user table) over the 'pre' sym-normalized adjacency (`slmrec.py:73-118,
434-480`), concat (or mean) fusion with post-GCN linear heads
(`slmrec.py:362-367, 430-433`); main loss = in-batch InfoNCE between users
and their positive items (`slmrec.py:369-378`); SSL tasks:
- FAC: hierarchical projections g_i->iv, g_v->iv, ... with in-batch CE at
  each level (`slmrec.py:278-305`);
- FD: two dropout-perturbed propagations contrasted (`slmrec.py:120-190`);
- FM: two random modality-masked propagations contrasted
  (`slmrec.py:192-276`), optionally with dropout (FD+FM).
Scores are sigmoid(u . i) (`slmrec.py:307-315`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommendar_systems_tpu.graph.build import build_norm_adj
from recommendar_systems_tpu.graph.sparse import spmm
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.layers import (
    Dense,
    l2_normalize,
    lightgcn_propagate,
    torch_linear_bias,
    torch_linear_kernel,
    xavier_uniform,
)
from recommendar_systems_tpu.models.losses import _wmean


def in_batch_ce(view1, view2, temp, weight=None, normalize=False):
    """CrossEntropy with in-batch positives on the diagonal
    (`slmrec.py:369-378`); zero-weight padded columns are masked."""
    if normalize:
        view1 = l2_normalize(view1)
        view2 = l2_normalize(view2)
    logits = view1 @ view2.T / temp
    if weight is not None:
        logits = jnp.where(weight[None, :] > 0, logits, -jnp.inf)
    logp = jax.nn.log_softmax(logits, axis=1)
    per = -jnp.diag(logp)
    if weight is not None:
        # padded rows hit their own -inf-masked diagonal: zero them before
        # weighting or inf * 0 = NaN poisons the mean
        per = jnp.where(weight > 0, per, 0.0)
    return _wmean(per, weight)


class SLMRec(RecModel):
    n_users: int = 0
    n_items: int = 0
    latent_dim: int = 64
    n_layers: int = 3
    temp: float = 0.2
    ssl_temp: float = 0.1
    ssl_alpha: float = 0.01
    ssl_task: str = "FAC"
    dropout_rate: float = 0.3
    mm_fusion_mode: str = "concat"
    has_v: bool = True
    has_t: bool = True
    v_dim: int = 0  # raw feature widths (bias-init fan_ins)
    t_dim: int = 0

    def setup(self):
        d = self.latent_dim
        self.embedding_user = self.param(
            "embedding_user", xavier_uniform, (self.n_users, d)
        )
        self.embedding_item = self.param(
            "embedding_item", xavier_uniform, (self.n_items, d)
        )
        # Reference layer inits (`slmrec.py:394-433`): v/t_dense and the
        # after_GCN heads get xavier_uniform WEIGHTS but keep torch
        # Linear's DEFAULT bias U(+-1/sqrt(fan_in)); the g_* SSL heads are
        # plain nn.Linear (torch defaults for both).  The nonzero bias is
        # load-bearing: with zero bias the in-batch-InfoNCE training lands
        # in a batch-local basin (valid recall@20 0.044 vs 0.176 — the
        # cross-init bisection is documented in PARITY.md).
        if self.has_v:
            self.v_dense = Dense(
                d, name="v_dense", kernel_init=xavier_uniform,
                bias_init=torch_linear_bias(self.v_dim),
            )
        if self.has_t:
            self.t_dense = Dense(
                d, name="t_dense", kernel_init=xavier_uniform,
                bias_init=torch_linear_bias(self.t_dim),
            )
        n_channels = 1 + int(self.has_v) + int(self.has_t)
        fdim = d * n_channels if self.mm_fusion_mode == "concat" else d
        self.embedding_user_after_GCN = Dense(
            d, name="user_after_GCN", kernel_init=xavier_uniform,
            bias_init=torch_linear_bias(fdim),
        )
        self.embedding_item_after_GCN = Dense(
            d, name="item_after_GCN", kernel_init=xavier_uniform,
            bias_init=torch_linear_bias(fdim),
        )
        self.drop = nn.Dropout(rate=self.dropout_rate)
        if self.ssl_task == "FAC":
            def g(feats, fan_in, name):
                return Dense(
                    feats, name=name, kernel_init=torch_linear_kernel,
                    bias_init=torch_linear_bias(fan_in),
                )

            self.g_i_iv = g(d, d, "g_i_iv")
            self.g_v_iv = g(d, d, "g_v_iv")
            self.g_iv_iva = g(d, d, "g_iv_iva")
            self.g_iva_ivat = g(d // 2, d, "g_iva_ivat")
            self.g_t_ivat = g(d // 2, d, "g_t_ivat")

    def _mm_fusion(self, reps):
        if self.mm_fusion_mode == "concat":
            return jnp.concatenate(reps, axis=1)
        return jnp.mean(jnp.stack(reps), axis=0)

    def _channels(self, ctx):
        chans = {"i": self.embedding_item}
        if self.has_v:
            chans["v"] = self.v_dense(ctx["v_feat_n"])
        if self.has_t:
            chans["t"] = self.t_dense(ctx["t_feat_n"])
        return chans

    def compute(self, ctx):
        """Per-channel LightGCN + fusion heads (`slmrec.py:73-118`).

        All channels share the adjacency, so their propagations are batched
        into one wide SpMM over [N, C*d] (columnwise-equivalent)."""
        chans = self._channels(ctx)
        order = [k for k in ("i", "v", "t") if k in chans]
        d = self.latent_dim
        ego = jnp.concatenate(
            [jnp.concatenate([self.embedding_user, chans[k]], axis=0) for k in order],
            axis=1,
        )
        out_all = lightgcn_propagate(ctx["norm_adj"], ego, self.n_layers)
        embs = {}
        for ci, k in enumerate(order):
            out = out_all[:, ci * d : (ci + 1) * d]
            embs[k] = (out[: self.n_users], out[self.n_users :])
        user = self.embedding_user_after_GCN(
            self._mm_fusion([embs[k][0] for k in order])
        )
        item = self.embedding_item_after_GCN(
            self._mm_fusion([embs[k][1] for k in order])
        )
        return user, item, embs

    def _fac(self, embs, items, w):
        """`slmrec.py:278-305`."""
        i_emb_i = embs["i"][1][items]
        v_emb_i = embs["v"][1][items]
        x_i_iv = self.g_i_iv(i_emb_i)
        x_v_iv = self.g_v_iv(v_emb_i)
        loss = in_batch_ce(x_i_iv, x_v_iv, self.ssl_temp, w)
        if self.has_t:
            x_iv_iva = self.g_iv_iva(x_i_iv)
            x_iva_ivat = self.g_iva_ivat(x_iv_iva)
            x_t_ivat = self.g_t_ivat(embs["t"][1][items])
            loss = loss + in_batch_ce(x_iva_ivat, x_t_ivat, self.ssl_temp, w)
        return loss

    def _two_view_propagate(self, ctx, item_embs_1, item_embs_2, use_dropout, train):
        det = not train

        def one(e1, e2):
            l1, l2 = [e1], [e2]
            for _ in range(self.n_layers):
                e1 = spmm(ctx["norm_adj"], e1)
                e2 = spmm(ctx["norm_adj"], e2)
                if use_dropout:
                    e1 = self.drop(e1, deterministic=det)
                    e2 = self.drop(e2, deterministic=det)
                # views swap layers, as in the reference (`slmrec.py:142-143`)
                l2.append(e1)
                l1.append(e2)
            o1 = jnp.stack(l1, 1).mean(1)
            o2 = jnp.stack(l2, 1).mean(1)
            return o1, o2

        # batched over channels: one [N, C*d] propagation per view per layer
        d = self.latent_dim
        C = len(item_embs_1)
        e1 = jnp.concatenate(
            [jnp.concatenate([self.embedding_user, i1], axis=0) for i1 in item_embs_1],
            axis=1,
        )
        e2 = jnp.concatenate(
            [jnp.concatenate([self.embedding_user, i2], axis=0) for i2 in item_embs_2],
            axis=1,
        )
        o1_all, o2_all = one(e1, e2)
        return [
            (o1_all[:, c * d : (c + 1) * d], o2_all[:, c * d : (c + 1) * d])
            for c in range(C)
        ]

    def _fd_fm(self, ctx, users, items, w, train, mask: bool, use_dropout: bool):
        chans = self._channels(ctx)
        order = [k for k in ("i", "v", "t") if k in chans]
        embs_1 = [chans[k] for k in order]
        embs_2 = [chans[k] for k in order]
        if mask:
            # mask a different random channel in each view (`slmrec.py:196-203`)
            perm = jax.random.permutation(self.make_rng("sample"), len(order))
            for ci in range(len(order)):
                zero = jnp.zeros_like(embs_1[ci])
                embs_1[ci] = jnp.where(perm[0] == ci, zero, embs_1[ci])
                embs_2[ci] = jnp.where(perm[1] == ci, zero, embs_2[ci])
        outs = self._two_view_propagate(ctx, embs_1, embs_2, use_dropout, train)
        u1 = self.embedding_user_after_GCN(
            self._mm_fusion([o1[: self.n_users][users] for o1, _ in outs])
        )
        u2 = self.embedding_user_after_GCN(
            self._mm_fusion([o2[: self.n_users][users] for _, o2 in outs])
        )
        i1 = self.embedding_item_after_GCN(
            self._mm_fusion([o1[self.n_users :][items] for o1, _ in outs])
        )
        i2 = self.embedding_item_after_GCN(
            self._mm_fusion([o2[self.n_users :][items] for _, o2 in outs])
        )
        return in_batch_ce(u1, u2, self.ssl_temp, w, normalize=True) + in_batch_ce(
            i1, i2, self.ssl_temp, w, normalize=True
        )

    def loss(self, ctx, batch, train: bool = True):
        users, pos = batch["users"], batch["pos_items"]
        w = batch.get("weight")
        user, item, embs = self.compute(ctx)
        main = in_batch_ce(
            user[users], item[pos], self.temp, w, normalize=True
        )
        if self.ssl_task == "FAC":
            ssl = self._fac(embs, pos, w)
        elif self.ssl_task == "FD":
            ssl = self._fd_fm(ctx, users, pos, w, train, mask=False, use_dropout=True)
        elif self.ssl_task == "FM":
            ssl = self._fd_fm(ctx, users, pos, w, train, mask=True, use_dropout=False)
        else:  # FD+FM
            ssl = self._fd_fm(ctx, users, pos, w, train, mask=True, use_dropout=True)
        total = main + self.ssl_alpha * ssl
        return total, {"main_infonce": main, "ssl_loss": ssl}

    has_eval_embeddings = False  # sigmoid scoring (rank-preserving but kept
    # for score parity with `slmrec.py:307-315`)

    def full_scores(self, ctx, users):
        user, item, _ = self.compute(ctx)
        return jax.nn.sigmoid(user[users] @ item.T)

    # serving export: sigmoid is strictly monotone, so the raw dot-product
    # ranking is identical to full_scores; the engine re-applies the
    # transform to the k returned scores only (serve/export.py)
    serving_score_transform = "sigmoid"

    def serving_embeddings(self, ctx):
        user, item, _ = self.compute(ctx)
        return user, item

    @classmethod
    def from_config(cls, config, data) -> "SLMRec":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            latent_dim=int(config["recdim"] or config["embedding_size"]),
            n_layers=int(cfg_scalar(config, "layer_num", 3)),
            temp=float(cfg_scalar(config, "temp", 0.2)),
            ssl_temp=float(cfg_scalar(config, "ssl_temp", 0.1)),
            ssl_alpha=float(cfg_scalar(config, "ssl_alpha", 0.01)),
            ssl_task=str(config["ssl_task"] or "FAC"),
            dropout_rate=float(cfg_scalar(config, "dropout_rate", 0.3)),
            mm_fusion_mode=str(config["mm_fusion_mode"] or "concat"),
            has_v=data.v_feat is not None,
            has_t=data.t_feat is not None,
            v_dim=0 if data.v_feat is None else int(data.v_feat.shape[1]),
            t_dim=0 if data.t_feat is None else int(data.t_feat.shape[1]),
        )

    @classmethod
    def build_ctx(cls, config, data):
        ctx = {
            # adj_type 'pre' == sym-normalized bipartite adjacency
            "norm_adj": build_norm_adj(
                data.train_users_np, data.train_items_np, data.n_users, data.n_items
            )
        }
        from recommendar_systems_tpu.models.layers import l2_normalize as _n

        if data.v_feat is not None:
            ctx["v_feat_n"] = _n(data.v_feat)
        if data.t_feat is not None:
            ctx["t_feat_n"] = _n(data.t_feat)
        return ctx


MODEL = SLMRec
