"""MVGAE (reference `/root/reference/src/models/mvgae.py`, IEEE TMM'21).

Variational multimodal graph autoencoder: per-modality GCN encoders emit
(mu, logvar) (`mvgae.py:236-302`); two rounds of Product-of-Experts fusion
(v+t, then +collaborative — `mvgae.py:91-118, 303-318`); reparameterized
samples feed a BCE-style recon loss plus beta-weighted KL per modality
(`mvgae.py:121-172`).

Reference quirks preserved for parity: the encoder conv is mean-aggregated
with self-loops, L2-normalized, biased and dropout(0.1) (`mvgae.py:320-348`);
the per-modality ``preference`` tables and the collaborative item features
are frozen random tensors (never registered as parameters); the recon loss
indexes positive/negative items WITHOUT the user offset
(`mvgae.py:153-160`) and takes the max over in-batch negatives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from recommendar_systems_tpu.graph.build import build_rw_adj_selfloop
from recommendar_systems_tpu.graph.sparse import spmm
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.layers import (
    Dense,
    l2_normalize,
    torch_linear_bias,
    torch_linear_kernel,
    xavier_normal,
)
from recommendar_systems_tpu.models.losses import _wmean

MAX_LOGVAR = 10.0


def _pyg_uniform(fan_in):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _VGCN(nn.Module):
    """Encoder tower -> (mu, logvar) (`mvgae.py:236-302`)."""

    n_users: int
    dim_id: int
    dim_latent: int = 128
    n_layers: int = 2

    def _conv(self, adj, x, w, b, train):
        h = spmm(adj, x @ w) + b
        h = l2_normalize(h)
        drop = nn.Dropout(rate=0.1, deterministic=not train)
        return drop(h)

    @nn.compact
    def __call__(self, adj, features, preference, train: bool):
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.01)
        # reference Linears re-init only the WEIGHT (`mvgae.py:203-211`);
        # the torch-default bias U(+-1/sqrt(fan_in)) is kept — load-bearing
        # for convergence (see the SLMRec finding in PARITY.md)
        temp = Dense(self.dim_latent, kernel_init=xavier_normal,
                     bias_init=torch_linear_bias(int(features.shape[-1])),
                     name="MLP")(features)
        x = l2_normalize(jnp.concatenate([preference, temp], axis=0))

        # conv weights: the reference OVERRIDES BaseModel's PyG-uniform
        # reset with nn.init.xavier_normal_ (`mvgae.py:206,249`); only the
        # conv BIAS keeps the PyG uniform(in_channels) init.  Round-4
        # finding: initializing the weights PyG-uniform too (~2x smaller
        # std) halves the converged recall@20 on the settlement synthetic —
        # the same init-contract class of bug as SLMRec (PARITY.md).
        dims = [(self.dim_latent, self.dim_id), (self.dim_id, self.dim_id)]
        for li in range(min(self.n_layers, 2)):
            d_in, d_out = dims[li]
            w = self.param(f"conv_w{li+1}", xavier_normal, (d_in, d_out))
            b = self.param(f"conv_b{li+1}", _pyg_uniform(d_in), (d_out,))
            h = lrelu(self._conv(adj, x, w, b, train))
            # g_layer2's xavier line is COMMENTED OUT in the reference
            # (`mvgae.py:231`), so it keeps the torch-Linear default kernel
            g_kernel = xavier_normal if li == 0 else torch_linear_kernel
            g = Dense(self.dim_id, kernel_init=g_kernel,
                      bias_init=torch_linear_bias(self.dim_id),
                      name=f"g{li+1}")
            x = lrelu(g(h))

        w4 = self.param("conv_w4", xavier_normal, (self.dim_id, self.dim_id))
        b4 = self.param("conv_b4", _pyg_uniform(self.dim_id), (self.dim_id,))
        mu_h = lrelu(self._conv(adj, x, w4, b4, train))
        x_hat4 = lrelu(Dense(self.dim_id, kernel_init=xavier_normal, bias_init=torch_linear_bias(self.dim_id), name="linear4")(x))
        mu = Dense(self.dim_id, kernel_init=xavier_normal, bias_init=torch_linear_bias(self.dim_id), name="g4")(mu_h) + x_hat4

        w5 = self.param("conv_w5", xavier_normal, (self.dim_id, self.dim_id))
        b5 = self.param("conv_b5", _pyg_uniform(self.dim_id), (self.dim_id,))
        lv_h = lrelu(self._conv(adj, x, w5, b5, train))
        x_hat5 = lrelu(Dense(self.dim_id, kernel_init=xavier_normal, bias_init=torch_linear_bias(self.dim_id), name="linear5")(x))
        logvar = Dense(self.dim_id, kernel_init=xavier_normal, bias_init=torch_linear_bias(self.dim_id), name="g5")(lv_h) + x_hat5
        return mu, logvar


def product_of_experts(mus, logvars, eps=1e-8):
    """PoE fusion (`mvgae.py:303-318`)."""
    var = jnp.exp(jnp.stack(logvars)) + eps
    T = 1.0 / var
    mu_s = jnp.stack(mus)
    pd_mu = jnp.sum(mu_s * T, axis=0) / jnp.sum(T, axis=0)
    pd_var = 1.0 / jnp.sum(T, axis=0)
    return pd_mu, jnp.log(pd_var)


class MVGAE(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    n_layers: int = 2
    beta: float = 0.1
    sigmoid_result: bool = True  # 'amazon' branch (`mvgae.py:114-118`)

    def setup(self):
        self.v_gcn = _VGCN(self.n_users, self.embedding_size, 128, self.n_layers, name="v_gcn")
        self.t_gcn = _VGCN(self.n_users, self.embedding_size, 128, self.n_layers, name="t_gcn")
        self.c_gcn = _VGCN(self.n_users, self.embedding_size, 128, self.n_layers, name="c_gcn")
        # `full_sort_predict` reads `self.result_embed` — which is ONLY
        # ever (re)assigned inside forward(), i.e. during the last
        # TRAINING batch, with dropout/train-mode active (`mvgae.py:60,
        # 114-118, 176-181`); eval never recomputes it.  Round-4 finding:
        # this is LOAD-BEARING (clean eval-mode recompute converges to
        # recall@20 0.052 vs 0.108 with the reference semantics on the
        # settlement synthetic) — the model co-adapts to train-mode
        # embeddings.  Carried in the flax 'state' collection through the
        # scanned epoch like SMOREDiffX's EMA state.
        self.result_var = self.variable(
            "state", "result_embed",
            jnp.zeros, (self.n_users + self.n_items, self.embedding_size),
        )
        self.result_init = self.variable(
            "state", "result_init", lambda: jnp.zeros((1,), jnp.bool_)
        )

    def encode(self, ctx, train: bool):
        v_mu, v_lv = self.v_gcn(ctx["adj"], ctx["v_feat"], ctx["v_preference"], train)
        t_mu, t_lv = self.t_gcn(ctx["adj"], ctx["t_feat"], ctx["t_preference"], train)
        c_mu, c_lv = self.c_gcn(
            ctx["adj"], ctx["collaborative"], ctx["c_preference"], train
        )
        pd_mu, pd_lv = product_of_experts([v_mu, t_mu], [v_lv, t_lv])
        pd_mu, pd_lv = product_of_experts([pd_mu, c_mu], [pd_lv, c_lv])
        return pd_mu, pd_lv, (v_mu, v_lv), (t_mu, t_lv), (c_mu, c_lv)

    def _reparam(self, mu, logvar, train):
        logvar = jnp.minimum(logvar, MAX_LOGVAR)
        if not train:
            return mu
        eps = jax.random.normal(self.make_rng("sample"), logvar.shape)
        return mu + eps * 0.1 * jnp.exp(0.5 * logvar)

    def _recon(self, z, users, pos, neg, w):
        """`mvgae.py:121-136`: sum-form log2 BPR on sigmoided dot scores;
        item indices intentionally NOT offset (reference behavior)."""
        if self.sigmoid_result:
            z = jax.nn.sigmoid(z)
        pos_s = jax.nn.sigmoid(jnp.sum(z[users] * z[pos], axis=1))
        neg_vals = z[users] @ z[neg].T  # [B, B]
        neg_s = jax.nn.sigmoid(neg_vals.max(axis=1))
        per = -jnp.log2(jax.nn.sigmoid(pos_s - neg_s))
        if w is not None:
            per = per * w
        return per.sum()

    def _kl(self, mu, logvar):
        logvar = jnp.minimum(logvar, MAX_LOGVAR)
        return -0.5 * jnp.mean(
            jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar), axis=1)
        )

    def loss(self, ctx, batch, train: bool = True):
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        pd_mu, pd_lv, (v_mu, v_lv), (t_mu, t_lv), (c_mu, c_lv) = self.encode(ctx, train)
        if train and not self.is_initializing():
            # reference semantics: result_embed = sigmoid(pd_mu) of THIS
            # (train-mode) forward, read verbatim by eval (see setup)
            result = jax.nn.sigmoid(pd_mu) if self.sigmoid_result else pd_mu
            self.result_var.value = jax.lax.stop_gradient(result)
            self.result_init.value = jnp.ones((1,), jnp.bool_)
        z = self._reparam(pd_mu, pd_lv, train)
        z_v = self._reparam(v_mu, v_lv, train)
        z_t = self._reparam(t_mu, t_lv, train)
        z_c = self._reparam(c_mu, c_lv, train)
        loss_multi = self._recon(z, users, pos, neg, w) + self.beta * self._kl(pd_mu, pd_lv)
        loss_v = self._recon(z_v, users, pos, neg, w) + self.beta * self._kl(v_mu, v_lv)
        loss_t = self._recon(z_t, users, pos, neg, w) + self.beta * self._kl(t_mu, t_lv)
        loss_c = self._recon(z_c, users, pos, neg, w) + self.beta * self._kl(c_mu, c_lv)
        total = loss_multi + loss_v + loss_t + loss_c
        return total, {"recon": loss_multi, "modal": loss_v + loss_t + loss_c}

    def eval_embeddings(self, ctx):
        # stored train-forward embeddings (reference `full_sort_predict`,
        # see setup); clean eval-mode recompute only BEFORE any training
        # step (the reference's pre-training result_embed is raw random)
        pd_mu, *_ = self.encode(ctx, train=False)
        clean = jax.nn.sigmoid(pd_mu) if self.sigmoid_result else pd_mu
        result = jnp.where(self.result_init.value, self.result_var.value,
                           clean)
        return result[: self.n_users], result[self.n_users :]

    @classmethod
    def from_config(cls, config, data) -> "MVGAE":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            n_layers=int(cfg_scalar(config, "n_layers", 2)),
            beta=float(_s(config.get("beta")) if config.get("beta") is not None else 0.1),
        )

    @classmethod
    def build_ctx(cls, config, data):
        rng = np.random.default_rng(999)

        def xavier(shape):
            std = np.sqrt(2.0 / sum(shape))
            return (rng.standard_normal(shape) * std).astype(np.float32)

        d = int(config["embedding_size"])
        return {
            "adj": build_rw_adj_selfloop(
                data.train_users_np, data.train_items_np, data.n_users, data.n_items
            ),
            "v_feat": data.v_feat,
            "t_feat": data.t_feat,
            # frozen random tensors (reference quirk, module docstring)
            "collaborative": jnp.asarray(xavier((data.n_items, d))),
            "v_preference": jnp.asarray(xavier((data.n_users, 128))),
            "t_preference": jnp.asarray(xavier((data.n_users, 128))),
            "c_preference": jnp.asarray(xavier((data.n_users, 128))),
        }


MODEL = MVGAE
