"""MMGCN (reference `/root/reference/src/models/mmgcn.py`, ACM MM'19).

Per-modality 3-layer GCNs over the mean-aggregated bipartite graph with
user preference matrices and id-embedding injection at every layer
(`mmgcn.py:164-188`), averaged across modalities; joint softplus-style BPR
via the [[1], [-1]] weight trick (`mmgcn.py:79-97`).

Reference quirk preserved: ``id_embedding`` and the per-modality
``preference`` tensors are created as raw tensors that never reach the
optimizer (`mmgcn.py:55-56, 126-141` — ``.to(device)`` detaches them from
the parameter list), so they act as frozen random projections.  They are
kept frozen here (stored in ctx) for behavioral parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from recommendar_systems_tpu.graph.build import build_mean_adj
from recommendar_systems_tpu.graph.sparse import spmm
from recommendar_systems_tpu.models.base import RecModel
from recommendar_systems_tpu.models.layers import Dense, l2_normalize, xavier_normal
from recommendar_systems_tpu.models.losses import _wmean


def _pyg_uniform(fan_in):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _ModalGCN(nn.Module):
    """One modality tower (`mmgcn.py:108-188`): 3 hardcoded conv blocks."""

    n_users: int
    n_items: int
    dim_id: int
    dim_latent: int = 0  # 0 => operate in feature dim

    @nn.compact
    def __call__(self, adj, features, id_embedding, preference):
        if self.dim_latent:
            temp = Dense(self.dim_latent, name="MLP")(features)
            dim_in = self.dim_latent
        else:
            temp = features
            dim_in = features.shape[-1]
        x = l2_normalize(jnp.concatenate([preference, temp], axis=0))

        # block 1 convs in dim_in then maps to dim_id; blocks 2-3 in dim_id.
        # NOTE the reference sets ``self.concate = 'False'`` — a TRUTHY
        # string (`mmgcn.py:31`) — so its executed branch is the CONCAT one:
        # x = leaky(g(cat(h, x_hat))), not the g(h) + x_hat injection the
        # string was meant to select; reproduced for exact parity
        w1 = self.param("conv_w1", _pyg_uniform(dim_in), (dim_in, dim_in))
        h = nn.leaky_relu(spmm(adj, x @ w1), negative_slope=0.01)
        x_hat = nn.leaky_relu(
            Dense(self.dim_id, kernel_init=xavier_normal, name="linear1")(x),
            negative_slope=0.01,
        ) + id_embedding
        x = nn.leaky_relu(
            Dense(self.dim_id, kernel_init=xavier_normal, name="g1")(
                jnp.concatenate([h, x_hat], axis=1)
            ),
            negative_slope=0.01,
        )
        for idx in (2, 3):
            w = self.param(f"conv_w{idx}", _pyg_uniform(self.dim_id), (self.dim_id, self.dim_id))
            h = nn.leaky_relu(spmm(adj, x @ w), negative_slope=0.01)
            x_hat = nn.leaky_relu(
                Dense(self.dim_id, kernel_init=xavier_normal, name=f"linear{idx}")(x),
                negative_slope=0.01,
            ) + id_embedding
            x = nn.leaky_relu(
                Dense(self.dim_id, kernel_init=xavier_normal, name=f"g{idx}")(
                    jnp.concatenate([h, x_hat], axis=1)
                ),
                negative_slope=0.01,
            )
        return x


class MMGCN(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    reg_weight: float = 1e-5
    has_v: bool = True
    has_t: bool = True

    def setup(self):
        d = self.embedding_size
        if self.has_v:
            self.v_gcn = _ModalGCN(
                self.n_users, self.n_items, d, dim_latent=256, name="v_gcn"
            )
        if self.has_t:
            self.t_gcn = _ModalGCN(
                self.n_users, self.n_items, d, dim_latent=0, name="t_gcn"
            )

    def representation(self, ctx):
        rep = None
        n = 0
        if self.has_v:
            rep = self.v_gcn(
                ctx["adj"], ctx["v_feat"], ctx["id_embedding"], ctx["v_preference"]
            )
            n += 1
        if self.has_t:
            t = self.t_gcn(
                ctx["adj"], ctx["t_feat"], ctx["id_embedding"], ctx["t_preference"]
            )
            rep = t if rep is None else rep + t
            n += 1
        return rep / n

    def loss(self, ctx, batch, train: bool = True):
        out = self.representation(ctx)
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        u = out[users]
        pos_s = jnp.sum(u * out[pos + self.n_users], axis=1)
        neg_s = jnp.sum(u * out[neg + self.n_users], axis=1)
        mf = _wmean(-jnp.log(jax.nn.sigmoid(pos_s - neg_s)), w)
        # `mmgcn.py:92`: (id[user_rep2]^2 + id[item_interleave]^2).mean()
        # == mean_B(u^2) + (mean_B(p^2) + mean_B(n^2)) / 2
        ide = ctx["id_embedding"]

        def row_msq(e):
            return jnp.mean(e * e, axis=1)

        reg = _wmean(row_msq(ide[users]), w) + 0.5 * (
            _wmean(row_msq(ide[pos + self.n_users]), w)
            + _wmean(row_msq(ide[neg + self.n_users]), w)
        )
        if self.has_v:
            reg = reg + jnp.mean(ctx["v_preference"] ** 2)
        total = mf + self.reg_weight * reg
        return total, {"mf_loss": mf, "reg_loss": reg}

    def eval_embeddings(self, ctx):
        out = self.representation(ctx)
        return out[: self.n_users], out[self.n_users :]

    @classmethod
    def from_config(cls, config, data) -> "MMGCN":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            reg_weight=float(_s(config["reg_weight"])),
            has_v=data.v_feat is not None,
            has_t=data.t_feat is not None,
        )

    @classmethod
    def build_ctx(cls, config, data):
        rng = np.random.default_rng(int(_first(config.get("seed"), 999)))
        d = int(config["embedding_size"])

        def xavier(shape):
            std = np.sqrt(2.0 / sum(shape))
            return (rng.standard_normal(shape) * std).astype(np.float32)

        ctx = {
            "adj": build_mean_adj(
                data.train_users_np, data.train_items_np, data.n_users, data.n_items
            ),
            # frozen random tensors (reference quirk, see module docstring)
            "id_embedding": jnp.asarray(xavier((data.n_users + data.n_items, d))),
        }
        if data.v_feat is not None:
            ctx["v_feat"] = data.v_feat
            ctx["v_preference"] = jnp.asarray(xavier((data.n_users, 256)))
        if data.t_feat is not None:
            ctx["t_feat"] = data.t_feat
            ctx["t_preference"] = jnp.asarray(
                xavier((data.n_users, int(data.t_feat.shape[1])))
            )
        return ctx


def _first(value, default):
    if value is None:
        return default
    if isinstance(value, (list, tuple)):
        return value[0] if value else default
    return value


MODEL = MMGCN
