"""ItemKNNCBF (reference `/root/reference/src/models/itemknncbf.py`).

Non-learned content-based kNN: item-item shrink-cosine similarity
``sim = (f_i . f_j) / (|f_i||f_j| + shrink)`` with row-wise top-k
(`itemknncbf.py:56-65`), scores ``R @ S`` precomputed at build time
(`itemknncbf.py:53-54`), ``req_training: False``.

The reference materializes the full n_items^2 similarity (with an unused
blocked variant sketched at `itemknncbf.py:67-101`); here the top-k is
computed blockwise on device and the score matrix is accumulated as
``R @ S`` via the sparse S in ELL form — never materializing n_items^2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from recommendar_systems_tpu.models.base import cfg_scalar, RecModel


class ItemKNNCBF(RecModel):
    n_users: int = 0
    n_items: int = 0

    def setup(self):
        # parity with the reference's dummy parameter (`itemknncbf.py:52`):
        # gives the optimizer/trainer a well-defined (constant) param tree
        self.dummy = self.param(
            "dummy", lambda k, s: jnp.full(s, 0.5, jnp.float32), (2,)
        )

    def loss(self, ctx, batch, train: bool = True):
        zero = 0.0 * jnp.sum(self.dummy)
        return zero, {"zero": zero}

    has_eval_embeddings = False

    def full_scores(self, ctx, users):
        return ctx["scores_matrix"][users]

    @classmethod
    def from_config(cls, config, data) -> "ItemKNNCBF":
        return cls(n_users=data.n_users, n_items=data.n_items)

    @classmethod
    def build_ctx(cls, config, data):
        knn_k = int(cfg_scalar(config, "knn_k", 10))
        shrink = float(config["shrink"] if config["shrink"] is not None else 0.0)
        feats = []
        if data.v_feat is not None:
            feats.append(data.v_feat)
        if data.t_feat is not None:
            feats.append(data.t_feat)
        f = jnp.concatenate(feats, axis=-1)
        n_items = data.n_items

        norms = jnp.linalg.norm(f, axis=-1, keepdims=True)  # [I, 1]

        @jax.jit
        def topk_block(fb, nb):
            sim = (fb @ f.T) / (nb * norms.T + shrink)
            val, idx = jax.lax.top_k(sim, knn_k)
            return idx.astype(jnp.int32), val

        # S in (idx, val) rows; scores = R @ S computed as scatter over S rows
        block = 2048
        idxs, vals = [], []
        for s in range(0, n_items, block):
            e = min(s + block, n_items)
            i, v = topk_block(f[s:e], norms[s:e])
            idxs.append(i)
            vals.append(v)
        S_idx = jnp.concatenate(idxs, 0)  # [I, k] columns of S per row
        S_val = jnp.concatenate(vals, 0)

        # scores[u, c] = sum_i R[u, i] * S[i, c]; with R binary train matrix:
        # for every train edge (u, i), add S_val[i, :] into scores[u, S_idx[i, :]]
        u_np = data.train_users_np.astype(np.int32)
        i_np = data.train_items_np.astype(np.int32)

        @jax.jit
        def build_scores():
            scores = jnp.zeros((data.n_users, n_items), jnp.float32)
            rows = jnp.repeat(jnp.asarray(u_np), knn_k)
            cols = S_idx[jnp.asarray(i_np)].reshape(-1)
            v = S_val[jnp.asarray(i_np)].reshape(-1)
            return scores.at[rows, cols].add(v)

        return {"scores_matrix": build_scores()}


MODEL = ItemKNNCBF
