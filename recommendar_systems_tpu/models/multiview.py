"""Shared building blocks of the MGCN / SMORE model family.

Both models share the same skeleton (`mgcn.py:147-215`, `smore.py:254-360`):
a behavioral user-item LightGCN view ("content"), per-modality item-item
graph views lifted to users through the normalized R block, and gated
fusion into a "side" embedding added to the content.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from recommendar_systems_tpu.graph.sparse import spmm
from recommendar_systems_tpu.models.layers import Dense, lightgcn_propagate


class GateMLP(nn.Module):
    """Linear + sigmoid gate (`mgcn.py:85-99`, `smore.py:98-126`)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        return nn.sigmoid(Dense(self.dim)(x))


class QueryMLP(nn.Module):
    """Linear + tanh + bias-free linear (`mgcn.py:79-83`, `smore.py:87-97`)."""

    dim: int
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        h = jnp.tanh(Dense(self.dim)(x))
        return Dense(self.out_dim or self.dim, use_bias=False)(h)


def ui_content_view(adj, user_emb, item_emb, n_ui_layers: int) -> jnp.ndarray:
    """Behavioral view: K-layer LightGCN with layer mean over U+I nodes."""
    ego = jnp.concatenate([user_emb, item_emb], axis=0)
    return lightgcn_propagate(adj, ego, n_ui_layers)


def modality_view(mm_adj, R, item_embeds, n_layers: int) -> jnp.ndarray:
    """Item-item modality propagation + user lift through R
    (`smore.py:289-318`): returns concat([R @ items, items])."""
    h = item_embeds
    for _ in range(n_layers):
        h = spmm(mm_adj, h)
    user_side = spmm(R, h)
    return jnp.concatenate([user_side, h], axis=0)


def modality_views_batched(adjs, R, item_embeds_list, n_layers: int):
    """Several modality views sharing the same R: per-view item-item
    propagation (distinct graphs), then ONE batched user lift through R over
    the concatenated columns.  Columnwise-equivalent to per-view
    ``modality_view`` with a third of the R gather/scatter passes."""
    hs = []
    for adj, item_embeds in zip(adjs, item_embeds_list):
        h = item_embeds
        for _ in range(n_layers):
            h = spmm(adj, h)
        hs.append(h)
    d_sizes = [h.shape[1] for h in hs]
    user_all = spmm(R, jnp.concatenate(hs, axis=1))
    views = []
    off = 0
    for h, d in zip(hs, d_sizes):
        views.append(jnp.concatenate([user_all[:, off : off + d], h], axis=0))
        off += d
    return views
