"""Model contract for the TPU engine.

The reference contract (`/root/reference/src/common/abstract_recommender.py`)
is ``calculate_loss(interaction) -> scalar`` plus ``full_sort_predict ->
[B, n_items]`` with optional per-epoch hooks.  Here every model is a pure
flax module; all non-trainable state (normalized adjacencies, frozen modality
features, per-epoch dropout masks) lives in an explicit ``ctx`` pytree passed
to each method so the jitted trainer can thread, shard, and mutate it without
recompilation:

- ``loss(ctx, batch, train)`` -> ``(total_loss, parts_dict)``
- ``full_scores(ctx, users)`` -> ``[B, n_items]``
- ``build_ctx(config, data)``  (classmethod, host-side, one-time)
- ``pre_epoch(ctx, rng, config)`` (classmethod, jit-compatible): per-epoch
  graph mutation — the counterpart of ``pre_epoch_processing``
  (`abstract_recommender.py:13-17`), returning a ctx with the same pytree
  structure (static shapes; dropped edges become zero-valued).

``batch`` is a dict with ``users``, ``pos_items``, ``neg_items`` (absent for
no-negative-sampling models) and ``weight`` (1 for real rows, 0 for the
padding that replaces the reference's smaller final batch).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class RecModel(nn.Module):
    """Base class: subclasses are flax modules with static hyperparameters."""

    def loss(self, ctx: Dict[str, Any], batch: Dict[str, jnp.ndarray], train: bool = True):
        raise NotImplementedError

    def full_scores(self, ctx: Dict[str, Any], users: jnp.ndarray) -> jnp.ndarray:
        """[B, n_items] scores; default composes ``eval_embeddings``."""
        ue, ie = self.eval_embeddings(ctx)
        return ue[users] @ ie.T

    def eval_embeddings(self, ctx: Dict[str, Any]):
        """(user_emb, item_emb) such that scores = ue[users] @ ie.T.

        The trainer computes this ONCE per evaluation pass and reuses it for
        every user batch — the reference recomputes the full-graph forward
        per batch (`trainer.py:519-527`); ranking semantics are identical
        because eval-time propagation is deterministic.  Models whose
        scoring is not a plain dot product keep ``has_eval_embeddings =
        False`` and the trainer falls back to per-batch ``full_scores``.
        """
        raise NotImplementedError

    has_eval_embeddings: bool = True

    def predict(self, ctx: Dict[str, Any], users: jnp.ndarray, items: jnp.ndarray) -> jnp.ndarray:
        """Pairwise scores for (user, item) pairs — the reference's
        ``predict`` contract (`abstract_recommender.py:30-39`)."""
        ue, ie = self.eval_embeddings(ctx)
        return jnp.sum(ue[users] * ie[items], axis=-1)

    # -- host-side construction --------------------------------------------
    @classmethod
    def from_config(cls, config, data) -> "RecModel":
        raise NotImplementedError

    @classmethod
    def build_ctx(cls, config, data) -> Dict[str, Any]:
        """Build the non-trainable context (graphs, features). Host-side."""
        return {}

    # -- per-epoch hooks (jit-compatible, optional) ------------------------
    has_pre_epoch: bool = False

    @classmethod
    def pre_epoch(cls, ctx: Dict[str, Any], rng: jax.Array, config: Dict[str, Any]):
        return ctx


def concat_modal_features(data) -> jnp.ndarray:
    """Item raw features: concat(t, v) when both exist (reference
    `vbpr.py:33-39` concatenates text then vision)."""
    if data.v_feat is not None and data.t_feat is not None:
        return jnp.concatenate([data.t_feat, data.v_feat], axis=-1)
    if data.v_feat is not None:
        return data.v_feat
    if data.t_feat is not None:
        return data.t_feat
    raise ValueError("dataset has no modality features")


def cfg_scalar(config, key, default=None):
    """Scalarize a (possibly sweep-list) config value; fall back to
    ``default`` only when the key is absent/None — NOT when it is a
    legitimate falsy value like 0 or 0.0."""
    v = config.get(key) if hasattr(config, "get") else config[key]
    if isinstance(v, (list, tuple)):
        v = v[0] if v else None
    return default if v is None else v
