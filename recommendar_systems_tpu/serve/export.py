"""Export a fitted model into a standalone serving artifact.

The artifact is one ``embeddings.npz`` + ``meta.json`` directory holding
everything a query server needs and nothing it doesn't: the final user/item
scoring state, the train-positive CSR for seen-item exclusion, and (when
requested) an int8-quantized item table for memory-bound catalogs.

Two export modes mirror the engine's two scoring contracts
(`models/base.py`):

- **embedding mode** (26/27 models): one full-graph propagation produces
  ``(user_emb, item_emb)`` with ``scores = ue[u] @ ie.T`` — identical to
  the ranking the trainer's evaluator used, so serving results match
  offline eval exactly.  25 models expose this via ``has_eval_embeddings``;
  SLMRec serves through ``serving_embeddings`` + a recorded rank-preserving
  ``score_transform`` (its sigmoid), re-applied to the k returned scores.
- **topk-table mode** (ItemKNNCBF's non-parametric R@S): the full catalog
  is scored once at export time through the model's own ``full_scores``
  and the seen-excluded top-K list per user is stored.  Serving then is a
  table lookup; ``fallback_topk`` bounds K.

The reference has no counterpart for any of this (its only persisted
inference artifact is the top-k CSV dump, `topk_evaluator.py:74-87`).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

ARTIFACT_FILE = "embeddings.npz"
META_FILE = "meta.json"
FORMAT_VERSION = 1


def quantize_item_table(item_emb: np.ndarray):
    """Symmetric per-item int8 quantization of the item table.

    The item table is the large side at catalog scale (I >> typical request
    batch); per-row symmetric scales keep ranking loss tiny (the per-user
    argmax over ``(ue @ q.T) * scale`` is invariant to everything but the
    rounding itself).  Returns (int8 table, f32 per-item scales).
    """
    absmax = np.abs(item_emb).max(axis=1, keepdims=True)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(item_emb / scale), -127, 127).astype(np.int8)
    return q, scale[:, 0]


def export_artifact(
    trainer,
    out_dir: str,
    quantize_int8: bool = False,
    fallback_topk: int = 200,
    keep_fp32: bool = False,
) -> str:
    """Snapshot ``trainer``'s fitted model into ``out_dir``.

    Call after ``fit()`` (or after ``load_checkpoint()``).  Uses the same
    jitted eval-embedding path the evaluator uses, so the exported scoring
    state is exactly what produced the reported metrics.
    """
    os.makedirs(out_dir, exist_ok=True)
    data = trainer.data
    model_cls = type(trainer.model)
    params, net_state = (
        trainer.best_state() if hasattr(trainer, "best_state")
        else (trainer.params, trainer.net_state)
    )

    arrays = {
        "pos_indptr": np.asarray(data.pos_indptr, dtype=np.int32),
        "pos_items": np.asarray(data.pos_items, dtype=np.int32),
    }
    meta = {
        "format_version": FORMAT_VERSION,
        "model": trainer.config.get("model", model_cls.__name__),
        "dataset": trainer.config.get("dataset", "unknown"),
        "n_users": int(data.n_users),
        "n_items": int(data.n_items),
        "max_pos_len": int(data.max_pos_len),
        "created_unix": time.time(),
        "quantized_int8": bool(quantize_int8),
    }

    emb_method = None
    if getattr(model_cls, "has_eval_embeddings", False):
        emb_method = "eval_embeddings"
    elif hasattr(model_cls, "serving_embeddings"):
        # rank-preserving transforms (e.g. SLMRec's sigmoid) serve from the
        # raw factors; the engine re-applies the transform to the k
        # returned scores only
        emb_method = "serving_embeddings"
        meta["score_transform"] = getattr(
            model_cls, "serving_score_transform", None
        )

    if emb_method is not None:
        def emb_fn(p, s, c):
            variables = {"params": p}
            if trainer.has_net_state:
                variables["state"] = s
            return trainer.model.apply(variables, c, method=emb_method)

        ue, ie = jax.jit(emb_fn)(params, net_state, trainer.ctx)
        ue = np.asarray(ue, dtype=np.float32)
        ie = np.asarray(ie, dtype=np.float32)
        arrays["user_emb"] = ue
        if quantize_int8:
            q, s = quantize_item_table(ie)
            arrays["item_q"] = q
            arrays["item_scale"] = s
            # the engine serves entirely from the quantized table (scoring,
            # fold-in and pairwise all gather+dequantize rows); keeping the
            # f32 table too would make the artifact's dominant array dead
            # weight (~5x the needed item bytes at catalog scale — advisor
            # round-4 finding). keep_fp32 opts back in for offline analysis.
            if keep_fp32:
                arrays["item_emb"] = ie
        else:
            arrays["item_emb"] = ie
        meta["mode"] = "embedding"
        meta["dim"] = int(ie.shape[1])
    else:
        meta["mode"] = "topk_table"
        k = min(int(fallback_topk), int(data.n_items))
        meta["fallback_topk"] = k
        arrays["topk_items"], arrays["topk_scores"] = _precompute_topk(
            trainer, data, k, params, net_state
        )

    np.savez_compressed(os.path.join(out_dir, ARTIFACT_FILE), **arrays)
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def _precompute_topk(trainer, data, k: int, params=None, net_state=None):
    """Seen-excluded top-K per user through the model's own ``full_scores``.

    Batched over users with a fixed batch width (one compile); the seen mask
    is applied with the same extended-column -1e10 scatter the evaluator
    uses (`train/trainer.py::_mask_and_topk`).
    """
    n_users, n_items = data.n_users, data.n_items
    indptr = np.asarray(data.pos_indptr)
    pos = np.asarray(data.pos_items)
    maxp = max(int(data.max_pos_len), 1)
    # padded per-user seen matrix (pad = n_items -> lands on the extra col)
    seen = np.full((n_users, maxp), n_items, dtype=np.int32)
    for u in range(n_users):
        row = pos[indptr[u]: indptr[u + 1]]
        seen[u, : len(row)] = row
    seen_j = jnp.asarray(seen)

    B = min(1024, n_users)

    def batch_topk(params, net_state, ctx, users):
        variables = {"params": params}
        if trainer.has_net_state:
            variables["state"] = net_state
        scores = trainer.model.apply(variables, ctx, users, method="full_scores")
        ext = jnp.concatenate(
            [scores, jnp.zeros((scores.shape[0], 1), scores.dtype)], axis=1
        )
        rows = seen_j[users]
        b = jnp.arange(scores.shape[0])[:, None]
        ext = ext.at[b, rows].set(-1e10)
        return jax.lax.top_k(ext[:, :-1], k)

    if params is None:
        params, net_state = trainer.params, trainer.net_state
    fn = jax.jit(batch_topk)
    items_out = np.zeros((n_users, k), dtype=np.int32)
    scores_out = np.zeros((n_users, k), dtype=np.float32)
    for start in range(0, n_users, B):
        ids = np.arange(start, min(start + B, n_users), dtype=np.int32)
        ids_pad = np.pad(ids, (0, B - len(ids)), constant_values=ids[-1])
        v, i = fn(params, net_state, trainer.ctx, jnp.asarray(ids_pad))
        items_out[ids] = np.asarray(i)[: len(ids)]
        scores_out[ids] = np.asarray(v)[: len(ids)]
    return items_out, scores_out
