"""Low-latency query engine over an exported serving artifact.

Design (TPU-first):

- **One dispatch per request batch.**  A query is `ue[users] @ ie.T` plus a
  seen-item scatter-mask and `lax.top_k` — the same masked extended-column
  formulation as the trainer's evaluator (`train/trainer.py::_mask_and_topk`,
  reference semantics `/root/reference/src/common/trainer.py:519-527`), fused
  by XLA into a single program.  Request batches are padded to a small set of
  power-of-two widths so every arrival shape hits a cached executable.
- **int8 item table** (optional, written by the exporter): the catalog-sized
  operand is stored int8 with per-item scales; XLA fuses the int8→bf16
  convert into the matmul's A-read stream exactly like the training path's
  int8 adjacency (PARITY.md hot-kernel section), so quantization saves 4× the
  HBM footprint AND bandwidth on the scoring matmul.
- **Cold-start fold-in**: a user unseen at training time is represented by
  the degree-normalized mean of their history's item embeddings — the
  1-hop user aggregation of the LightGCN family
  (`/root/reference/src/models/lightgcn.py:117-130`) applied at the final
  embedding; `topk_for_history` then serves them with their own history
  excluded.  An approximation (no model retrain), validated by overlap tests.
- **Sharded serving**: `shard_items(mesh)` lays the item table out over the
  mesh's 'model' axis and ranks with the two-stage distributed top-k
  (`ops/topk.py`), the same collective pattern as sharded offline eval —
  catalogs wider than one chip's HBM serve with O(shards·k) interchange.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recommendar_systems_tpu.serve.export import ARTIFACT_FILE, META_FILE

NEG = -1e10  # reference masking constant (trainer.py:524)


def _padded_seen(indptr: np.ndarray, items: np.ndarray, n_users: int,
                 n_items: int) -> np.ndarray:
    """Vectorized CSR -> [U, maxp] padded matrix (pad value = n_items)."""
    lens = (indptr[1:] - indptr[:-1]).astype(np.int64)
    maxp = max(int(lens.max()) if len(lens) else 0, 1)
    idx = indptr[:-1, None].astype(np.int64) + np.arange(maxp)[None, :]
    valid = np.arange(maxp)[None, :] < lens[:, None]
    safe = np.minimum(idx, max(len(items) - 1, 0))
    vals = items[safe] if len(items) else np.zeros_like(safe)
    return np.where(valid, vals, n_items).astype(np.int32)


def _pow2_bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class ServingEngine:
    """Serve top-k recommendations from an exported artifact."""

    def __init__(self, meta: Dict, arrays: Dict[str, np.ndarray]):
        self.meta = meta
        self.n_users = int(meta["n_users"])
        self.n_items = int(meta["n_items"])
        self.mode = meta.get("mode", "embedding")
        self._mesh = None
        self._fns: Dict = {}

        self.seen = _padded_seen(
            arrays["pos_indptr"], arrays["pos_items"],
            self.n_users, self.n_items,
        )
        self._seen_j = jnp.asarray(self.seen)

        if self.mode == "embedding":
            self.user_emb = jnp.asarray(arrays["user_emb"])
            if meta.get("quantized_int8") and "item_q" in arrays:
                self.item_q = jnp.asarray(arrays["item_q"])
                self.item_scale = jnp.asarray(arrays["item_scale"])
                self.item_emb = None
            else:
                self.item_emb = jnp.asarray(arrays["item_emb"])
                self.item_q = None
                self.item_scale = None
            self.dim = int(meta["dim"])
        else:  # topk_table
            self.topk_items = np.asarray(arrays["topk_items"])
            self.topk_scores = np.asarray(arrays["topk_scores"])
            self.user_emb = self.item_emb = None

    # ------------------------------------------------------------------ load
    @classmethod
    def load(cls, path: str) -> "ServingEngine":
        with open(os.path.join(path, META_FILE)) as f:
            meta = json.load(f)
        with np.load(os.path.join(path, ARTIFACT_FILE)) as z:
            arrays = {k: z[k] for k in z.files}
        return cls(meta, arrays)

    # ------------------------------------------------------------- internals
    def _item_scores(self, ue_rows: jnp.ndarray) -> jnp.ndarray:
        """[B, I] scores for a block of user embeddings."""
        if self.item_q is not None:
            # int8 catalog: XLA fuses the convert into the matmul A-read
            raw = ue_rows @ self.item_q.T.astype(jnp.bfloat16).astype(jnp.float32)
            return raw * self.item_scale[None, :]
        return ue_rows @ self.item_emb.T

    def _mask_topk(self, scores: jnp.ndarray, rows: jnp.ndarray, k: int):
        B = scores.shape[0]
        ext = jnp.concatenate([scores, jnp.zeros((B, 1), scores.dtype)], axis=1)
        b = jnp.arange(B)[:, None]
        ext = ext.at[b, rows].set(NEG)
        return jax.lax.top_k(ext[:, :-1], k)

    def _topk_fn(self, k: int, exclude: bool, B: int):
        key = ("topk", k, exclude, B, self._mesh is not None)
        if key not in self._fns:
            if self._mesh is not None:
                self._fns[key] = self._build_sharded_topk(k, exclude)
            else:
                def impl(users):
                    scores = self._item_scores(self.user_emb[users])
                    rows = (self._seen_j[users] if exclude
                            else jnp.full((users.shape[0], 1), self.n_items,
                                          dtype=jnp.int32))
                    return self._mask_topk(scores, rows, k)
                self._fns[key] = jax.jit(impl)
        return self._fns[key]

    # ---------------------------------------------------------------- public
    def topk(self, user_ids: Sequence[int], k: int = 20,
             exclude_seen: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        """(items [B,k] int32, scores [B,k] f32) for known user ids."""
        ids = np.asarray(user_ids, dtype=np.int32)
        if self.mode == "topk_table":
            kk = min(k, self.topk_items.shape[1])
            return self.topk_items[ids, :kk], self.topk_scores[ids, :kk]
        B = _pow2_bucket(len(ids))
        pad = np.pad(ids, (0, B - len(ids)), constant_values=ids[-1] if len(ids) else 0)
        v, i = self._topk_fn(k, exclude_seen, B)(jnp.asarray(pad))
        return np.asarray(i)[: len(ids)], np.asarray(v)[: len(ids)]

    def score(self, user_ids: Sequence[int], item_ids: Sequence[int]) -> np.ndarray:
        """Pairwise scores (the reference's ``predict`` contract)."""
        if self.mode != "embedding":
            raise NotImplementedError("pairwise scoring needs embedding mode")
        u = jnp.asarray(np.asarray(user_ids, dtype=np.int32))
        it = np.asarray(item_ids, dtype=np.int32)
        ie = (self.item_emb if self.item_emb is not None
              else self.item_q.astype(jnp.float32) * self.item_scale[:, None])
        return np.asarray(jnp.sum(self.user_emb[u] * ie[jnp.asarray(it)], axis=-1))

    # ------------------------------------------------------------- cold start
    def fold_in(self, histories: Sequence[Sequence[int]]) -> np.ndarray:
        """[B, d] embeddings for unseen users from their item histories."""
        if self.mode != "embedding":
            raise NotImplementedError("fold-in needs embedding mode")
        L = max(max((len(h) for h in histories), default=1), 1)
        hist = np.full((len(histories), L), self.n_items, dtype=np.int32)
        for r, h in enumerate(histories):
            hist[r, : len(h)] = np.asarray(h, dtype=np.int32)
        ie = (self.item_emb if self.item_emb is not None
              else self.item_q.astype(jnp.float32) * self.item_scale[:, None])
        ext = jnp.concatenate([ie, jnp.zeros((1, ie.shape[1]), ie.dtype)], axis=0)
        emb = ext[jnp.asarray(hist)]  # [B, L, d]; pads are zero rows
        cnt = jnp.asarray((hist < self.n_items).sum(axis=1, keepdims=True),
                          dtype=jnp.float32)
        return np.asarray(emb.sum(axis=1) / jnp.maximum(cnt, 1.0))

    def topk_for_history(self, histories: Sequence[Sequence[int]], k: int = 20
                         ) -> Tuple[np.ndarray, np.ndarray]:
        """Cold-start top-k: fold-in embedding, history excluded."""
        ue = jnp.asarray(self.fold_in(histories))
        L = max(max((len(h) for h in histories), default=1), 1)
        rows = np.full((len(histories), L), self.n_items, dtype=np.int32)
        for r, h in enumerate(histories):
            rows[r, : len(h)] = np.asarray(h, dtype=np.int32)

        def impl(ue_rows, rows_j):
            return self._mask_topk(self._item_scores(ue_rows), rows_j, k)

        v, i = jax.jit(impl)(ue, jnp.asarray(rows))
        return np.asarray(i), np.asarray(v)

    # ---------------------------------------------------------------- sharded
    def shard_items(self, mesh) -> None:
        """Lay the item table out over ``mesh``'s 'model' axis and rank via
        the two-stage distributed top-k — the serving counterpart of the
        sharded offline eval (SURVEY.md §2.3 'sharded full-catalog eval')."""
        if self.mode != "embedding":
            raise NotImplementedError("sharded serving needs embedding mode")
        self._mesh = mesh
        self._fns.clear()

    def _build_sharded_topk(self, k: int, exclude: bool):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from recommendar_systems_tpu.ops.topk import distributed_topk

        mesh = self._mesh
        m = mesh.shape.get("model", 1)

        def impl(users):
            scores = self._item_scores(self.user_emb[users])
            rows = (self._seen_j[users] if exclude
                    else jnp.full((users.shape[0], 1), self.n_items,
                                  dtype=jnp.int32))
            B = scores.shape[0]
            ext = jnp.concatenate([scores, jnp.zeros((B, 1), scores.dtype)],
                                  axis=1)
            b = jnp.arange(B)[:, None]
            ext = ext.at[b, rows].set(NEG)
            scores = ext[:, :-1]
            pad = (-self.n_items) % m
            if pad:
                scores = jnp.pad(scores, ((0, 0), (0, pad)),
                                 constant_values=jnp.finfo(scores.dtype).min)
            scores = jax.lax.with_sharding_constraint(
                scores, NamedSharding(mesh, P(None, "model")))
            return distributed_topk(scores, k, mesh)

        return jax.jit(impl)
