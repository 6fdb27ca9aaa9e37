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
        self.score_transform = meta.get("score_transform")
        self.approx_recall_target = float(meta.get("approx_recall_target", 0.95))
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
        ver = int(meta.get("format_version", 0))
        from recommendar_systems_tpu.serve.export import FORMAT_VERSION

        if ver > FORMAT_VERSION:
            raise ValueError(
                f"artifact at {path} has format_version {ver} but this "
                f"engine supports <= {FORMAT_VERSION}; upgrade the serving "
                "runtime or re-export"
            )
        with np.load(os.path.join(path, ARTIFACT_FILE)) as z:
            arrays = {k: z[k] for k in z.files}
        return cls(meta, arrays)

    # ------------------------------------------------------------- internals
    # NOTE: every jitted function below takes the embedding tables as
    # ARGUMENTS, never as closure constants — closure-captured device arrays
    # fail to lower on the axon backend and inline megabytes of table bytes
    # into the remote compile request (HTTP 413 at 1M-item catalogs); see
    # the same rule at Trainer._data_arrays (CLAUDE.md).
    def _item_operands(self):
        if self.item_q is not None:
            return (self.item_q, self.item_scale)
        return (self.item_emb,)

    @staticmethod
    def _scores(ue_rows: jnp.ndarray, *ops) -> jnp.ndarray:
        """[B, I] scores; ``ops`` is (item_emb,) or (item_q, item_scale)."""
        if len(ops) == 2:
            iq, iscale = ops
            # contract over d WITHOUT transposing the big operand so the
            # int8->bf16 convert fuses into the matmul A-read (the
            # .T.astype form materializes a converted copy: 22.5 ms vs
            # 1.8 ms measured at [1M, 64] — tools/probe_serving_1m.py)
            raw = jnp.einsum(
                "bd,id->bi", ue_rows.astype(jnp.bfloat16),
                iq.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return raw * iscale[None, :]
        return ue_rows @ ops[0].T

    @staticmethod
    def _mask_topk(scores: jnp.ndarray, rows: jnp.ndarray, k: int):
        # scatter-MIN masking: pad slots (item id == n_items) clamp to the
        # last column and scatter +inf, a no-op under min — avoids the
        # extended-column concat + trailing-slice full-width copies
        # (min(score, NEG) == NEG for any real score, identical to set)
        B, n_cols = scores.shape
        b = jnp.arange(B)[:, None]
        pad = rows >= n_cols
        vals = jnp.where(pad, jnp.inf, NEG).astype(scores.dtype)
        idx = jnp.minimum(rows, n_cols - 1)
        scores = scores.at[b, idx].min(vals)
        return jax.lax.top_k(scores, k)

    def _topk_fn(self, k: int, exclude: bool, B: int, approx: bool = False):
        key = ("topk", k, exclude, B, approx, self._mesh is not None,
               self.item_q is not None)
        if key not in self._fns:
            if self._mesh is not None:
                jfn = self._build_sharded_topk(k, exclude, approx)
            else:
                n_items = self.n_items
                mask_topk, scores_of = self._mask_topk, self._scores
                recall_target = self.approx_recall_target

                def impl(ue, seen, users, *ops):
                    s = scores_of(ue[users], *ops)
                    if approx:
                        # wide-catalog MIPS path (probe-backed,
                        # tools/probe_serving_1m.py at I=1M, B=256 on v5e:
                        # exact masked top-k 24.7 ms -> this form 1.1 ms).
                        # Two structural moves: (1) lax.approx_max_k over
                        # the RAW bf16 scores instead of exact lax.top_k
                        # (the 17 ms row-wide sort); (2) no full-width
                        # mask scatter (the 6.7 ms [B, I] pass) — take
                        # k+maxp candidates and exclude seen by membership
                        # on the tiny candidate set: a user's seen items
                        # can displace at most maxp candidates, so k real
                        # recommendations always survive (exact given the
                        # approx recall).
                        slack = seen.shape[1] if exclude else 0
                        kk = min(k + slack, s.shape[1])
                        v, i = jax.lax.approx_max_k(
                            s.astype(jnp.bfloat16), kk,
                            recall_target=recall_target)
                        v = v.astype(jnp.float32)
                        if exclude:
                            rows = seen[users]
                            hit = (i[:, :, None] == rows[:, None, :]).any(-1)
                            v = jnp.where(hit, NEG, v)
                        vv, pos = jax.lax.top_k(v, k)
                        ii = jnp.take_along_axis(i, pos, axis=1)
                        return vv, ii
                    rows = (seen[users] if exclude
                            else jnp.full((users.shape[0], 1), n_items,
                                          dtype=jnp.int32))
                    return mask_topk(s, rows, k)

                jfn = jax.jit(impl)
            self._fns[key] = jfn
        jfn = self._fns[key]
        ops = self._item_operands()
        return lambda users: jfn(self.user_emb, self._seen_j, users, *ops)

    def _topk_parts(self, k: int, exclude: bool, B: int, approx: bool = False):
        """(jitted_fn, array_args) for callers that re-trace the query under
        their own jit (e.g. the in-dispatch-repetition microbench) — the
        arrays must ride as arguments there too, not closure constants."""
        self._topk_fn(k, exclude, B, approx)  # populate cache
        key = ("topk", k, exclude, B, approx, self._mesh is not None,
               self.item_q is not None)
        # call as: jfn(ue, seen, users, *ops)
        return self._fns[key], (self.user_emb, self._seen_j), self._item_operands()

    # ---------------------------------------------------------------- public
    def topk(self, user_ids: Sequence[int], k: int = 20,
             exclude_seen: bool = True, approx: bool = False
             ) -> Tuple[np.ndarray, np.ndarray]:
        """(items [B,k] int32, scores [B,k] f32) for known user ids.

        ``approx=True`` ranks with ``lax.approx_max_k`` at
        ``approx_recall_target`` (default 0.95) — the bandwidth-bound path
        for catalogs in the 10^5–10^7 range where exact per-row top-k
        dominates the query cost.
        """
        ids = np.asarray(user_ids, dtype=np.int32)
        if self.mode == "topk_table":
            # the stored table is seen-excluded and exact by construction;
            # semantics the table cannot express fail loudly instead of
            # silently returning embedding-mode-divergent results
            if not exclude_seen:
                raise NotImplementedError(
                    "topk_table artifacts store seen-excluded lists only; "
                    "exclude_seen=False needs an embedding-mode export")
            if approx:
                raise NotImplementedError(
                    "approx ranking needs embedding mode (topk_table lookups "
                    "are already O(k))")
            stored = self.topk_items.shape[1]
            if k > stored:
                import warnings

                warnings.warn(
                    f"k={k} exceeds the stored fallback_topk={stored}; "
                    f"returning {stored} items per user", stacklevel=2)
            kk = min(k, stored)
            return self.topk_items[ids, :kk], self.topk_scores[ids, :kk]
        k = min(k, self.n_items)
        B = _pow2_bucket(len(ids))
        pad = np.pad(ids, (0, B - len(ids)), constant_values=ids[-1] if len(ids) else 0)
        v, i = self._topk_fn(k, exclude_seen, B, approx)(jnp.asarray(pad))
        return (np.asarray(i)[: len(ids)],
                self._transform(np.asarray(v)[: len(ids)]))

    def _transform(self, scores: np.ndarray) -> np.ndarray:
        """Re-apply the model's rank-preserving score transform (recorded
        at export, e.g. SLMRec's sigmoid) to the k returned scores."""
        if self.score_transform == "sigmoid":
            return 1.0 / (1.0 + np.exp(-scores))
        return scores

    @staticmethod
    def _gather_item_rows(idx: jnp.ndarray, *ops) -> jnp.ndarray:
        """Dequantized item rows for ``idx`` — gathers (and dequantizes)
        ONLY the touched rows, never the full table (~256 MB at 1M×64;
        advisor round-4 finding)."""
        if len(ops) == 2:
            iq, iscale = ops
            return iq[idx].astype(jnp.float32) * iscale[idx][..., None]
        return ops[0][idx]

    def score(self, user_ids: Sequence[int], item_ids: Sequence[int]) -> np.ndarray:
        """Pairwise scores (the reference's ``predict`` contract)."""
        if self.mode != "embedding":
            raise NotImplementedError("pairwise scoring needs embedding mode")
        u = jnp.asarray(np.asarray(user_ids, dtype=np.int32))
        it = jnp.asarray(np.asarray(item_ids, dtype=np.int32))
        ie_rows = self._gather_item_rows(it, *self._item_operands())
        return self._transform(
            np.asarray(jnp.sum(self.user_emb[u] * ie_rows, axis=-1))
        )

    # ------------------------------------------------------------- cold start
    def _hist_matrix(self, histories: Sequence[Sequence[int]],
                     pad_b: bool = False) -> np.ndarray:
        """[B, L] padded history matrix (pad value = n_items), with L (and
        optionally B) rounded up to pow2 buckets so arrival shapes reuse
        cached executables instead of retracing per request."""
        L = _pow2_bucket(max(max((len(h) for h in histories), default=1), 1),
                         lo=4)
        B = _pow2_bucket(len(histories)) if pad_b else max(len(histories), 1)
        hist = np.full((B, L), self.n_items, dtype=np.int32)
        for r, h in enumerate(histories):
            hist[r, : len(h)] = np.asarray(h, dtype=np.int32)
        return hist

    def fold_in(self, histories: Sequence[Sequence[int]]) -> np.ndarray:
        """[B, d] embeddings for unseen users from their item histories."""
        if self.mode != "embedding":
            raise NotImplementedError("fold-in needs embedding mode")
        hist = self._hist_matrix(histories)
        key = ("fold", hist.shape, self.item_q is not None)
        if key not in self._fns:
            n_items = self.n_items
            gather = self._gather_item_rows

            def impl(hist_j, *ops):
                valid = hist_j < n_items
                rows = gather(jnp.where(valid, hist_j, 0), *ops)
                rows = jnp.where(valid[..., None], rows, 0.0)
                cnt = valid.sum(axis=1, keepdims=True).astype(jnp.float32)
                return rows.sum(axis=1) / jnp.maximum(cnt, 1.0)

            self._fns[key] = jax.jit(impl)
        out = self._fns[key](jnp.asarray(hist), *self._item_operands())
        return np.asarray(out)[: len(histories)]

    def topk_for_history(self, histories: Sequence[Sequence[int]], k: int = 20
                         ) -> Tuple[np.ndarray, np.ndarray]:
        """Cold-start top-k: fold-in embedding, history excluded.

        ONE cached dispatch per (k, L, B) bucket — fold-in gather, scoring
        matmul, history mask and top-k fuse into a single executable, so a
        cold-start request costs the same as a warm ``topk`` instead of a
        fresh retrace per call (advisor round-4 medium finding)."""
        if self.mode != "embedding":
            raise NotImplementedError("cold-start serving needs embedding mode")
        hist = self._hist_matrix(histories, pad_b=True)
        key = ("hist_topk", k, hist.shape, self.item_q is not None)
        if key not in self._fns:
            n_items = self.n_items
            gather = self._gather_item_rows
            mask_topk, scores_of = self._mask_topk, self._scores

            def impl(hist_j, *ops):
                valid = hist_j < n_items
                rows = gather(jnp.where(valid, hist_j, 0), *ops)
                rows = jnp.where(valid[..., None], rows, 0.0)
                cnt = valid.sum(axis=1, keepdims=True).astype(jnp.float32)
                ue_rows = rows.sum(axis=1) / jnp.maximum(cnt, 1.0)
                return mask_topk(scores_of(ue_rows, *ops), hist_j, k)

            self._fns[key] = jax.jit(impl)
        v, i = self._fns[key](jnp.asarray(hist), *self._item_operands())
        n = len(histories)
        return (np.asarray(i)[:n],
                self._transform(np.asarray(v)[:n]))

    # ---------------------------------------------------------- online updates
    def add_interactions(self, user_id: int, item_ids: Sequence[int],
                         refresh_embedding: bool = True,
                         alpha: Optional[float] = None) -> None:
        """Online update for a known user: record new interactions (future
        ``topk`` excludes them) and optionally drift the user's embedding
        toward the new items — the serving-time analog of the fold-in, with
        blend weight ``alpha`` defaulting to n_new / (n_seen + n_new).
        A heuristic between retrains, not a substitute for one."""
        if self.mode != "embedding":
            raise NotImplementedError("online updates need embedding mode")
        u = int(user_id)
        new = np.unique(np.asarray(item_ids, dtype=np.int32))
        old = self.seen[u][self.seen[u] < self.n_items]
        merged = np.union1d(old, new)
        self._set_seen_row(u, merged)
        if refresh_embedding and len(new):
            if self.item_emb is not None:
                rows_e = np.asarray(self.item_emb[jnp.asarray(new)])
            else:  # dequantize only the touched rows, not the whole table
                rows_e = (np.asarray(self.item_q[jnp.asarray(new)],
                                     dtype=np.float32)
                          * np.asarray(self.item_scale)[new][:, None])
            drift = rows_e.mean(axis=0)
            a = (len(new) / (len(old) + len(new))) if alpha is None else alpha
            cur = np.asarray(self.user_emb[u])
            upd = (1.0 - a) * cur + a * drift
            self.user_emb = self.user_emb.at[u].set(jnp.asarray(upd))

    def add_user(self, history: Sequence[int]) -> int:
        """Register a NEW user from their history (fold-in embedding +
        seen set); returns the new user id.  Future ``topk([uid])`` serves
        them like any trained user."""
        if self.mode != "embedding":
            raise NotImplementedError("online updates need embedding mode")
        emb = jnp.asarray(self.fold_in([list(history)])[0])
        self.user_emb = jnp.concatenate([self.user_emb, emb[None, :]], axis=0)
        uid = self.n_users
        self.n_users += 1
        self.seen = np.concatenate(
            [self.seen, np.full((1, self.seen.shape[1]), self.n_items,
                                dtype=np.int32)], axis=0)
        self._seen_j = jnp.asarray(self.seen)
        self._set_seen_row(uid, np.unique(np.asarray(history, dtype=np.int32)))
        return uid

    def _set_seen_row(self, u: int, items: np.ndarray) -> None:
        """Write a user's seen list, widening the padded matrix if needed
        (jax.jit re-traces per shape, so widening is transparent).

        The no-widening path updates ONE row of the device copy in place
        (`.at[u].set`) instead of re-uploading the whole [U, maxp] matrix —
        a sustained-update stream at catalog scale would otherwise push
        ~U*maxp*4 bytes over the tunnel per interaction."""
        maxp = self.seen.shape[1]
        widen = len(items) > maxp
        if widen:
            wide = np.full((self.seen.shape[0], len(items)), self.n_items,
                           dtype=np.int32)
            wide[:, :maxp] = self.seen
            self.seen = wide
        self.seen[u, :] = self.n_items
        self.seen[u, : len(items)] = items
        if widen:
            self._seen_j = jnp.asarray(self.seen)
        else:
            self._seen_j = self._seen_j.at[u, :].set(
                jnp.asarray(self.seen[u]))

    # ---------------------------------------------------------------- sharded
    def shard_items(self, mesh) -> None:
        """Lay the item table out over ``mesh``'s 'model' axis and rank via
        the two-stage distributed top-k — the serving counterpart of the
        sharded offline eval (SURVEY.md §2.3 'sharded full-catalog eval').

        The item operands are ``device_put`` with an explicit row
        ``NamedSharding`` so a catalog wider than one chip's HBM is placed
        shard-by-shard at transfer time — placement is guaranteed, not
        inferred backward from the scores constraint (advisor round-4
        finding)."""
        if self.mode != "embedding":
            raise NotImplementedError("sharded serving needs embedding mode")
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._mesh = mesh
        self._fns.clear()
        rows = NamedSharding(mesh, P("model", None))
        if self.item_q is not None:
            self.item_q = jax.device_put(self.item_q, rows)
            self.item_scale = jax.device_put(
                self.item_scale, NamedSharding(mesh, P("model")))
        else:
            self.item_emb = jax.device_put(self.item_emb, rows)

    def _build_sharded_topk(self, k: int, exclude: bool, approx: bool = False):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from recommendar_systems_tpu.ops.topk import distributed_topk

        mesh = self._mesh
        m = mesh.shape.get("model", 1)
        n_items = self.n_items
        scores_of = self._scores
        recall_target = self.approx_recall_target
        shard_w = (n_items + ((-n_items) % m)) // m

        def impl(ue, seen, users, *ops):
            # shapes are static per trace: widening the seen matrix
            # re-traces and re-derives the candidate budget
            slack = seen.shape[1] if exclude else 0
            # per-shard candidate count must fit the shard width; degrade
            # to the exact masked formulation when it cannot
            use_approx = approx and (k + slack) <= shard_w
            scores = scores_of(ue[users], *ops)
            pad = (-n_items) % m
            if use_approx:
                # sharded MIPS: per-shard approx_max_k(k+maxp) over the RAW
                # scores, O(m*(k+maxp)) merge, then seen-exclusion by
                # membership on the merged candidate set (same postfilter
                # guarantee as the single-device approx path)
                s = scores.astype(jnp.bfloat16)
                if pad:
                    s = jnp.pad(s, ((0, 0), (0, pad)),
                                constant_values=jnp.finfo(s.dtype).min)
                s = jax.lax.with_sharding_constraint(
                    s, NamedSharding(mesh, P(None, "model")))
                v, i = distributed_topk(s, k + slack, mesh, approx=True,
                                        recall_target=recall_target)
                v = v.astype(jnp.float32)
                if exclude:
                    rows = seen[users]
                    hit = (i[:, :, None] == rows[:, None, :]).any(-1)
                    v = jnp.where(hit, NEG, v)
                vv, pos = jax.lax.top_k(v, k)
                return vv, jnp.take_along_axis(i, pos, axis=1)
            rows = (seen[users] if exclude
                    else jnp.full((users.shape[0], 1), n_items,
                                  dtype=jnp.int32))
            b = jnp.arange(scores.shape[0])[:, None]
            is_pad = rows >= n_items
            vals = jnp.where(is_pad, jnp.inf, NEG).astype(scores.dtype)
            scores = scores.at[b, jnp.minimum(rows, n_items - 1)].min(vals)
            if pad:
                scores = jnp.pad(scores, ((0, 0), (0, pad)),
                                 constant_values=jnp.finfo(scores.dtype).min)
            scores = jax.lax.with_sharding_constraint(
                scores, NamedSharding(mesh, P(None, "model")))
            return distributed_topk(scores, k, mesh)

        return jax.jit(impl)
