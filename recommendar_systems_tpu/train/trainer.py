"""The jitted trainer: scanned epochs, on-device sampling, MG, eval, early stop.

Replaces the reference trainer (`/root/reference/src/common/trainer.py`) with
a TPU-native design: one compiled ``train_epoch`` function runs the whole
epoch as a ``lax.scan`` over steps — permutation, batch slicing, negative
sampling, forward/backward, optimizer update and both Mirror-Gradient
flavors all happen on device with static shapes.  The host loop only handles
per-epoch learning-rate decay (`trainer.py:96-99`), NaN aborts
(`trainer.py:201-203`), periodic evaluation, early stopping
(`trainer.py:470-498`) and checkpointing.

Mirror-Gradient parity:
- trainer-level MG (`trainer.py:207-224`): every ``beta`` steps the update is
  (step on ``alpha1 * loss``) followed by (step on ``-alpha2 * loss`` of the
  same batch re-evaluated at the new parameters);
- model-driven adaptive MG (`trainer.py:268-348`): every ``mg_interval``
  steps after the normal update, re-grad at theta, compute
  ``alpha_eff = clip(max(mg_alpha, target_rel*param_rms/(lr*grad_rms)))``,
  step to the mirror point ``theta - alpha_eff*lr*g``, grad there, and apply
  ``-mg_beta`` times that gradient at theta.  Both are fused into the scanned
  step via ``lax.cond`` so no recompilation or host sync occurs.
"""

from __future__ import annotations

from recommendar_systems_tpu.models.base import cfg_scalar

import os
import time
from logging import getLogger
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from recommendar_systems_tpu.data.arrays import DataBundle, EvalBundle
from recommendar_systems_tpu.data.sampling import sample_negatives
from recommendar_systems_tpu.parallel.mesh import make_mesh, shard_params
from recommendar_systems_tpu.train.state import build_optimizer, lr_schedule
from recommendar_systems_tpu.utils.misc import dict2str, early_stopping
from recommendar_systems_tpu.utils.topk_evaluator import TopKEvaluator


def _tree_rms(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    sq = sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves)
    n = sum(l.size for l in leaves)
    return jnp.sqrt(sq / max(n, 1))


class Trainer:
    """Manages jitted training + evaluation for one model instance."""

    def __init__(self, config, model, ctx: Dict[str, Any], data: DataBundle, mg: bool = False):
        self.config = config
        self.model = model
        self.ctx = ctx
        self.data = data
        self.logger = getLogger()

        self.epochs = int(config["epochs"])
        self.eval_step = min(int(cfg_scalar(config, "eval_step", 1)), self.epochs)
        self.stopping_step = int(config["stopping_step"])
        self.valid_metric = str(config["valid_metric"]).lower()
        self.valid_metric_bigger = bool(config["valid_metric_bigger"])
        self.req_training = bool(config.get("req_training", True))
        self.batch_size = int(config["train_batch_size"])
        self.use_neg_sampling = bool(config.get("use_neg_sampling", True))
        self.use_full_sampling = bool(config.get("use_full_sampling", False))
        self.neg_tries = int(config.get("neg_sample_tries", 16))
        # exact-sampler binary-search depth: each iteration is a tiny
        # latency-bound gather on TPU, so size it to the actual max user
        # degree instead of the worst-case 32 (470us -> ~150us per step)
        deg_u = np.diff(np.asarray(data.pos_indptr))
        max_deg = int(deg_u.max()) if deg_u.size else 1
        self._neg_steps = max(1, int(np.ceil(np.log2(max_deg + 1))) + 1)
        self.use_neighborhood_loss = bool(config.get("use_neighborhood_loss", False))
        self._nbr = None
        if self.use_neighborhood_loss:
            # item-item neighborhoods through shared users (reference
            # dataloader.py:242-259): CSR of items co-interacted by any user
            # of this item, minus itself; rows covering >80% of the catalog
            # are invalid (dataloader.py:283-286)
            import scipy.sparse as sp

            R = sp.csr_matrix(
                (np.ones(len(data.train_users_np), np.float32),
                 (data.train_users_np, data.train_items_np)),
                shape=(data.n_users, data.n_items),
            )
            C = (R.T @ R).tocsr()
            C.setdiag(0)
            C.eliminate_zeros()
            deg = np.diff(C.indptr)
            self._nbr = {
                "indptr": jnp.asarray(C.indptr.astype(np.int32)),
                "indices": jnp.asarray(C.indices.astype(np.int32)),
                "invalid": jnp.asarray(deg / max(data.n_items, 1) > 0.8),
                "steps": max(1, int(np.ceil(np.log2(int(deg.max(initial=1))
                                                    + 1))) + 1),
            }
        self.max_k = max(config["topk"]) if isinstance(config["topk"], list) else int(config["topk"])

        # opt-in approx-MIPS offline eval: lax.approx_max_k over the RAW
        # scores + seen-membership postfilter on the candidate set — the
        # serving path's formulation (serve/engine.py, measured ~22x faster
        # than exact masked top-k at [256, 1M] in tools/probe_serving_1m.py)
        # applied to the trainer's evaluator. Default OFF: the exact path is
        # the reference-parity semantics (trainer.py:519-527).
        self.eval_approx = bool(config.get("eval_approx") or False)
        self.eval_approx_recall = float(
            cfg_scalar(config, "eval_approx_recall", 0.95))
        # candidate slack per user defaults to the max train degree (exact
        # exclusion guarantee: a user's seen items can displace at most
        # max_pos_len candidates). A smaller cap trades that guarantee for
        # speed on heavy-tailed catalogs: users with more than `slack` seen
        # candidates may see a few train positives re-surface.
        self.eval_approx_slack = config.get("eval_approx_slack")
        self._eval_seen_cache = None

        # mirror-gradient setup
        self.mg = bool(mg)
        self.model_mg = bool(config.get("mg_enable", False))
        self.alpha1 = float(cfg_scalar(config, "alpha1", 1.0))
        self.alpha2 = float(_first(config.get("alpha2"), 0.2))
        self.beta = int(_first(config.get("beta"), 3))
        self.mg_interval = int(cfg_scalar(config, "mg_interval", 3))
        self.mg_alpha = float(cfg_scalar(config, "mg_alpha", 0.5))
        self.mg_beta = float(cfg_scalar(config, "mg_beta", 0.2))
        self.mg_target_rel = float(cfg_scalar(config, "mg_target_rel_step", 1e-3))
        self.mg_alpha_max_scale = float(cfg_scalar(config, "mg_alpha_max_scale", 20.0))

        # mixed-precision SpMM (bandwidth-bound hot path); config knob.
        # Always set (possibly to None) — the flag is module-global and must
        # not leak across trainers.
        from recommendar_systems_tpu.graph.sparse import set_spmm_dtype

        set_spmm_dtype(
            jnp.bfloat16
            if str(config.get("compute_dtype") or "float32") == "bfloat16"
            else None
        )

        self.tx = build_optimizer(config)
        self.lr_fn = lr_schedule(config)
        self.evaluator = TopKEvaluator(config)

        # optional device mesh: DP over 'data', row-sharded tables over 'model'
        self.mesh = None
        if config.get("mesh_shape") or config.get("shard_embedding_tables"):
            axis_names = tuple(config.get("mesh_axis_names") or ("data", "model"))
            if bool(config.get("multihost")):
                # process-aware construction: 'model' axis kept intra-host
                # so table-lookup all-gathers ride ICI (parallel/multihost.py)
                from recommendar_systems_tpu.parallel.multihost import (
                    make_multihost_mesh,
                )

                self.mesh = make_multihost_mesh(
                    config.get("mesh_shape"), axis_names
                )
            else:
                self.mesh = make_mesh(config.get("mesh_shape"), axis_names)
        # kernel dispatchers consult the active mesh to shard_map their
        # Pallas calls (GSPMD cannot partition an opaque custom call)
        from recommendar_systems_tpu.parallel.mesh import set_active_mesh

        set_active_mesh(self.mesh)

        if self.use_full_sampling:
            self.n_samples = data.n_users
        else:
            self.n_samples = data.n_train
        self.n_steps = max(1, -(-self.n_samples // self.batch_size))

        self.params = None
        self.opt_state = None
        self.train_loss_dict: Dict[int, float] = {}
        self.best_valid_score = -1.0
        self.best_valid_result: Dict[str, float] = {}
        self.best_test_upon_valid: Dict[str, float] = {}
        # opt-in host-side snapshot of the best-valid parameters (serving
        # export); a HOST copy because the scanned-epoch jit donates the
        # device buffers (holding references to donated arrays is unsafe)
        self.keep_best_state = bool(config.get("keep_best_state") or False)
        self._best_params = None
        self._best_net_state = None

        # cap on scan steps per device dispatch (0 = whole epoch in one);
        # large-scale runs over the axon tunnel need dispatches under ~1 min
        self.steps_per_dispatch = int(config.get("steps_per_dispatch") or 0)
        self._warned_diag: Dict[str, bool] = {}
        self._train_epoch_jit = jax.jit(self._train_epoch_impl, donate_argnums=(0, 1))
        self._train_chunk_jit = jax.jit(
            self._scan_steps_impl, donate_argnums=(0, 1)
        )
        self._eval_batch_jit = jax.jit(self._eval_batch_impl)
        self._eval_embeddings_jit = jax.jit(self._eval_embeddings_impl)
        self._eval_from_emb_jit = jax.jit(self._eval_from_emb_impl)
        self._eval_scan_jit = jax.jit(self._eval_scan_impl)
        self._eval_scan_emb_jit = jax.jit(self._eval_scan_emb_impl)
        # embeddings + scanned score/mask/top-k in ONE dispatch: each
        # dispatch costs ~100-250 ms of host/tunnel latency vs ~22 ms of
        # device compute for a full eval pass (PARITY.md eval roofline)
        self._eval_cached_jit = jax.jit(self._eval_cached_impl)
        self._eval_cached_approx_jit = jax.jit(self._eval_cached_approx_impl)
        self._eval_scan_approx_jit = jax.jit(self._eval_scan_approx_impl)
        self._eval_cached_amask_jit = jax.jit(self._eval_cached_amask_impl)
        self._eval_scan_amask_jit = jax.jit(self._eval_scan_amask_impl)
        self._pre_epoch_jit = None
        if getattr(type(model), "has_pre_epoch", False):
            cfg_snapshot = dict(config.final_config) if hasattr(config, "final_config") else dict(config)
            cfg_snapshot["__n_users__"] = data.n_users
            cfg_snapshot["__n_items__"] = data.n_items
            cls = type(model)
            self._pre_epoch_jit = jax.jit(
                lambda ctx, rng: cls.pre_epoch(ctx, rng, cfg_snapshot)
            )

    # ------------------------------------------------------------------ init
    def init_state(self, seed: int) -> None:
        key = jax.random.key(seed)
        k_param, k_drop, self._epoch_key = jax.random.split(key, 3)
        dummy = self._dummy_batch()
        variables = self.model.init(
            {"params": k_param, "dropout": k_drop, "sample": k_drop, "noise": k_drop},
            self.ctx,
            dummy,
            True,
            method="loss",
        )
        self.params = variables["params"]
        self.net_state = dict(variables.get("state", {}))
        self.has_net_state = bool(self.net_state)
        if self.mesh is not None:
            from recommendar_systems_tpu.parallel.mesh import collect_table_dims

            data = self.data
            # padded fused-layout adjacency storage dims shard like the raw
            # node counts (zero pad rows/cols are inert under propagation)
            dims = collect_table_dims(
                self.ctx,
                [data.n_users, data.n_items, data.n_users + data.n_items],
            )
            shard_tables = bool(self.config.get("shard_embedding_tables", True))
            self.params = shard_params(
                self.params, self.mesh, table_dims=dims, shard_tables=shard_tables
            )
            # ctx adjacencies ride the same layout: dense graph blocks and
            # ELL neighbor lists whose leading dim is a node count are
            # row-sharded over 'model' so each chip propagates its rows
            self.ctx = shard_params(
                self.ctx, self.mesh, table_dims=dims, shard_tables=shard_tables
            )
        self.opt_state = self.tx.init(self.params)
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(self.params))
        self.logger.info(f"model initialized: {n_params} trainable parameters")

    def _dummy_batch(self) -> Dict[str, jnp.ndarray]:
        B = self.batch_size
        batch = {
            "users": jnp.zeros((B,), jnp.int32),
            "pos_items": jnp.zeros((B,), jnp.int32),
            "weight": jnp.ones((B,), jnp.float32),
            "edge_ids": jnp.zeros((B,), jnp.int32),
        }
        if self.use_full_sampling:
            batch.pop("pos_items")
            batch.pop("edge_ids")
        if self.use_neg_sampling and not self.use_full_sampling:
            batch["neg_items"] = jnp.zeros((B,), jnp.int32)
        if self._nbr is not None and not self.use_full_sampling:
            batch["pos_neighbors"] = jnp.zeros((B,), jnp.int32)
            batch["neg_neighbors"] = jnp.zeros((B,), jnp.int32)
        return batch

    def _data_arrays(self):
        """Training arrays passed as explicit jit args (closure-captured
        device arrays would be embedded as HLO constants, which the axon TPU
        backend cannot round-trip to host during lowering)."""
        d = self.data
        arrays = {
            "train_users": d.train_users,
            "train_items": d.train_items,
            "pos_indptr": d.pos_indptr,
            "pos_items": d.pos_items,
        }
        if self.mesh is not None and jax.process_count() > 1:
            # multi-process jit rejects host-local inputs: assemble GLOBAL
            # replicated arrays from the per-host copies (every host builds
            # the same DataBundle deterministically — docs/multihost.md)
            from jax.sharding import PartitionSpec as P

            from recommendar_systems_tpu.parallel.multihost import (
                put_process_local_batch,
            )

            arrays = {
                k: put_process_local_batch(np.asarray(v), self.mesh, P())
                for k, v in arrays.items()
            }
        return arrays

    # ------------------------------------------------------- jitted epoch fn
    def _apply_loss(self, params, net_state, ctx, batch, k_drop, train=True):
        """Run the model loss.  ``net_state`` is the flax 'state' collection
        (persistent non-trainable buffers, e.g. EMA graphs); it is threaded
        through the scan carry and updated via ``mutable`` when present."""
        variables = {"params": params}
        rngs = {"dropout": k_drop, "sample": k_drop, "noise": k_drop}
        if self.has_net_state:
            variables["state"] = net_state
            (total, parts), new_vars = self.model.apply(
                variables, ctx, batch, train, method="loss", rngs=rngs,
                mutable=["state"],
            )
            return total, parts, new_vars.get("state", net_state)
        total, parts = self.model.apply(
            variables, ctx, batch, train, method="loss", rngs=rngs
        )
        return total, parts, net_state

    def _one_update(self, params, opt_state, net_state, ctx, batch, k_drop, scale=1.0):
        def loss_fn(p):
            total, parts, new_state = self._apply_loss(p, net_state, ctx, batch, k_drop)
            return total * scale, (total, parts, new_state)

        grads, (total, parts, new_state) = jax.grad(loss_fn, has_aux=True)(params)
        new_state = jax.lax.stop_gradient(new_state)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_state, total, parts

    def _epoch_xs(self, k_perm):
        """Permutation batches + padding weights + step ids for one epoch."""
        B = self.batch_size
        n_steps = self.n_steps
        n = self.n_samples
        perm = jax.random.permutation(k_perm, n)
        pad = n_steps * B - n
        perm = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])
        weight_flat = jnp.concatenate(
            [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
        )
        return (perm.reshape(n_steps, B), weight_flat.reshape(n_steps, B),
                jnp.arange(n_steps))

    def _train_epoch_impl(self, params, opt_state, net_state, ctx, arrays, rng):
        k_perm, k_scan = jax.random.split(rng)
        xs = self._epoch_xs(k_perm)
        return self._scan_steps_impl(
            params, opt_state, net_state, ctx, arrays, xs, k_scan
        )

    def _scan_steps_impl(self, params, opt_state, net_state, ctx, arrays, xs,
                         rng):
        """Scan the training step over ``xs = (perm, weight, step_ids)`` —
        the whole epoch in the default path, or one chunk of it when
        ``steps_per_dispatch`` caps the single-dispatch length (the axon
        tunnel kills dispatches past ~1 min; see PARITY.md elec notes)."""
        data = self.data

        def step(carry, xs):
            params, opt_state, net_state = carry
            idx, w, step_id = xs
            # per-step keys derive from (epoch key, step_id) only, so chunked
            # (`steps_per_dispatch`) and monolithic epochs produce
            # bit-identical trajectories (see test_trainer_rng.py)
            k_step = jax.random.fold_in(rng, step_id)
            k_neg, k_drop, k_drop2, k_drop3, k_nbr = jax.random.split(k_step, 5)
            if self.use_full_sampling:
                # permutation runs over user ids directly
                users = idx.astype(jnp.int32)
                batch = {"users": users, "weight": w}
            else:
                users = arrays["train_users"][idx]
                pos = arrays["train_items"][idx]
                batch = {"users": users, "pos_items": pos, "weight": w,
                         "edge_ids": idx.astype(jnp.int32),
                         "step_id": step_id}
                if self.use_neg_sampling:
                    batch["neg_items"] = sample_negatives(
                        k_neg, users, data.n_items, arrays["pos_indptr"],
                        arrays["pos_items"], n_tries=self.neg_tries,
                        n_steps=self._neg_steps,
                    )
                if self._nbr is not None:
                    from recommendar_systems_tpu.data.sampling import sample_from_csr

                    k_nb, k_nn = jax.random.split(k_nbr)
                    batch["pos_neighbors"] = sample_from_csr(
                        k_nb, pos, self._nbr["indptr"], self._nbr["indices"],
                        self._nbr["invalid"],
                    )
                    batch["neg_neighbors"] = sample_negatives(
                        k_nn, pos, data.n_items, self._nbr["indptr"],
                        self._nbr["indices"], n_steps=self._nbr["steps"],
                    )
            if self.mesh is not None and self.mesh.shape.get("data", 1) > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                batch = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x,
                        NamedSharding(
                            self.mesh, P("data") if jnp.ndim(x) >= 1 else P()
                        ),
                    ),
                    batch,
                )

            lr = opt_state.hyperparams["learning_rate"]

            if self.mg and not self.model_mg:
                # trainer-level MG (reference trainer.py:207-224)
                def mg_branch(args):
                    params, opt_state, net_state = args
                    p1, o1, s1, total, parts = self._one_update(
                        params, opt_state, net_state, ctx, batch, k_drop,
                        scale=self.alpha1,
                    )
                    p2, o2, s2, _, _ = self._one_update(
                        p1, o1, s1, ctx, batch, k_drop2, scale=-self.alpha2
                    )
                    return p2, o2, s2, total, parts

                def normal_branch(args):
                    params, opt_state, net_state = args
                    return self._one_update(
                        params, opt_state, net_state, ctx, batch, k_drop
                    )

                params, opt_state, net_state, total, parts = jax.lax.cond(
                    step_id % self.beta == 0, mg_branch, normal_branch,
                    (params, opt_state, net_state),
                )
            else:
                params, opt_state, net_state, total, parts = self._one_update(
                    params, opt_state, net_state, ctx, batch, k_drop
                )

            if self.model_mg:
                # model-driven adaptive MG (reference trainer.py:268-348)
                def mirror(args):
                    params, opt_state = args
                    grads, _ = jax.grad(
                        lambda p: self._apply_loss(p, net_state, ctx, batch, k_drop2)[:2],
                        has_aux=True,
                    )(params)
                    grad_rms = _tree_rms(grads)
                    param_rms = _tree_rms(params) + 1e-12
                    alpha_eff = jnp.maximum(
                        self.mg_alpha,
                        self.mg_target_rel * param_rms / (lr * grad_rms + 1e-12),
                    )
                    alpha_eff = jnp.minimum(
                        alpha_eff, self.mg_alpha * self.mg_alpha_max_scale
                    )
                    mirror_params = jax.tree_util.tree_map(
                        lambda p, g: p - alpha_eff * lr * g, params, grads
                    )
                    m_grads, _ = jax.grad(
                        lambda p: self._apply_loss(p, net_state, ctx, batch, k_drop3)[:2],
                        has_aux=True,
                    )(mirror_params)
                    anti = jax.tree_util.tree_map(
                        lambda g: -self.mg_beta * g, m_grads
                    )
                    updates, opt_state = self.tx.update(anti, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return params, opt_state

                def no_mirror(args):
                    return args

                params, opt_state = jax.lax.cond(
                    (step_id + 1) % self.mg_interval == 0, mirror, no_mirror,
                    (params, opt_state),
                )

            return (params, opt_state, net_state), (total, parts)

        (params, opt_state, net_state_out), (totals, parts) = jax.lax.scan(
            step, (params, opt_state, net_state), xs,
        )
        return params, opt_state, net_state_out, totals, parts

    def _train_epoch_chunked(self, params, opt_state, net_state, ctx, arrays,
                             rng):
        """Host-driven epoch in ``steps_per_dispatch``-step dispatches.
        Dispatches queue asynchronously (no host sync between chunks), so
        throughput matches the single-dispatch path; only the per-dispatch
        runtime is bounded.  Per-step keys fold (epoch key, step_id), so the
        trajectory is bit-identical to the monolithic scanned epoch."""
        M = self.steps_per_dispatch
        k_perm, k_scan = jax.random.split(rng)
        perm, weight, step_ids = self._epoch_xs(k_perm)
        totals_l, parts_l = [], []
        for s0 in range(0, self.n_steps, M):
            sl = slice(s0, min(s0 + M, self.n_steps))
            params, opt_state, net_state, t, p = self._train_chunk_jit(
                params, opt_state, net_state, ctx, arrays,
                (perm[sl], weight[sl], step_ids[sl]), k_scan,
            )
            totals_l.append(t)
            parts_l.append(p)
        totals = jnp.concatenate(totals_l)
        parts = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs), *parts_l
        )
        return params, opt_state, net_state, totals, parts

    # ------------------------------------------------------------- jitted eval
    def _mask_and_topk(self, scores, mask_rows, mask_items, approx=False):
        """Masked seen-excluded top-k over the batch-local COO mask.
        ``approx=True`` swaps ONLY the ranking primitive for
        ``lax.approx_max_k`` (probe-backed: 2.4 ms vs 23.1 ms exact at
        [4096, 63k], tools/probe_topk_width.py) — the -1e10 scatter and
        therefore the exclusion semantics are identical to the exact
        reference path (trainer.py:519-527)."""
        if self.mesh is not None and self.mesh.shape.get("data", 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # shard eval users over 'data': each device scores its slice of
            # the batch against the (possibly row-sharded) catalog, and the
            # top-k below runs distributed
            scores = jax.lax.with_sharding_constraint(
                scores, NamedSharding(self.mesh, P("data", None))
            )
        if approx:
            # ranking happens in bf16 anyway — cast BEFORE the scatter so
            # the full-width mask pass moves half the bytes (it is
            # bandwidth-bound at catalog width)
            scores = scores.astype(jnp.bfloat16)
        # mask train positives with -1e10 (reference trainer.py:524) via
        # scatter-MIN: pad entries (item id == n_items) clamp to the last
        # column and scatter +inf, which min() makes a no-op — no extended
        # column, so the concat + trailing-slice full-width copies of the
        # ext-column formulation disappear (two ~0.5 GB passes per batch
        # at elec width). min(score, -1e10) == -1e10 for any real score
        # (identical to the reference's set).
        n_cols = scores.shape[1]
        pad = mask_items >= n_cols
        vals = jnp.where(pad, jnp.inf, -1e10).astype(scores.dtype)
        idx = jnp.minimum(mask_items, n_cols - 1)
        scores = scores.at[mask_rows, idx].min(vals)
        m = self.mesh.shape.get("model", 1) if self.mesh is not None else 1
        n_items = scores.shape[1]
        pad = (-n_items) % m
        if m > 1 and (n_items + pad) // m >= self.max_k:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from recommendar_systems_tpu.ops.topk import distributed_topk

            if pad:
                # real catalogs are rarely divisible by the mesh axis: pad
                # score columns with -inf so every shard is equal-width (the
                # padding can never enter the top-k; k <= items-per-shard)
                scores = jnp.pad(
                    scores, ((0, 0), (0, pad)),
                    constant_values=jnp.finfo(scores.dtype).min,
                )
            scores = jax.lax.with_sharding_constraint(
                scores, NamedSharding(self.mesh, P(None, "model"))
            )
            _, topk_idx = distributed_topk(
                scores, self.max_k, self.mesh, approx=approx,
                recall_target=self.eval_approx_recall,
            )
        elif approx:
            _, topk_idx = jax.lax.approx_max_k(
                scores, self.max_k, recall_target=self.eval_approx_recall)
        else:
            _, topk_idx = jax.lax.top_k(scores, self.max_k)
        return topk_idx

    def _eval_batch_impl(self, params, net_state, ctx, users, mask_rows, mask_items):
        variables = {"params": params}
        if self.has_net_state:
            variables["state"] = net_state
        scores = self.model.apply(variables, ctx, users, method="full_scores")
        return self._mask_and_topk(scores, mask_rows, mask_items)

    def _eval_embeddings_impl(self, params, net_state, ctx):
        variables = {"params": params}
        if self.has_net_state:
            variables["state"] = net_state
        return self.model.apply(variables, ctx, method="eval_embeddings")

    def _eval_from_emb_impl(self, ue, ie, users, mask_rows, mask_items):
        scores = ue[users] @ ie.T
        return self._mask_and_topk(scores, mask_rows, mask_items)

    # whole-pass scanned eval: ONE dispatch per evaluation instead of one
    # per user batch (each dispatch costs ~10 ms over the axon tunnel)
    def _eval_scan_impl(self, params, net_state, ctx, users, mask_rows, mask_items):
        def body(carry, xs):
            u, mr, mi = xs
            return carry, self._eval_batch_impl(params, net_state, ctx, u, mr, mi)

        _, topk = jax.lax.scan(body, 0, (users, mask_rows, mask_items))
        return topk

    def _eval_scan_emb_impl(self, ue, ie, users, mask_rows, mask_items):
        def body(carry, xs):
            u, mr, mi = xs
            return carry, self._mask_and_topk(ue[u] @ ie.T, mr, mi)

        _, topk = jax.lax.scan(body, 0, (users, mask_rows, mask_items))
        return topk

    def _eval_cached_impl(self, params, net_state, ctx, users, mask_rows,
                          mask_items):
        """Whole evaluation (propagation + every user batch) in ONE
        dispatch for has_eval_embeddings models — host/tunnel dispatch
        latency dominates the wall cost of an eval pass (PARITY.md)."""
        ue, ie = self._eval_embeddings_impl(params, net_state, ctx)
        return self._eval_scan_emb_impl(ue, ie, users, mask_rows, mask_items)

    # ------------------------------------------------------ approx-MIPS eval
    def _eval_seen(self) -> jnp.ndarray:
        """[n_users, maxp] padded train-positive matrix (pad = n_items) for
        the approx eval's membership postfilter; built once per trainer."""
        if self._eval_seen_cache is None:
            from recommendar_systems_tpu.serve.engine import _padded_seen

            seen = _padded_seen(
                np.asarray(self.data.pos_indptr),
                np.asarray(self.data.pos_items),
                self.data.n_users, self.data.n_items,
            )
            slack = self.eval_approx_slack
            if slack:
                seen = seen[:, : int(slack)]
            self._eval_seen_cache = jnp.asarray(seen)
        return self._eval_seen_cache

    def _heavy_tail_eval(self) -> bool:
        """True when the candidate-slack (postfilter) approx formulation
        would lose to the masked one: the postfilter's padded seen matrix
        is [n_users, maxp] (5.1 GB at elec shape, maxp=6600) and its
        membership test is O(B*(k+maxp)*maxp) — measured 5x SLOWER than
        exact at elec width, while mask-scatter + approx ranking is ~4x
        FASTER (tools/probe_eval_width.py, probe_topk_width.py)."""
        maxp = max(int(self.data.max_pos_len), 1)
        return self.max_k + maxp > max(256, self.data.n_items // 64)

    def _approx_topk(self, scores, users, seen):
        """Seen-excluded top-k WITHOUT the full-width mask scatter or the
        exact row-wide sort: ``approx_max_k(k + slack)`` over the raw bf16
        scores, then exclusion by membership on the tiny candidate set
        (a user's seen items displace at most ``slack`` candidates, so k
        real recommendations survive). Same ranking contract as the exact
        path (reference `/root/reference/src/common/trainer.py:519-527`) up
        to the approx recall; measured ~22x faster at [256, 1M] with
        maxp=32 (tools/probe_serving_1m.py). For heavy-tailed seen lists
        the masked formulation wins instead — see ``_heavy_tail_eval``."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        rows = seen[users]
        slack = rows.shape[1]
        kk = min(self.max_k + slack, scores.shape[1])
        mesh = self.mesh
        if mesh is not None and mesh.shape.get("data", 1) > 1:
            scores = jax.lax.with_sharding_constraint(
                scores, NamedSharding(mesh, P("data", None)))
        m = mesh.shape.get("model", 1) if mesh is not None else 1
        n_items = scores.shape[1]
        pad = (-n_items) % m
        if m > 1 and kk <= (n_items + pad) // m:
            from recommendar_systems_tpu.ops.topk import distributed_topk

            s = scores.astype(jnp.bfloat16)
            if pad:
                s = jnp.pad(s, ((0, 0), (0, pad)),
                            constant_values=jnp.finfo(s.dtype).min)
            s = jax.lax.with_sharding_constraint(
                s, NamedSharding(mesh, P(None, "model")))
            v, i = distributed_topk(s, kk, mesh, approx=True,
                                    recall_target=self.eval_approx_recall)
        else:
            v, i = jax.lax.approx_max_k(
                scores.astype(jnp.bfloat16), kk,
                recall_target=self.eval_approx_recall)
        v = v.astype(jnp.float32)
        hit = (i[:, :, None] == rows[:, None, :]).any(-1)
        v = jnp.where(hit, -1e10, v)
        _, pos = jax.lax.top_k(v, self.max_k)
        return jnp.take_along_axis(i, pos, axis=1)

    def _eval_cached_amask_impl(self, params, net_state, ctx, users,
                                mask_rows, mask_items):
        """Heavy-tail approx eval: identical to ``_eval_cached_impl`` —
        same compact batch-local COO mask, same scatter — with
        ``approx_max_k`` ranking only."""
        ue, ie = self._eval_embeddings_impl(params, net_state, ctx)

        def body(carry, xs):
            u, mr, mi = xs
            return carry, self._mask_and_topk(ue[u] @ ie.T, mr, mi,
                                              approx=True)

        _, topk = jax.lax.scan(body, 0, (users, mask_rows, mask_items))
        return topk

    def _eval_scan_amask_impl(self, params, net_state, ctx, users, mask_rows,
                              mask_items):
        def body(carry, xs):
            u, mr, mi = xs
            variables = {"params": params}
            if self.has_net_state:
                variables["state"] = net_state
            scores = self.model.apply(variables, ctx, u, method="full_scores")
            return carry, self._mask_and_topk(scores, mr, mi, approx=True)

        _, topk = jax.lax.scan(body, 0, (users, mask_rows, mask_items))
        return topk

    def _eval_cached_approx_impl(self, params, net_state, ctx, users, seen):
        ue, ie = self._eval_embeddings_impl(params, net_state, ctx)

        def body(carry, u):
            return carry, self._approx_topk(ue[u] @ ie.T, u, seen)

        _, topk = jax.lax.scan(body, 0, users)
        return topk

    def _eval_scan_approx_impl(self, params, net_state, ctx, users, seen):
        def body(carry, u):
            variables = {"params": params}
            if self.has_net_state:
                variables["state"] = net_state
            scores = self.model.apply(variables, ctx, u, method="full_scores")
            return carry, self._approx_topk(scores, u, seen)

        _, topk = jax.lax.scan(body, 0, users)
        return topk

    # ----------------------------------------------------------------- train
    def fit(
        self,
        valid_bundle: Optional[EvalBundle] = None,
        test_bundle: Optional[EvalBundle] = None,
        saved: bool = False,
        verbose: bool = True,
    ) -> Tuple[float, Dict[str, float], Dict[str, float]]:
        if self.params is None:
            self.init_state(int(_first(self.config.get("seed"), 999)))
        valid_bundle = valid_bundle or self.data.valid_eval
        test_bundle = test_bundle or self.data.test_eval

        # optional scalar logging (TB-equivalent, reference trainer.py:111-123)
        writer = None
        if self.config.get("tensorboard"):
            from recommendar_systems_tpu.train.diagnostics import ScalarWriter
            from recommendar_systems_tpu.utils.misc import get_local_time

            writer = ScalarWriter(
                self.config.get("tb_log_dir") or "./log/scalars",
                f"{self.config['model']}_{self.config['dataset']}_{get_local_time()}",
                tb_events=bool(self.config.get("tb_events")),
            )

        # full checkpoint/resume (new capability; reference never saves state)
        ckpt_mgr = None
        start_epoch = 0
        if self.config.get("save_full_checkpoints"):
            from recommendar_systems_tpu.train.checkpoint import CheckpointManager

            ckpt_mgr = CheckpointManager(
                os.path.join(
                    self.config.get("checkpoint_dir", "saved"),
                    f"{self.config['model']}-{self.config['dataset']}",
                ),
                max_to_keep=int(cfg_scalar(self.config, "checkpoints_to_keep", 3)),
            )
            if self.config.get("resume"):
                restored = ckpt_mgr.restore(
                    template={
                        "params": self.params,
                        "opt_state": self.opt_state,
                        "net_state": self.net_state,
                        "extra": {"epoch": 0, "best_valid_score": -1.0},
                    }
                )
                if restored is not None:
                    self.params = restored["params"]
                    self.opt_state = restored["opt_state"]
                    self.net_state = restored["net_state"]
                    start_epoch = int(restored["extra"]["epoch"]) + 1
                    self.best_valid_score = float(
                        restored["extra"]["best_valid_score"]
                    )
                    self.logger.info(f"resumed from checkpoint at epoch {start_epoch - 1}")

        # optional JAX profiler trace of one steady-state epoch (the
        # reference's only profiling surface is wall-clock epoch timing,
        # trainer.py:410,426-428; on TPU a real trace is the useful form)
        profile_epoch = self.config.get("profile_epoch")
        profile_epoch = None if profile_epoch in (None, "", False) else int(profile_epoch)
        profile_dir = str(self.config.get("profile_dir") or "./log/profile")

        cur_step = 0
        for epoch_idx in range(start_epoch, self.epochs):
            t0 = time.time()
            tracing = profile_epoch is not None and epoch_idx == profile_epoch
            if tracing:
                os.makedirs(profile_dir, exist_ok=True)
                jax.profiler.start_trace(profile_dir)
            if self.req_training:
                # per-epoch LR decay (reference trainer.py:96-99, applied per epoch)
                self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
                    self.lr_fn(epoch_idx), dtype=jnp.float32
                )
                if self._pre_epoch_jit is not None:
                    self._epoch_key, k_pre = jax.random.split(self._epoch_key)
                    self.ctx = self._pre_epoch_jit(self.ctx, k_pre)
                self._epoch_key, k_ep = jax.random.split(self._epoch_key)
                epoch_fn = (
                    self._train_epoch_chunked
                    if 0 < self.steps_per_dispatch < self.n_steps
                    else self._train_epoch_jit
                )
                (
                    self.params, self.opt_state, self.net_state, totals, parts
                ) = epoch_fn(
                    self.params, self.opt_state, self.net_state, self.ctx,
                    self._data_arrays(), k_ep
                )
                totals = np.asarray(totals)
                train_loss = float(totals.sum())
                if not np.isfinite(train_loss):
                    self.logger.info(
                        f"Loss is nan at epoch {epoch_idx}. Exiting."
                    )
                    break
            else:
                train_loss = 0.0
            if tracing:
                jax.profiler.stop_trace()
                self.logger.info(
                    f"profiler trace of epoch {epoch_idx} written to {profile_dir}"
                )
            self.train_loss_dict[epoch_idx] = train_loss
            if writer is not None and self.req_training:
                scalars = {"loss/total": train_loss,
                           "opt/lr": float(self.lr_fn(epoch_idx))}
                for k, v in parts.items():
                    scalars[f"loss/{k}"] = float(np.asarray(v).sum())
                from recommendar_systems_tpu.train.diagnostics import param_norms

                scalars.update(param_norms(self.params))
                try:
                    scalars.update(self.grad_group_norms())
                except Exception as e:
                    if not self._warned_diag.get("grad_norms"):
                        self._warned_diag["grad_norms"] = True
                        self.logger.warning(
                            f"grad_group_norms diagnostics failed: {e!r}"
                        )
                # model-provided diagnostics (reference trainer.py:459-467)
                for meth in ("tb_diagnostics", "diagnostics"):
                    if hasattr(self.model, meth):
                        try:
                            d = self.model.apply(
                                {"params": self.params, **(
                                    {"state": self.net_state} if self.has_net_state else {}
                                )},
                                self.ctx, method=meth,
                            )
                            for k, v in d.items():
                                scalars[f"model/{k}"] = float(np.asarray(v).reshape(-1)[0]) if np.asarray(v).ndim else float(v)
                        except Exception as e:
                            if not self._warned_diag.get(meth):
                                self._warned_diag[meth] = True
                                self.logger.warning(
                                    f"model {meth} diagnostics failed: {e!r}"
                                )
                        break
                writer.add_scalars(scalars, epoch_idx)
            # per-epoch rich diagnostics export (reference analysis workflow:
            # one .npz per epoch consumed by
            # analysis/plot_smore_diagnostics_over_epochs.py)
            diag_dir = self.config.get("diag_export_dir")
            if diag_dir and hasattr(self.model, "export_diagnostics"):
                os.makedirs(diag_dir, exist_ok=True)
                try:
                    d = self.model.apply(
                        {"params": self.params, **(
                            {"state": self.net_state} if self.has_net_state else {}
                        )},
                        self.ctx, method="export_diagnostics",
                    )
                    np.savez(
                        os.path.join(
                            diag_dir,
                            f"{self.config['model']}_epoch{epoch_idx}.npz",
                        ),
                        **{k: np.asarray(v) for k, v in d.items()},
                    )
                except Exception as e:
                    if not self._warned_diag.get("export"):
                        self._warned_diag["export"] = True
                        self.logger.warning(f"diagnostics export failed: {e!r}")
            t1 = time.time()
            if verbose:
                ips = self.n_samples / max(t1 - t0, 1e-9)
                self.logger.info(
                    f"epoch {epoch_idx} training [time: {t1 - t0:.2f}s, "
                    f"train loss: {train_loss:.4f}, examples/s: {ips:.0f}]"
                )

            if (epoch_idx + 1) % self.eval_step == 0:
                t2 = time.time()
                valid_result = self.evaluate(valid_bundle)
                valid_score = valid_result.get(self.valid_metric, 0.0)
                self.best_valid_score, cur_step, stop_flag, update_flag = early_stopping(
                    valid_score,
                    self.best_valid_score,
                    cur_step,
                    max_step=self.stopping_step,
                    bigger=self.valid_metric_bigger,
                )
                test_result = self.evaluate(test_bundle, is_test=True)
                if verbose:
                    self.logger.info(
                        f"epoch {epoch_idx} evaluating [time: {time.time() - t2:.2f}s, "
                        f"valid_score: {valid_score:.6f}]"
                    )
                    self.logger.info("valid result: \n" + dict2str(valid_result))
                    self.logger.info("test result: \n" + dict2str(test_result))
                if update_flag:
                    if verbose:
                        self.logger.info(
                            "## " + str(self.config["model"]) + "--Best validation results updated!!!"
                        )
                    self.best_valid_result = valid_result
                    self.best_test_upon_valid = test_result
                    if self.keep_best_state:
                        self._best_params = jax.device_get(self.params)
                        self._best_net_state = jax.device_get(self.net_state)
                    if saved:
                        self.save_checkpoint()
                if ckpt_mgr is not None and (epoch_idx + 1) % int(
                    cfg_scalar(self.config, "checkpoint_every", 1)
                ) == 0:
                    ckpt_mgr.save(
                        epoch_idx, self.params, self.opt_state, self.net_state,
                        extra={"epoch": epoch_idx,
                               "best_valid_score": float(self.best_valid_score)},
                    )
                if writer is not None:
                    writer.add_scalars(
                        {f"valid/{k}": v for k, v in valid_result.items()}, epoch_idx
                    )
                if stop_flag:
                    if verbose:
                        self.logger.info(
                            "+++++Finished training, best eval result in epoch %d"
                            % (epoch_idx - cur_step * self.eval_step)
                        )
                    break
                if not self.req_training:
                    break  # non-learned models need a single evaluation
        if writer is not None:
            writer.close()
        if ckpt_mgr is not None:
            ckpt_mgr.wait()
            ckpt_mgr.close()
        return self.best_valid_score, self.best_valid_result, self.best_test_upon_valid

    # ------------------------------------------------------------------ eval
    def _eval_pass_fn(self, bundle: EvalBundle):
        """Zero-arg callable running ONE jitted eval pass under the current
        ``eval_approx`` setting — the single dispatch point for
        ``evaluate()``, bench.py and the width probes. Approx mode picks
        the postfilter or masked formulation host-side (see
        ``_heavy_tail_eval``) so the heavy case never materializes the
        padded seen matrix at all."""
        use_cached = getattr(type(self.model), "has_eval_embeddings", False)
        if self.eval_approx:
            if self._heavy_tail_eval():
                fn = (self._eval_cached_amask_jit if use_cached
                      else self._eval_scan_amask_jit)
                return lambda: fn(
                    self.params, self.net_state, self.ctx,
                    bundle.users, bundle.mask_rows, bundle.mask_items)
            fn = (self._eval_cached_approx_jit if use_cached
                  else self._eval_scan_approx_jit)
            seen = self._eval_seen()
            return lambda: fn(self.params, self.net_state, self.ctx,
                              bundle.users, seen)
        fn = self._eval_cached_jit if use_cached else self._eval_scan_jit
        return lambda: fn(self.params, self.net_state, self.ctx,
                          bundle.users, bundle.mask_rows, bundle.mask_items)

    def evaluate(self, bundle: EvalBundle, is_test: bool = False, idx: int = 0) -> Dict[str, float]:
        # cached-embedding models run one full-graph propagation per pass,
        # reused by every user batch (the reference recomputes it per
        # batch), fused with the scanned score/mask/top-k into one dispatch
        topk = self._eval_pass_fn(bundle)()
        topk_np = np.asarray(topk)  # [n_batches, B, k]; one host sync
        topk_all = np.concatenate(
            [topk_np[b, : bundle.n_valid[b]] for b in range(bundle.n_batches)],
            axis=0,
        )
        eval_users = np.concatenate(
            [np.asarray(bundle.users[b])[: bundle.n_valid[b]] for b in range(bundle.n_batches)]
        )
        return self.evaluator.evaluate(
            topk_all, bundle.gt_list, bundle.gt_len,
            is_test=is_test, idx=idx, eval_users=eval_users,
        )

    def best_state(self):
        """(params, net_state) at the best-valid epoch when
        ``keep_best_state`` was on; otherwise the current state."""
        if self._best_params is not None:
            return self._best_params, self._best_net_state
        return self.params, self.net_state

    # ---------------------------------------------------------- checkpointing
    def checkpoint_path(self) -> str:
        ckpt_dir = self.config.get("checkpoint_dir", "saved")
        os.makedirs(ckpt_dir, exist_ok=True)
        return os.path.join(
            ckpt_dir, f"{self.config['model']}-{self.config['dataset']}-best.msgpack"
        )

    def plot_train_loss(self, show: bool = False, save_path: Optional[str] = None):
        """Plot per-epoch training loss (reference trainer.py:530-548)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        epochs = sorted(self.train_loss_dict)
        plt.figure()
        plt.plot(epochs, [self.train_loss_dict[e] for e in epochs])
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        if save_path:
            plt.savefig(save_path, dpi=110, bbox_inches="tight")
        if show:
            plt.show()
        plt.close()
        return save_path

    def grad_group_norms(self, batch=None):
        """Per-module-group gradient norms on one batch (the reference's TB
        grad diagnostics, trainer.py:228-234)."""
        from recommendar_systems_tpu.train.diagnostics import grad_group_norms

        if batch is None:
            B = min(self.batch_size, self.data.n_train)
            batch = {
                "users": self.data.train_users[:B],
                "pos_items": self.data.train_items[:B],
                "neg_items": self.data.train_items[:B],
                "weight": jnp.ones((B,), jnp.float32),
                "edge_ids": jnp.arange(B, dtype=jnp.int32),
            }
            if self.use_full_sampling:
                batch = {"users": self.data.train_users[:B],
                         "weight": jnp.ones((B,), jnp.float32)}
            elif not self.use_neg_sampling:
                batch.pop("neg_items")

        def loss_fn(p):
            return self._apply_loss(p, self.net_state, self.ctx, batch,
                                    jax.random.key(0))[0]

        grads = jax.grad(loss_fn)(self.params)
        return grad_group_norms(grads)

    def save_checkpoint(self) -> str:
        path = self.checkpoint_path()
        payload = {"params": self.params, "net_state": self.net_state}
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))
        return path

    def load_checkpoint(self, path: Optional[str] = None) -> None:
        path = path or self.checkpoint_path()
        template = {"params": self.params, "net_state": self.net_state}
        with open(path, "rb") as f:
            restored = serialization.from_bytes(template, f.read())
        self.params = restored["params"]
        self.net_state = restored["net_state"]


def _first(value, default):
    """Config values may be sweep lists; take the first element as scalar."""
    if value is None:
        return default
    if isinstance(value, (list, tuple)):
        return value[0] if value else default
    return value


def get_trainer():
    return Trainer
