"""SMOREDiff (reference `/root/reference/src/models/smorediff.py`).

SMORE ('mul' injection, selectable spec_method like SMOREX) plus:
- **soft-R edge reweighting** (`smorediff.py:287-338`): per u-i edge
  confidence = cosine(user_emb, cond_item)/T on stop-gradient embeddings,
  z-scored per user (segment mean/var over the user's edges), tanh-compressed
  (optionally down-only), applied multiplicatively to R's values with a 0.05
  floor; the perturbed R replaces R in the user-side lift of every modality
  view;
- **edge-NCE loss** (`smorediff.py:180-231`): cross-entropy of the positive
  edge against K hard negatives (user-pool / positive-item-kNN / random
  fallback, precomputed per train edge on host) plus in-batch negatives.
"""

from __future__ import annotations

from recommendar_systems_tpu.models.base import cfg_scalar

import jax
import jax.numpy as jnp
import numpy as np

from recommendar_systems_tpu.graph.sparse import COO, coo_to_densemat, dense_ok, spmm
from recommendar_systems_tpu.models.layers import l2_normalize
from recommendar_systems_tpu.models.losses import batch_sq_reg, bpr_loss, infonce
from recommendar_systems_tpu.models.multiview import (
    modality_views_batched,
    ui_content_view,
)
from recommendar_systems_tpu.models.smorex import SMOREX


def _edge_user_pools(indptr, pos_sorted, knn_sorted, L0, cap, n_items):
    """Per-user hard-negative candidate pools (`smorediff.py:155-177`):
    stream each user's positives in CSR order, each positive contributing
    its top-L0 kNN neighbors (weight-desc), keep first occurrences that
    are not the user's own positives, and stop after the first positive
    whose processing brings the pool to ``cap``.

    Fully vectorized — the per-user Python loop this replaces is
    O(users * degree * L0) host time (~72M iterations at elec shape);
    this form is a handful of O(nnz * L0 * log) numpy passes.  Output is
    BIT-IDENTICAL to the loop (pinned by
    tests/test_smore_variants.py::test_edge_user_pools_vectorized_matches_loop).
    """
    n_users = len(indptr) - 1
    deg = np.diff(indptr)
    nnz = len(pos_sorted)
    # the stream truncates to the kNN width when it is narrower than L0
    # (the loop's `knn_sorted[ip, :L0]` slice semantics)
    L0 = min(int(L0), knn_sorted.shape[1] if knn_sorted.ndim == 2 else 0)
    if nnz == 0 or L0 == 0:
        return [[] for _ in range(n_users)]
    owner_pos = np.repeat(np.arange(n_users, dtype=np.int64), deg)
    cand = knn_sorted[pos_sorted, :L0].astype(np.int64)  # [nnz, L0]
    flat = cand.ravel()                                   # stream order
    owner = np.repeat(owner_pos, L0)
    local_pos = np.repeat(
        np.arange(nnz, dtype=np.int64) - indptr[:-1].astype(np.int64)[owner_pos],
        L0,
    )
    # (owner, item) keys; the per-user CSR is row-sorted with users
    # ascending, so the positive-set key array is already globally sorted
    M = int(n_items)
    keys = owner * M + flat
    pos_keys = owner_pos * M + pos_sorted.astype(np.int64)
    hit = np.searchsorted(pos_keys, keys)
    hit = np.minimum(hit, len(pos_keys) - 1)
    is_own_pos = pos_keys[hit] == keys
    # first occurrence of each (owner, item) in stream order
    uniq_keys, first_idx = np.unique(keys, return_index=True)
    keep = ~is_own_pos[first_idx]
    uniq_owner = uniq_keys[keep] // M
    uniq_item = uniq_keys[keep] % M
    uniq_first = first_idx[keep]
    uniq_p = local_pos[uniq_first]  # source local positive index
    # per-owner cumulative new-unique count per local positive -> the cap
    # cutoff p*[u]: first local positive whose cumulative count >= cap
    order = np.lexsort((uniq_p, uniq_owner))
    so, sp = uniq_owner[order], uniq_p[order]
    cum = np.arange(1, len(so) + 1, dtype=np.int64)
    starts = np.searchsorted(so, np.arange(n_users, dtype=np.int64))
    ends = np.searchsorted(so, np.arange(n_users, dtype=np.int64), side="right")
    cum = cum - np.repeat(starts, ends - starts)  # per-owner running count
    pstar = np.full(n_users, np.iinfo(np.int64).max, dtype=np.int64)
    reached = cum >= cap
    if reached.any():
        ri = np.flatnonzero(reached)
        # first reaching entry per owner
        ro = so[ri]
        first_r = ri[np.searchsorted(ro, np.unique(ro))]
        pstar[so[first_r]] = sp[first_r]
    keep2 = uniq_p <= pstar[uniq_owner]
    fo, fi, ff = uniq_owner[keep2], uniq_item[keep2], uniq_first[keep2]
    # pools in stream (first-occurrence) order per owner
    order2 = np.lexsort((ff, fo))
    fo, fi = fo[order2], fi[order2]
    starts = np.searchsorted(fo, np.arange(n_users, dtype=np.int64))
    ends = np.searchsorted(fo, np.arange(n_users, dtype=np.int64), side="right")
    return [fi[starts[u]: ends[u]].tolist() for u in range(n_users)]


class SMOREDiff(SMOREX):
    _diffusion_default = False  # build_ctx default when the key is unset

    use_diffusion_mvp: bool = False
    diff_beta: float = 0.5
    diff_temp: float = 0.6
    diff_gamma: float = 1.2
    diff_z_thres: float = 0.5
    diff_only_down: bool = True
    diff_stopgrad: bool = True
    use_edge_nce: bool = True
    edge_nce_k: int = 5
    edge_nce_temp: float = 0.6
    edge_nce_lambda: float = 0.2
    edge_inbatch_negs: bool = True
    edge_inbatch_ratio: int = 2
    # parity/verification knob: force f32 storage of the perturbed soft-R
    # block on TPU (config `softr_f32=true`), reproducing the CPU-pinned
    # per-edge math without code edits (the TPU default is bf16 storage,
    # which rounds the real-valued scales ~0.4% rel — see build_soft_r)
    softr_f32: bool = False

    def _schedule(self, ctx):
        """(diff_beta, only_down) — static here; SMOREDiffX schedules them."""
        return self.diff_beta, jnp.asarray(self.diff_only_down)

    def _soft_scale_dense(self, ctx, ui, cond_item: jnp.ndarray) -> jnp.ndarray:
        """Dense [Up, Ip] per-entry soft-R scale over the factored int8 count
        block — the same per-edge math as ``build_soft_r`` (cosine/T z-scored
        per user, tanh-compressed) but with the user statistics as masked ROW
        REDUCTIONS instead of three segment_sums + edge gathers over nnz
        (measured 5.4 ms/step of serialized VPU scatter at baby scale).  The
        cosine matrix rides the MXU at HIGHEST precision to keep the scale
        f32-faithful to the per-edge path."""
        import jax

        beta, only_down = self._schedule(ctx)
        u_vec, z_vec = self.user_embedding, cond_item
        if self.diff_stopgrad:
            u_vec = jax.lax.stop_gradient(u_vec)
            z_vec = jax.lax.stop_gradient(z_vec)
        up, ip = map(int, ui.mat.shape)
        u, i = ui.dims
        nu = l2_normalize(u_vec)
        nz = l2_normalize(z_vec)
        if up != u:
            nu = jnp.pad(nu, ((0, up - u), (0, 0)))
        if ip != i:
            nz = jnp.pad(nz, ((0, ip - i), (0, 0)))
        sim = jnp.clip(
            jax.lax.dot_general(
                nu, nz, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            ),
            -1.0, 1.0,
        )
        logits = sim / self.diff_temp
        # weight the per-user statistics by edge MULTIPLICITY (the int8
        # counts), not by unique items — identical to the per-edge
        # segment_sum path even if duplicate train pairs ever survive dedup
        # (counts are 0/1 today, where this equals a != 0 mask)
        mask = ui.mat.astype(jnp.float32)
        cnt = jnp.maximum(mask.sum(axis=1), 1.0)
        lm = logits * mask
        mu = lm.sum(axis=1) / cnt
        var = jnp.maximum((logits * lm).sum(axis=1) / cnt - mu * mu, 0.0)
        std = jnp.sqrt(var + 1e-6)
        z = (logits - mu[:, None]) / (std + 1e-6)[:, None]
        delta = jnp.tanh(self.diff_gamma * z)
        pos_mask = (z > self.diff_z_thres).astype(delta.dtype)
        delta_updown = jax.nn.relu(delta) * pos_mask + jnp.minimum(delta, 0.0)
        delta = jnp.where(only_down, jnp.minimum(delta, 0.0), delta_updown)
        return jnp.maximum(1.0 + beta * delta, 0.05)

    def _softr_dtype(self):
        """Storage dtype of dense soft-R blocks (perturbed block and, in
        SMOREDiffX, the dense EMA state): an explicit set_spmm_dtype wins;
        `softr_f32` or the CPU backend force f32; else bf16 on TPU (halves
        the HBM traffic of the dominant passes — the real-valued scales
        round ~0.4% rel, unlike the exact int8->bf16 0/1-count cast)."""
        import jax

        from recommendar_systems_tpu.graph.sparse import spmm_dtype

        return spmm_dtype() or (
            jnp.float32
            if (self.softr_f32 or jax.default_backend() == "cpu")
            else jnp.bfloat16
        )

    def build_soft_r(self, ctx, R: COO, cond_item: jnp.ndarray,
                     train: bool = True, ui=None):
        """Per-edge multiplicative perturbation of R (`smorediff.py:287-338`).

        With ``ui`` (a ``DenseUI`` aliasing the adjacency's factored int8
        count block) the scale is computed dense and the perturbed block is
        returned directly in ``DenseUI`` form — identical values for 0/1
        counts, no per-edge gathers, no scatter."""
        if ui is not None:
            from recommendar_systems_tpu.graph.sparse import DenseUI

            scale = self._soft_scale_dense(ctx, ui, cond_item)
            # storage dtype: see _softr_dtype (the per-edge-path 1e-4
            # parity pin holds on CPU f32; PARITY.md documents the TPU
            # bf16 default)
            tgt = self._softr_dtype()
            mat = (ui.mat.astype(jnp.float32) * scale).astype(tgt)
            return DenseUI(mat, ui.dims, ui.row_scale, ui.col_scale)
        beta, only_down = self._schedule(ctx)
        u_idx, i_idx = R.rows, R.cols
        u_vec = self.user_embedding[u_idx]
        z_vec = cond_item[i_idx]
        if self.diff_stopgrad:
            u_vec = jax.lax.stop_gradient(u_vec)
            z_vec = jax.lax.stop_gradient(z_vec)
        sim = jnp.clip(
            jnp.sum(l2_normalize(u_vec) * l2_normalize(z_vec), -1), -1.0, 1.0
        )
        logits = sim / self.diff_temp
        ones = jnp.ones_like(logits)
        sum_u = jax.ops.segment_sum(logits, u_idx, num_segments=self.n_users)
        cnt_u = jnp.maximum(
            jax.ops.segment_sum(ones, u_idx, num_segments=self.n_users), 1.0
        )
        mu = (sum_u / cnt_u)[u_idx]
        sum2_u = jax.ops.segment_sum(logits * logits, u_idx, num_segments=self.n_users)
        var_u = jnp.maximum(sum2_u / cnt_u - (sum_u / cnt_u) ** 2, 0.0)
        std = jnp.sqrt(var_u + 1e-6)[u_idx]
        z = (logits - mu) / (std + 1e-6)
        delta = jnp.tanh(self.diff_gamma * z)
        pos_mask = (z > self.diff_z_thres).astype(delta.dtype)
        delta_updown = jax.nn.relu(delta) * pos_mask + jnp.minimum(delta, 0.0)
        delta = jnp.where(only_down, jnp.minimum(delta, 0.0), delta_updown)
        scale = jnp.maximum(1.0 + beta * delta, 0.05)
        return R.with_values(R.vals * scale)

    def _dense_mask_view(self, ctx):
        """The norm_adj's factored int8 count block as a ``DenseUI`` (the
        soft-R dense fast path's mask + value source), or None when the
        adjacency isn't stored factored-dense (large catalogs)."""
        from recommendar_systems_tpu.graph.sparse import DenseUI, ui_view

        if not dense_ok(self.n_users, self.n_items):
            return None
        v = ui_view(ctx["norm_adj"])
        if isinstance(v, DenseUI) and v.mat.dtype == jnp.int8:
            return v
        return None

    def views(self, ctx, train: bool):
        image_feats = self.image_trs(ctx["v_feat"])
        text_feats = self.text_trs(ctx["t_feat"])
        image_conv, text_conv, fusion_conv = self.spectrum_convolution(
            image_feats, text_feats
        )
        iid = self.item_id_embedding
        image_item = iid * self.gate_v(image_conv)
        text_item = iid * self.gate_t(text_conv)
        fusion_item = iid * self.gate_f(fusion_conv)

        if self.use_diffusion_mvp:
            ui = self._dense_mask_view(ctx)
            R = self.build_soft_r(
                ctx, ctx["R"], self._denoise_cond(fusion_item), train, ui=ui
            )
            # any COO result (sparse fallback, or SMOREDiffX's exact
            # per-edge renorm/EMA) still propagates on the MXU by
            # scattering the nnz scalars into a dense block — bf16 on TPU
            # (the propagation matmul reads bf16 anyway; the (nnz,) EMA
            # state itself stays exact f32), f32 on CPU for the parity pins
            if isinstance(R, COO) and dense_ok(self.n_users, self.n_items):
                from recommendar_systems_tpu.graph.sparse import spmm_dtype

                tgt = spmm_dtype() or (
                    None if jax.default_backend() == "cpu" else jnp.bfloat16
                )
                R = coo_to_densemat(R, dtype=tgt)
        else:
            R = ctx["R"]

        content = ui_content_view(
            ctx["norm_adj"], self.user_embedding, iid, self.n_ui_layers
        )
        image_embeds, text_embeds, fusion_embeds = modality_views_batched(
            [ctx["image_adj"], ctx["text_adj"], ctx["fusion_adj"]],
            R,
            [image_item, text_item, fusion_item],
            self.n_layers,
        )

        agg_image = jax.nn.softmax(self.query_v(fusion_embeds), axis=-1) * image_embeds
        agg_text = jax.nn.softmax(self.query_t(fusion_embeds), axis=-1) * text_embeds
        det = not train
        image_prefer = self.prefer_dropout(
            self.gate_image_prefer(content), deterministic=det
        )
        text_prefer = self.prefer_dropout(
            self.gate_text_prefer(content), deterministic=det
        )
        fusion_prefer = self.prefer_dropout(
            self.gate_fusion_prefer(content), deterministic=det
        )
        side = (
            image_prefer * agg_image
            + text_prefer * agg_text
            + fusion_prefer * fusion_embeds
        ) / 3.0
        return content + side, side, content

    def _denoise_cond(self, cond_item):
        """Hook for SMOREDiffX's DSP denoiser; identity here."""
        return cond_item

    def _cond_item(self, ctx):
        image_feats = self.image_trs(ctx["v_feat"])
        text_feats = self.text_trs(ctx["t_feat"])
        _, _, fusion_conv = self.spectrum_convolution(image_feats, text_feats)
        return self.item_id_embedding * self.gate_f(fusion_conv)

    def edge_nce_loss(self, ctx, batch, cond_item):
        """CE of the positive edge vs hard + in-batch negatives
        (`smorediff.py:188-231`)."""
        users, pos = batch["users"], batch["pos_items"]
        w = batch.get("weight")
        hard = ctx["edge_hard_negs"][batch["edge_ids"]]  # [B, K]
        items = jnp.concatenate([pos[:, None], hard], axis=1)  # [B, 1+K]
        B = users.shape[0]
        if self.edge_inbatch_negs:
            extra = min(self.edge_inbatch_ratio * self.edge_nce_k, B - 1)
            perm = jax.random.permutation(self.make_rng("sample"), B)[:extra]
            ib = pos[perm]
            items = jnp.concatenate(
                [items, jnp.broadcast_to(ib[None, :], (B, extra))], axis=1
            )
        u = l2_normalize(jax.lax.stop_gradient(self.user_embedding)[users])
        z = l2_normalize(jax.lax.stop_gradient(cond_item))[items]
        logits = jnp.einsum("bd,bkd->bk", u, z) / self.edge_nce_temp
        logp = jax.nn.log_softmax(logits, axis=1)
        per = -logp[:, 0]
        if w is not None:
            return (per * w).sum() / jnp.maximum(w.sum(), 1.0)
        return per.mean()

    def loss(self, ctx, batch, train: bool = True):
        all_embeds, side, content = self.views(ctx, train)
        ue, ie = all_embeds[: self.n_users], all_embeds[self.n_users :]
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        u, pe, ne = ue[users], ie[pos], ie[neg]
        mf = bpr_loss(jnp.sum(u * pe, 1), jnp.sum(u * ne, 1), gamma=0.0, weight=w)
        reg = self.reg_weight * batch_sq_reg(
            u, pe, ne, batch_size=self.batch_size, weight=w
        )
        side_u, side_i = side[: self.n_users], side[self.n_users :]
        cont_u, cont_i = content[: self.n_users], content[self.n_users :]
        cl = infonce(side_i[pos], cont_i[pos], 0.2, weight=w) + infonce(
            side_u[users], cont_u[users], 0.2, weight=w
        )
        edge_nce = 0.0
        if self.use_edge_nce and "edge_hard_negs" in ctx:
            edge_nce = self.edge_nce_loss(ctx, batch, self._cond_item(ctx))
        total = mf + reg + self.cl_loss * cl + self.edge_nce_lambda * edge_nce
        return total, {
            "mf_loss": mf,
            "emb_loss": reg,
            "cl_loss": cl,
            "edge_nce": edge_nce,
        }

    @classmethod
    def config_kwargs(cls, config, data) -> dict:
        def _s(v):
            return v[0] if isinstance(v, list) else v

        kw = SMOREX.config_kwargs.__func__(cls, config, data)
        kw.update(
            # cfg_scalar unwraps sweep-lists exactly like build_ctx does, so
            # the model flag and ctx["R"]'s form can never disagree (a
            # list-valued [false] used to enable diffusion here while
            # build_ctx kept the DenseUI alias)
            use_diffusion_mvp=bool(
                cfg_scalar(config, "use_diffusion_mvp", cls._diffusion_default)
            ),
            diff_beta=float(cfg_scalar(config, "diff_beta", 0.5)),
            diff_temp=float(cfg_scalar(config, "diff_temp", 0.6)),
            diff_gamma=float(cfg_scalar(config, "diff_gamma", 1.2)),
            diff_z_thres=float(cfg_scalar(config, "diff_z_thres", 0.5)),
            diff_only_down=bool(
                True if config.get("diff_only_down") is None
                else _s(config.get("diff_only_down"))
            ),
            diff_stopgrad=bool(
                True if config.get("diff_stopgrad") is None
                else config.get("diff_stopgrad")
            ),
            use_edge_nce=bool(
                True if config.get("use_edge_nce") is None
                else config.get("use_edge_nce")
            ),
            edge_nce_k=int(cfg_scalar(config, "edge_nce_k", 5)),
            edge_nce_temp=float(cfg_scalar(config, "edge_nce_temp", 0.6)),
            edge_nce_lambda=float(
                0.2 if config.get("edge_nce_lambda") is None
                else config.get("edge_nce_lambda")
            ),
            edge_inbatch_negs=bool(
                True if config.get("edge_inbatch_negs") is None
                else config.get("edge_inbatch_negs")
            ),
            edge_inbatch_ratio=int(cfg_scalar(config, "edge_inbatch_ratio", 2)),
            softr_f32=bool(cfg_scalar(config, "softr_f32", False)),
        )
        return kw

    @classmethod
    def from_config(cls, config, data) -> "SMOREDiff":
        return cls(**cls.config_kwargs(config, data))

    @classmethod
    def build_ctx(cls, config, data):
        import os

        from recommendar_systems_tpu.graph.build import build_norm_ui
        from recommendar_systems_tpu.graph.knn import build_knn_ell
        from recommendar_systems_tpu.graph.sparse import ell_union_max
        from recommendar_systems_tpu.models.smore import SMORE as _S

        # Only R must stay COO, and only when soft-R is on (the rescaling
        # addresses its edge slots per step; the EMA/renorm state is sized
        # by nnz); the symmetric norm_adj and the kNN modality graphs carry
        # no per-edge state and ride the dense MXU path like every other
        # SMORE variant.  With diffusion off, R keeps SMORE's aliased dense
        # form too.
        ctx = _S.build_ctx(config, data)
        use_diff = bool(
            cfg_scalar(config, "use_diffusion_mvp", cls._diffusion_default)
        )
        if use_diff:
            ctx["R"] = build_norm_ui(
                data.train_users_np, data.train_items_np, data.n_users,
                data.n_items, dense=False,
            )
        if not (True if config.get("use_edge_nce") is None
                else bool(config.get("use_edge_nce"))):
            return ctx  # edge-NCE off: skip the hard-negative pool build
        # the hard-negative pools below need ELL neighbor LISTS; rebuild the
        # fusion union in forced-ELL form (the kNN disk cache stores ELL, so
        # this re-read is cheap) while ctx keeps the dense propagation form
        image_k = int(cfg_scalar(config, "image_knn_k", 20))
        text_k = int(cfg_scalar(config, "text_knn_k", 15))
        cache_dir = os.path.join(str(config["data_path"]), str(config["dataset"]))
        ell_fusion = ell_union_max(
            build_knn_ell(data.v_feat, image_k, cache_dir=cache_dir,
                          cache_key="image", dense=False),
            build_knn_ell(data.t_feat, text_k, cache_dir=cache_dir,
                          cache_key="text", dense=False),
        )
        # host-precomputed hard negatives per train edge (`smorediff.py:155-177,
        # 188-205`): user candidate pool = fusion-kNN neighbors of the user's
        # positives minus positives; fall back to the positive's own kNN then
        # random
        K = int(cfg_scalar(config, "edge_nce_k", 5))
        L0 = int(cfg_scalar(config, "edge_user_pool_L0", 50))
        knn = np.asarray(ell_fusion.idx)  # [I, 2k] neighbor ids sorted by col
        knn_val = np.asarray(ell_fusion.val)
        # order each row's neighbors by weight desc (reference sorts by weight)
        order = np.argsort(-knn_val, axis=1)
        knn_sorted = np.take_along_axis(knn, order, axis=1)

        rng = np.random.default_rng(0)
        u_np, i_np = data.train_users_np, data.train_items_np
        indptr = np.asarray(data.pos_indptr)
        pos_sorted = np.asarray(data.pos_items)
        pos_sets = [
            set(pos_sorted[indptr[u] : indptr[u + 1]].tolist())
            for u in range(data.n_users)
        ]
        pools = _edge_user_pools(indptr, pos_sorted, knn_sorted, L0, 4 * K,
                                 data.n_items)

        hard = np.zeros((len(u_np), K), dtype=np.int32)
        for e in range(len(u_np)):
            u, ip = int(u_np[e]), int(i_np[e])
            negs = pools[u][:K]
            if len(negs) < K:
                for j in knn_sorted[ip]:
                    j = int(j)
                    if j not in pos_sets[u] and j not in negs:
                        negs.append(j)
                        if len(negs) >= K:
                            break
            tries = 0
            while len(negs) < K and tries < 50 * K:
                tries += 1
                j = int(rng.integers(0, data.n_items))
                if j not in pos_sets[u] and j != ip and j not in negs:
                    negs.append(j)
            while len(negs) < K:
                # tiny catalogs can lack K valid negatives entirely
                # (user interacted with nearly every item): cycle items
                negs.append(int((ip + len(negs) + 1) % data.n_items))
            hard[e] = negs[:K]
        ctx["edge_hard_negs"] = jnp.asarray(hard)
        return ctx


MODEL = SMOREDiff
