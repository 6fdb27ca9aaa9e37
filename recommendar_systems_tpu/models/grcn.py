"""GRCN (reference `/root/reference/src/models/grcn.py`, ACM MM'20).

Content GCNs with dot-product attention routing (`grcn.py:46-76, 112-166`)
produce per-edge confidence weights; the id-graph ``EGCN`` then runs a
weighted SAGE propagation with ReLU-pruned weights (`grcn.py:80-109,
265-285`); fusion = concat(id_rep, content_reps) (`grcn.py:289-296`).
Weight mode 'confid': per-edge content attention scaled by a learned
node-specific confidence, max over modalities (`grcn.py:271-279`).

TPU mapping: GAT attention = dot scores + segment-softmax over destination
nodes; SAGE = scatter of weighted source embeddings; the routing iterations
update the user preference table from item content over the reversed edges
(items -> users), the published GRCN routing semantics.

Dense fast path: when the [U, I] block fits the densify threshold the
attention becomes a masked softmax over the dense score matrix
``Xdst @ Xsrc^T`` and every propagation an MXU matmul — exactly equivalent
to the per-edge segment softmax (the count mask reproduces duplicate-edge
multiplicity in both numerator and denominator).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.layers import Dense, l2_normalize, xavier_normal
from recommendar_systems_tpu.models.losses import _wmean
from recommendar_systems_tpu.ops.masked_attn import masked_attention_auto
from recommendar_systems_tpu.ops.seg import scatter_weighted_sum, segment_softmax


class GRCN(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    latent_embedding: int = 64
    num_routing: int = 3
    reg_weight: float = 1e-4
    has_v: bool = True
    has_t: bool = True
    # static modes (`grcn.py:180-186`)
    weight_mode: str = "confid"
    fusion_mode: str = "concat"
    has_act: bool = False
    has_norm: bool = True

    def setup(self):
        d, c = self.embedding_size, self.latent_embedding
        N = self.n_users + self.n_items
        self.id_embedding = self.param("id_embedding", xavier_normal, (N, d))
        n_modal = int(self.has_v) + int(self.has_t)
        self.model_specific_conf = self.param(
            "model_specific_conf", xavier_normal, (N, n_modal)
        )
        if self.has_v:
            self.v_pref = self.param("v_preference", xavier_normal, (self.n_users, c))
            self.v_mlp = Dense(c, kernel_init=xavier_normal, name="v_mlp")
        if self.has_t:
            self.t_pref = self.param("t_preference", xavier_normal, (self.n_users, c))
            self.t_mlp = Dense(c, kernel_init=xavier_normal, name="t_mlp")

    @staticmethod
    def _masked_softmax(scores, mask):
        """Row softmax over masked entries; empty rows -> all-zero rows
        (parity with segment softmax over empty segments).  ``mask`` holds
        edge multiplicities, weighting numerator and denominator alike.

        Keeps the [U, I] intermediates in the ``scores`` dtype (bf16 on TPU
        — these full-matrix elementwise passes are the HBM-bound hot path of
        dense GRCN); the denominator reduction accumulates in f32."""
        neg = jnp.finfo(scores.dtype).min
        mask = mask.astype(scores.dtype)
        sm = jnp.where(mask > 0, scores, neg)
        mx = jnp.max(sm, axis=1, keepdims=True)
        mx = jnp.where(mx > neg / 2, mx, jnp.zeros_like(mx))
        e = mask * jnp.exp(sm - mx)
        d = jnp.sum(e, axis=1, keepdims=True, dtype=jnp.float32)
        return (e / jnp.maximum(d, 1e-16)).astype(scores.dtype)

    @staticmethod
    def _dense_dtype():
        # bf16 [U, I] intermediates on TPU (half the HBM traffic; matmul
        # operands are bf16-rounded by XLA's default precision anyway);
        # f32 on CPU where the tests run
        return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16

    def _gat_dense(self, x_dst, x_src, mask):
        """(P @ x_src, P) where P = masked row softmax of x_dst @ x_src^T."""
        dt = self._dense_dtype()
        s = jnp.matmul(x_dst, x_src.T, preferred_element_type=dt)
        p = self._masked_softmax(s, mask)
        out = jnp.matmul(p, x_src.astype(dt), preferred_element_type=jnp.float32)
        return out, p

    def _gat(self, x, src, dst, sorted_dst=False):
        """Dot-attention conv (`grcn.py:46-76`): returns (out, alpha)."""
        alpha = jnp.sum(x[dst] * x[src], axis=-1)
        alpha = segment_softmax(alpha, dst, x.shape[0], indices_are_sorted=sorted_dst)
        out = scatter_weighted_sum(
            x[src], alpha, dst, x.shape[0], indices_are_sorted=sorted_dst
        )
        return out, alpha

    def _routing_dense(self, ctx, pref, mlp, feats):
        """MLP + routing iterations on the dense mask; returns the refined
        (pref, features), tile-padded when the fused layout is active."""
        features = nn.leaky_relu(mlp(feats), negative_slope=0.01)
        if self.has_norm:
            pref = l2_normalize(pref)
            features = l2_normalize(features)
        mask = ctx["mask_ui"]
        padded = ctx.get("dims_pad") is not None
        if padded:
            # fused-kernel layout: operate in tile-padded (Up, Ip) space
            # end to end; zero mask rows/cols make padding inert
            up, ip = mask.shape
            pref = jnp.pad(pref, ((0, up - pref.shape[0]), (0, 0)))
            features = jnp.pad(features, ((0, ip - features.shape[0]), (0, 0)))
        # dense routing: users attend over their interacted items; the
        # routing iterations discard the attention matrix, so the fused
        # Pallas kernel (ops/masked_attn.py) runs them with ONE HBM pass
        # over the mask and no [U, I] materialization
        for _ in range(self.num_routing):
            if padded:
                # has_norm guarantees |scores| <= 1: the kernel may skip
                # softmax max-stabilization (bounded=True)
                upd = masked_attention_auto(pref, features, mask,
                                            bounded=self.has_norm)
            else:
                upd, _ = self._gat_dense(pref, features, mask)
            pref = pref + upd
            if self.has_norm:
                pref = l2_normalize(pref)
        return pref, features

    def _routing_dense_pair(self, ctx, pv, v_mlp, v_feats, pt, t_mlp,
                            t_feats):
        """Both modality towers' routing loops jointly: each iteration
        streams the int8 mask ONCE for both (ops/masked_attn.py
        masked_attention2) instead of once per tower.  Only used on the
        fused tile-padded path; identical math to two `_routing_dense`
        calls."""
        from recommendar_systems_tpu.ops.masked_attn import (
            masked_attention2_auto,
        )

        fv = nn.leaky_relu(v_mlp(v_feats), negative_slope=0.01)
        ft = nn.leaky_relu(t_mlp(t_feats), negative_slope=0.01)
        if self.has_norm:
            pv, fv = l2_normalize(pv), l2_normalize(fv)
            pt, ft = l2_normalize(pt), l2_normalize(ft)
        mask = ctx["mask_ui"]
        up, ip = mask.shape
        pv = jnp.pad(pv, ((0, up - pv.shape[0]), (0, 0)))
        pt = jnp.pad(pt, ((0, up - pt.shape[0]), (0, 0)))
        fv = jnp.pad(fv, ((0, ip - fv.shape[0]), (0, 0)))
        ft = jnp.pad(ft, ((0, ip - ft.shape[0]), (0, 0)))
        for _ in range(self.num_routing):
            uv, ut = masked_attention2_auto(pv, fv, pt, ft, mask,
                                            bounded=self.has_norm)
            pv = pv + uv
            pt = pt + ut
            if self.has_norm:
                pv, pt = l2_normalize(pv), l2_normalize(pt)
        return pv, fv, pt, ft

    def _content_tower(self, ctx, pref, mlp, feats):
        mask = ctx.get("mask_ui")
        if mask is not None:
            pref, features = self._routing_dense(ctx, pref, mlp, feats)
            x = jnp.concatenate([pref, features], axis=0)
            out_u, p_u = self._gat_dense(pref, features, mask)
            out_i, p_i = self._gat_dense(features, pref, mask.T)
            out = jnp.concatenate([out_u, out_i], axis=0)
            if self.has_act:
                out = nn.leaky_relu(out, negative_slope=0.01)
            return x + out, (p_u, p_i), pref[: self.n_users]
        features = nn.leaky_relu(mlp(feats), negative_slope=0.01)
        if self.has_norm:
            pref = l2_normalize(pref)
            features = l2_normalize(features)
        # routing: items -> users over reversed single-direction edges
        src_i, dst_u = ctx["edge_i_node"], ctx["edge_u"]
        for _ in range(self.num_routing):
            x = jnp.concatenate([pref, features], axis=0)
            upd, _ = self._gat(x, src_i, dst_u, sorted_dst=True)
            pref = pref + upd[: self.n_users]
            if self.has_norm:
                pref = l2_normalize(pref)
        x = jnp.concatenate([pref, features], axis=0)
        # final conv over the doubled edge list (`grcn.py:160-166`)
        out, alpha = self._gat(x, ctx["sym_src"], ctx["sym_dst"], sorted_dst=True)
        if self.has_act:
            out = nn.leaky_relu(out, negative_slope=0.01)
        return x + out, alpha, pref

    def _unpad_nodes(self, ctx, arr):
        """[Up + Ip, d] padded node stack -> [U + I, d] (no-op unpadded)."""
        if ctx.get("dims_pad") is None:
            return arr
        up = ctx["mask_ui"].shape[0]
        return jnp.concatenate(
            [arr[: self.n_users], arr[up : up + self.n_items]], axis=0
        )

    def _representation_fused(self, ctx):
        """Fully fused dense path (ops/grcn_fused.py): routing via the
        masked-attention kernel, then tower final convs + both EGCN hops in
        one dual-direction gated-attention kernel per hop — no [U, I]
        materialization anywhere (only streaming reads of the int8 mask)."""
        from recommendar_systems_tpu.ops.grcn_fused import (
            dual_colstats,
            gated_dual_hop,
            gated_dual_hop_pair,
        )

        if ctx.get("routing_pair") is not None:
            # dual-modality routing kernel — measured SLOWER at baby scale
            # (71.2k vs 77.4k ex/s: the shared mask stream does not pay for
            # the halved row tiles), kept as an opt-in (`routing_pair=true`)
            # for narrower-VMEM shapes where the single kernel's tiles are
            # already minimal
            pv, fv, pt, ft = self._routing_dense_pair(
                ctx, self.v_pref, self.v_mlp, ctx["v_feat"],
                self.t_pref, self.t_mlp, ctx["t_feat"],
            )
        else:
            pv, fv = self._routing_dense(ctx, self.v_pref, self.v_mlp,
                                         ctx["v_feat"])
            pt, ft = self._routing_dense(ctx, self.t_pref, self.t_mlp,
                                         ctx["t_feat"])
        mask = ctx["mask_ui"]
        n_u, n_i = mask.shape
        U, I = self.n_users, self.n_items
        x = self.id_embedding
        if self.has_norm:
            x = l2_normalize(x)
        xu = jnp.pad(x[:U], ((0, n_u - U), (0, 0)))
        xi = jnp.pad(x[U:], ((0, n_i - I), (0, 0)))
        conf = self.model_specific_conf
        cu = jnp.pad(conf[:U], ((0, n_u - U), (0, 0)))
        ci = jnp.pad(conf[U:], ((0, n_i - I), (0, 0)))

        def act(a):
            return nn.leaky_relu(a, negative_slope=0.01) if self.has_act else a

        stats = dual_colstats(pv, fv, pt, ft, mask)
        if ctx.get("fused_pair") is not None:
            # both hops under ONE custom VJP: the combined backward sums
            # the hops' cotangents before a single softmax-Jacobian pass
            # (3 mask passes instead of 4 — ops/grcn_fused.py)
            ou_v, ou_t, oi_v, oi_t, h1u, h1i, h2u, h2i = gated_dual_hop_pair(
                pv, fv, pt, ft, cu, ci, xu, xi, stats, mask,
                self.has_act, 0.01,
            )
        else:
            ou_v, ou_t, oi_v, oi_t, h1u, h1i = gated_dual_hop(
                pv, fv, pt, ft, cu, ci, xu, xi, stats, mask
            )
            h1u, h1i = act(h1u), act(h1i)
            _, _, _, _, h2u, h2i = gated_dual_hop(
                pv, fv, pt, ft, cu, ci, h1u, h1i, stats, mask, False
            )
        h2u, h2i = act(h2u), act(h2i)
        id_rep = jnp.concatenate(
            [(xu + h1u + h2u)[:U], (xi + h1i + h2i)[:I]], axis=0
        )
        contents = [
            jnp.concatenate([(pv + act(ou_v))[:U], (fv + act(oi_v))[:I]], 0),
            jnp.concatenate([(pt + act(ou_t))[:U], (ft + act(oi_t))[:I]], 0),
        ]
        prefs = {"v": pv[:U], "t": pt[:U]}
        if self.fusion_mode == "concat":
            rep = jnp.concatenate([id_rep] + contents, axis=1)
        elif self.fusion_mode == "id":
            rep = id_rep
        else:  # mean
            rep = (id_rep + sum(contents)) / (1 + len(contents))
        return rep, prefs

    def representation(self, ctx):
        # presence check, not truthiness: ctx rides through jit as an
        # argument pytree, so the flag leaf is a tracer inside the step
        if (
            ctx.get("fused_egcn") is not None
            and self.has_v
            and self.has_t
            and self.weight_mode == "confid"
        ):
            return self._representation_fused(ctx)
        weights = []
        contents = []
        prefs = {}
        if self.has_v:
            v_rep, a_v, prefs["v"] = self._content_tower(
                ctx, self.v_pref, self.v_mlp, ctx["v_feat"]
            )
            contents.append(self._unpad_nodes(ctx, v_rep))
            weights.append(a_v)
        if self.has_t:
            t_rep, a_t, prefs["t"] = self._content_tower(
                ctx, self.t_pref, self.t_mlp, ctx["t_feat"]
            )
            contents.append(self._unpad_nodes(ctx, t_rep))
            weights.append(a_t)
        x = self.id_embedding
        if self.has_norm:
            x = l2_normalize(x)

        if ctx.get("mask_ui") is not None:
            # dense EGCN: combine per-modality attention blocks pairwise
            # (no [U, I, M] stack materialization), weighted SAGE = two
            # block matmuls per hop; all [U, I] temps stay in bf16 on TPU
            import functools

            dt = self._dense_dtype()
            padded = ctx.get("dims_pad") is not None
            # attention blocks (and the node stacks below) live in padded
            # (Up, Ip) space when the fused-kernel layout is active
            n_u = ctx["mask_ui"].shape[0] if padded else self.n_users
            n_i = ctx["mask_ui"].shape[1] if padded else self.n_items
            conf_u = self.model_specific_conf[: self.n_users].astype(dt)
            conf_i = self.model_specific_conf[self.n_users :].astype(dt)
            xu = x[: self.n_users].astype(dt)
            xi = x[self.n_users :].astype(dt)
            if padded:
                conf_u = jnp.pad(conf_u, ((0, n_u - self.n_users), (0, 0)))
                conf_i = jnp.pad(conf_i, ((0, n_i - self.n_items), (0, 0)))
                xu = jnp.pad(xu, ((0, n_u - self.n_users), (0, 0)))
                xi = jnp.pad(xi, ((0, n_i - self.n_items), (0, 0)))
            if self.weight_mode == "mean":
                w_ui = sum(w[0] for w in weights) / len(weights)
                w_iu = sum(w[1] for w in weights) / len(weights)
            elif self.weight_mode == "max":
                w_ui = functools.reduce(jnp.maximum, (w[0] for w in weights))
                w_iu = functools.reduce(jnp.maximum, (w[1] for w in weights))
            else:  # confid: confidence of the SOURCE node per modality
                w_ui = functools.reduce(
                    jnp.maximum,
                    (w[0] * conf_i[None, :, m] for m, w in enumerate(weights)),
                )
                w_iu = functools.reduce(
                    jnp.maximum,
                    (w[1] * conf_u[None, :, m] for m, w in enumerate(weights)),
                )
            w_ui = jax.nn.relu(w_ui)
            w_iu = jax.nn.relu(w_iu)
            f32 = jnp.float32
            h1u = jnp.matmul(w_ui, xi, preferred_element_type=f32)
            h1i = jnp.matmul(w_iu, xu, preferred_element_type=f32)
            h1 = jnp.concatenate([h1u, h1i], axis=0)
            if self.has_act:
                h1 = nn.leaky_relu(h1, negative_slope=0.01)
                h1u, h1i = h1[:n_u], h1[n_u:]
            h2 = jnp.concatenate(
                [jnp.matmul(w_ui, h1i.astype(dt), preferred_element_type=f32),
                 jnp.matmul(w_iu, h1u.astype(dt), preferred_element_type=f32)],
                axis=0,
            )
            if self.has_act:
                h2 = nn.leaky_relu(h2, negative_slope=0.01)
            if padded:
                x_p = jnp.concatenate([xu, xi], axis=0).astype(x.dtype)
                id_rep = x_p + h1 + h2
                # back to logical (U + I) rows
                id_rep = jnp.concatenate(
                    [id_rep[: self.n_users], id_rep[n_u : n_u + self.n_items]],
                    axis=0,
                )
            else:
                id_rep = x + h1 + h2
        else:
            weight = jnp.stack(weights, axis=1)  # [2E, M]

            if self.weight_mode == "mean":
                weight = weight.mean(axis=1)
            elif self.weight_mode == "max":
                weight = weight.max(axis=1)
            else:  # confid (`grcn.py:271-279`)
                # reference: cat(conf[edge_index[0]], conf[edge_index[1]]) over
                # the doubled edge list == conf[source] per symmetric edge,
                # which stays correct under our dst-sorted edge ordering
                confidence = self.model_specific_conf[ctx["sym_src"]]  # [2E, M]
                weight = (weight * confidence).max(axis=1)
            weight = jax.nn.relu(weight)  # pruning (`grcn.py:282-284`)

            # EGCN (`grcn.py:80-109`): weighted SAGE, x + h1 + h2
            h1 = scatter_weighted_sum(
                x[ctx["sym_src"]], weight, ctx["sym_dst"], x.shape[0],
                indices_are_sorted=True,
            )
            if self.has_act:
                h1 = nn.leaky_relu(h1, negative_slope=0.01)
            h2 = scatter_weighted_sum(
                h1[ctx["sym_src"]], weight, ctx["sym_dst"], x.shape[0],
                indices_are_sorted=True,
            )
            if self.has_act:
                h2 = nn.leaky_relu(h2, negative_slope=0.01)
            id_rep = x + h1 + h2

        if self.fusion_mode == "concat":
            rep = jnp.concatenate([id_rep] + contents, axis=1)
        elif self.fusion_mode == "id":
            rep = id_rep
        else:  # mean
            rep = (id_rep + sum(contents)) / (1 + len(contents))
        return rep, prefs

    def loss(self, ctx, batch, train: bool = True):
        out, _ = self.representation(ctx)
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        u = out[users]
        pos_s = jnp.sum(u * out[pos + self.n_users], 1)
        neg_s = jnp.sum(u * out[neg + self.n_users], 1)
        mf = _wmean(-jnp.log(jax.nn.sigmoid(pos_s - neg_s)), w)

        def row_msq(e):
            return jnp.mean(e * e, axis=1)

        # `grcn.py:314`: (id[user_rep2]^2 + id[items]^2).mean() over [2B, d]
        # == mean_B(u^2) + (mean_B(p^2) + mean_B(n^2)) / 2; the preference
        # regularizers use the RAW parameter tables (`grcn.py:316,320,324`),
        # not the routed preferences
        ids = self.id_embedding
        reg_emb = _wmean(row_msq(ids[users]), w) + 0.5 * (
            _wmean(row_msq(ids[pos + self.n_users]), w)
            + _wmean(row_msq(ids[neg + self.n_users]), w)
        )
        if self.has_v:
            reg_emb = reg_emb + jnp.mean(self.v_pref**2)
        reg_content = 0.0
        if self.has_v:
            reg_content = reg_content + _wmean(row_msq(self.v_pref[users]), w)
        if self.has_t:
            reg_content = reg_content + _wmean(row_msq(self.t_pref[users]), w)
        reg = self.reg_weight * (reg_emb + reg_content)
        total = mf + reg
        return total, {"mf_loss": mf, "reg_loss": reg}

    def eval_embeddings(self, ctx):
        out, _ = self.representation(ctx)
        return out[: self.n_users], out[self.n_users :]

    @classmethod
    def from_config(cls, config, data) -> "GRCN":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            latent_embedding=int(cfg_scalar(config, "latent_embedding", 64)),
            num_routing=int(cfg_scalar(config, "n_layers", 3)),
            reg_weight=float(_s(config["reg_weight"])),
            # one source of truth with build_ctx's fused-egcn gate: the
            # mega-kernel's unstabilized softmax is only valid when scores
            # are bounded, i.e. when the model actually l2-normalizes
            has_norm=bool(cfg_scalar(config, "has_norm", True)),
            has_v=data.v_feat is not None,
            has_t=data.t_feat is not None,
        )

    @classmethod
    def build_ctx(cls, config, data):
        # edges sorted by DESTINATION so segment softmax/sum take the sorted
        # fast path (the per-edge order within a segment does not affect the
        # math)
        u = data.train_users_np.astype(np.int64)
        i_node = data.train_items_np.astype(np.int64) + data.n_users
        order_u = np.argsort(u, kind="stable")
        u_s, i_s = u[order_u], i_node[order_u]  # routing edges: dst = user
        sym_src = np.concatenate([u, i_node])
        sym_dst = np.concatenate([i_node, u])
        order_sym = np.argsort(sym_dst, kind="stable")
        ctx = {
            "edge_u": jnp.asarray(u_s, dtype=jnp.int32),
            "edge_i_node": jnp.asarray(i_s, dtype=jnp.int32),
            "sym_src": jnp.asarray(sym_src[order_sym], dtype=jnp.int32),
            "sym_dst": jnp.asarray(sym_dst[order_sym], dtype=jnp.int32),
        }
        from recommendar_systems_tpu.graph.sparse import dense_ok

        if dense_ok(data.n_users, data.n_items):
            m = np.zeros((data.n_users, data.n_items), np.float32)
            np.add.at(
                m,
                (data.train_users_np.astype(np.int64),
                 data.train_items_np.astype(np.int64)),
                1.0,
            )
            from recommendar_systems_tpu.ops.masked_attn import (
                fits_vmem,
                fused_attn_enabled,
            )

            c = int(cfg_scalar(config, "latent_embedding", 64))
            d = int(config["embedding_size"])
            ip = -(-data.n_items // 128) * 128
            if fused_attn_enabled() and fits_vmem(ip, c):
                # tile-pad for the fused attention kernel; zero rows/cols
                # are inert in every consumer (masked softmax -> zero rows)
                up = -(-data.n_users // 256) * 256
                mp = np.zeros((up, ip), np.float32)
                mp[: data.n_users, : data.n_items] = m
                m = mp
                ctx["dims_pad"] = (data.n_users, data.n_items)
                from recommendar_systems_tpu.ops import grcn_fused

                under_mesh = bool(
                    config.get("mesh_shape")
                    or config.get("shard_embedding_tables")
                )
                egcn_knob = config.get("fused_egcn")
                egcn_on = True if egcn_knob is None else bool(egcn_knob)
                # the mega-kernel's unstabilized softmax requires bounded
                # scores: only valid under has_norm (l2-normalized q/k,
                # |s| <= 1 — the reference default); has_norm=False keeps
                # the stabilized unfused dense path
                has_norm = bool(cfg_scalar(config, "has_norm", True))
                # the dual-direction mega-kernel has no sharded form yet;
                # under a mesh GRCN keeps the (sharded) masked-attention
                # routing and GSPMD-partitioned dense towers
                if (grcn_fused.fits_vmem(up, ip, c, d) and not under_mesh
                        and egcn_on and has_norm):
                    ctx["fused_egcn"] = True
                    if bool(config.get("routing_pair")):
                        ctx["routing_pair"] = True
                    pair_knob = config.get("fused_pair")
                    if pair_knob is None or bool(pair_knob):
                        # two-hop pair op (combined backward); fused_pair=
                        # false falls back to two single-hop ops for A/B
                        ctx["fused_pair"] = True
            # edge multiplicity counts stored int8 (exact; counts are tiny)
            # — a quarter of the f32 HBM bytes on every masked-softmax pass
            assert m.max() < 127, "int8 edge-multiplicity overflow"
            ctx["mask_ui"] = jnp.asarray(m, dtype=jnp.int8)
        if data.v_feat is not None:
            ctx["v_feat"] = data.v_feat
        if data.t_feat is not None:
            ctx["t_feat"] = data.t_feat
        return ctx


MODEL = GRCN
