"""SMORE1 (reference `/root/reference/src/models/smore1.py`).

Cleaned SMORE with modality-presence flags (`smore1.py:38-40`): works when
only one of image/text features exists — the fusion adjacency falls back to
the present modality (`smore1.py:154-174`), spectral fusion degrades to the
uni-modal filtered signal, and absent-view branches drop out of the
preference module.  No MG/diagnostic attributes (original-paper style:
'mul' injection, no unit-magnitude filter normalization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from recommendar_systems_tpu.graph.build import build_norm_adj_and_r
from recommendar_systems_tpu.graph.knn import build_knn_ell
from recommendar_systems_tpu.graph.sparse import ell_union_max
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.layers import Dense, xavier_uniform
from recommendar_systems_tpu.models.losses import batch_sq_reg, bpr_loss, infonce
from recommendar_systems_tpu.models.multiview import (
    GateMLP,
    QueryMLP,
    modality_view,
    modality_views_batched,
    ui_content_view,
)
from recommendar_systems_tpu.models.smore import SMORE, normal_init
from recommendar_systems_tpu.ops.spectral import cross_spectral_fusion, spectral_filter


class SMORE1(SMORE):
    """SMORE with optional modalities; inherits the full SMORE machinery."""

    has_v: bool = True
    has_t: bool = True

    def setup(self):
        d = self.embedding_size
        F = d // 2 + 1
        self.user_embedding = self.param(
            "user_embedding", xavier_uniform, (self.n_users, d)
        )
        self.item_id_embedding = self.param(
            "item_id_embedding", xavier_uniform, (self.n_items, d)
        )
        if self.has_v:
            self.image_trs = Dense(d)
            self.query_v = QueryMLP(d)
            self.gate_v = GateMLP(d)
            self.gate_image_prefer = GateMLP(d)
            self.image_complex_weight = self.param(
                "image_complex_weight", normal_init, (1, F, 2)
            )
        if self.has_t:
            self.text_trs = Dense(d)
            self.query_t = QueryMLP(d)
            self.gate_t = GateMLP(d)
            self.gate_text_prefer = GateMLP(d)
            self.text_complex_weight = self.param(
                "text_complex_weight", normal_init, (1, F, 2)
            )
        self.gate_f = GateMLP(d)
        self.gate_fusion_prefer = GateMLP(d)
        self.fusion_complex_weight = self.param(
            "fusion_complex_weight", normal_init, (1, F, 2)
        )
        import flax.linen as nn

        self.prefer_dropout = nn.Dropout(rate=self.dropout_rate)

    def views(self, ctx, train: bool):
        iid = self.item_id_embedding
        norm = self.spectral_weight_norm
        views = []
        image_conv = text_conv = None
        if self.has_v:
            image_feats = self.image_trs(ctx["v_feat"])
            image_conv = spectral_filter(image_feats, self.image_complex_weight, norm)
        if self.has_t:
            text_feats = self.text_trs(ctx["t_feat"])
            text_conv = spectral_filter(text_feats, self.text_complex_weight, norm)
        if self.has_v and self.has_t:
            fusion_conv = cross_spectral_fusion(
                text_feats, image_feats, self.fusion_complex_weight, norm
            )
        else:
            only = image_conv if self.has_v else text_conv
            fusion_conv = spectral_filter(only, self.fusion_complex_weight, norm)

        def inject(conv, gate):
            if self.inject_mode == "mul":
                return iid * gate(conv)
            return iid + self.inject_scale * gate(conv)

        content = ui_content_view(
            ctx["norm_adj"], self.user_embedding, iid, self.n_ui_layers
        )
        # batch the present modality propagations + the fusion view into one
        # wide R lift (distinct item-item graphs, shared R — multiview.py)
        adjs, items = [], []
        if self.has_v:
            adjs.append(ctx["image_adj"])
            items.append(inject(image_conv, self.gate_v))
        if self.has_t:
            adjs.append(ctx["text_adj"])
            items.append(inject(text_conv, self.gate_t))
        adjs.append(ctx["fusion_adj"])
        items.append(inject(fusion_conv, self.gate_f))
        embeds = modality_views_batched(adjs, ctx["R"], items, self.n_layers)
        fusion_embeds = embeds[-1]
        det = not train
        if self.has_v:
            image_embeds = embeds[0]
            agg = jax.nn.softmax(self.query_v(fusion_embeds), axis=-1) * image_embeds
            prefer = self.prefer_dropout(
                self.gate_image_prefer(content), deterministic=det
            )
            views.append(prefer * agg)
        if self.has_t:
            text_embeds = embeds[1 if self.has_v else 0]
            agg = jax.nn.softmax(self.query_t(fusion_embeds), axis=-1) * text_embeds
            prefer = self.prefer_dropout(
                self.gate_text_prefer(content), deterministic=det
            )
            views.append(prefer * agg)
        fusion_prefer = self.prefer_dropout(
            self.gate_fusion_prefer(content), deterministic=det
        )
        views.append(fusion_prefer * fusion_embeds)
        side = sum(views) / len(views)
        return content + side, side, content

    @classmethod
    def from_config(cls, config, data) -> "SMORE1":
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return cls(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            n_ui_layers=int(cfg_scalar(config, "n_ui_layers", 4)),
            n_layers=int(cfg_scalar(config, "n_layers", 1)),
            reg_weight=float(_s(config["reg_weight"])),
            cl_loss=float(_s(config["cl_loss"])),
            cl_temp=float(cfg_scalar(config, "cl_temp", 0.2)),
            dropout_rate=float(cfg_scalar(config, "dropout_rate", 0.1)),
            # the reference smore1 ignores inject/norm config keys entirely:
            # always 'mul' injection, never unit-magnitude normalization
            # (`smore1.py:203-247` has no config.get for either)
            inject_mode="mul",
            spectral_weight_norm=False,
            batch_size=int(config["train_batch_size"]),
            has_v=data.v_feat is not None,
            has_t=data.t_feat is not None,
        )

    @classmethod
    def build_ctx(cls, config, data):
        import os

        def _s(v):
            return v[0] if isinstance(v, list) else v

        image_k = int(cfg_scalar(config, "image_knn_k", 20))
        text_k = int(cfg_scalar(config, "text_knn_k", 15))
        cache_dir = os.path.join(str(config["data_path"]), str(config["dataset"]))
        norm_adj, r_hat = build_norm_adj_and_r(
            data.train_users_np, data.train_items_np, data.n_users, data.n_items
        )
        ctx = {"norm_adj": norm_adj, "R": r_hat}
        image_adj = text_adj = None
        if data.v_feat is not None:
            image_adj = build_knn_ell(
                data.v_feat, image_k, cache_dir=cache_dir, cache_key="image"
            )
            ctx["image_adj"] = image_adj
            ctx["v_feat"] = data.v_feat
        if data.t_feat is not None:
            text_adj = build_knn_ell(
                data.t_feat, text_k, cache_dir=cache_dir, cache_key="text"
            )
            ctx["text_adj"] = text_adj
            ctx["t_feat"] = data.t_feat
        if image_adj is not None and text_adj is not None:
            ctx["fusion_adj"] = ell_union_max(image_adj, text_adj)
        else:
            ctx["fusion_adj"] = image_adj if image_adj is not None else text_adj
        return ctx


MODEL = SMORE1
