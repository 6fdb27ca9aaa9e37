"""SMORE (reference `/root/reference/src/models/smore.py`, WSDM'25).

Spectrum-based modality fusion:
- learnable complex spectral filters per modality + a fusion filter applied
  as an element-wise product of rFFT spectra (`smore.py:209-252`), with
  optional unit-magnitude weight normalization (`smore.py:221-229`);
- gated injection of the filtered modality signal into the item id table,
  'residual' (default, scaled) or 'mul' (`smore.py:265-272`);
- three item-item graph views (image kNN, text kNN, max-pool fusion of the
  two — `smore.py:153-174`) each propagated and lifted to users through R
  (`smore.py:289-318`);
- modality-aware preference module: per-view softmax queries + preference
  gates + dropout (`smore.py:320-337`);
- loss = BPR + batch-sq reg + cl_loss * InfoNCE(side, content)
  (`smore.py:366-411`); MG hooks via the trainer (`smore.py:128-147`).

Spectral diagnostics (band energies, gate stats — `smore.py:239-252,
343-359, 424-449`) are exposed through ``diagnostics``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommendar_systems_tpu.graph.build import build_norm_adj_and_r
from recommendar_systems_tpu.graph.knn import build_knn_ell
from recommendar_systems_tpu.graph.sparse import ell_union_max
from recommendar_systems_tpu.models.base import cfg_scalar, RecModel
from recommendar_systems_tpu.models.layers import Dense, xavier_uniform
from recommendar_systems_tpu.models.losses import batch_sq_reg, bpr_loss, infonce
from recommendar_systems_tpu.models.multiview import (
    modality_views_batched,
    GateMLP,
    QueryMLP,
    modality_view,
    ui_content_view,
)
from recommendar_systems_tpu.ops.spectral import (
    band_energies,
    cross_spectral_fusion,
    spectral_filter,
)

normal_init = nn.initializers.normal(stddev=1.0)  # torch.randn parity


class SMORE(RecModel):
    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    n_ui_layers: int = 4
    n_layers: int = 1
    reg_weight: float = 1e-5
    cl_loss: float = 0.01
    cl_temp: float = 0.2
    dropout_rate: float = 0.1
    inject_mode: str = "residual"
    inject_scale: float = 0.7
    spectral_weight_norm: bool = True
    batch_size: int = 2048

    def setup(self):
        d = self.embedding_size
        F = d // 2 + 1
        self.user_embedding = self.param(
            "user_embedding", xavier_uniform, (self.n_users, d)
        )
        self.item_id_embedding = self.param(
            "item_id_embedding", xavier_uniform, (self.n_items, d)
        )
        self.image_trs = Dense(d)
        self.text_trs = Dense(d)
        self.query_v = QueryMLP(d)
        self.query_t = QueryMLP(d)
        self.gate_v = GateMLP(d)
        self.gate_t = GateMLP(d)
        self.gate_f = GateMLP(d)
        self.gate_image_prefer = GateMLP(d)
        self.gate_text_prefer = GateMLP(d)
        self.gate_fusion_prefer = GateMLP(d)
        self.image_complex_weight = self.param(
            "image_complex_weight", normal_init, (1, F, 2)
        )
        self.text_complex_weight = self.param(
            "text_complex_weight", normal_init, (1, F, 2)
        )
        self.fusion_complex_weight = self.param(
            "fusion_complex_weight", normal_init, (1, F, 2)
        )
        self.prefer_dropout = nn.Dropout(rate=self.dropout_rate)

    def spectrum_convolution(self, image_feats, text_feats):
        """Uni-modal denoising + cross-modal spectral fusion (`smore.py:209-237`)."""
        image_conv = spectral_filter(
            image_feats, self.image_complex_weight, self.spectral_weight_norm
        )
        text_conv = spectral_filter(
            text_feats, self.text_complex_weight, self.spectral_weight_norm
        )
        fusion_conv = cross_spectral_fusion(
            text_feats, image_feats, self.fusion_complex_weight,
            self.spectral_weight_norm,
        )
        return image_conv, text_conv, fusion_conv

    def views(self, ctx, train: bool):
        image_feats = self.image_trs(ctx["v_feat"])
        text_feats = self.text_trs(ctx["t_feat"])
        image_conv, text_conv, fusion_conv = self.spectrum_convolution(
            image_feats, text_feats
        )

        iid = self.item_id_embedding
        if self.inject_mode == "mul":
            image_item = iid * self.gate_v(image_conv)
            text_item = iid * self.gate_t(text_conv)
            fusion_item = iid * self.gate_f(fusion_conv)
        else:  # residual (reference default)
            image_item = iid + self.inject_scale * self.gate_v(image_conv)
            text_item = iid + self.inject_scale * self.gate_t(text_conv)
            fusion_item = iid + self.inject_scale * self.gate_f(fusion_conv)

        content = ui_content_view(
            ctx["norm_adj"], self.user_embedding, iid, self.n_ui_layers
        )
        image_embeds, text_embeds, fusion_embeds = modality_views_batched(
            [ctx["image_adj"], ctx["text_adj"], ctx["fusion_adj"]],
            ctx["R"],
            [image_item, text_item, fusion_item],
            self.n_layers,
        )

        # modality-aware preference module (`smore.py:320-337`)
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
        agg_image = image_prefer * agg_image
        agg_text = text_prefer * agg_text
        fusion_embeds = fusion_prefer * fusion_embeds

        side = (agg_image + agg_text + fusion_embeds) / 3.0
        return content + side, side, content

    def loss(self, ctx, batch, train: bool = True):
        all_embeds, side, content = self.views(ctx, train)
        ue, ie = all_embeds[: self.n_users], all_embeds[self.n_users :]
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        u, pos_e, neg_e = ue[users], ie[pos], ie[neg]
        mf = bpr_loss(jnp.sum(u * pos_e, 1), jnp.sum(u * neg_e, 1), gamma=0.0, weight=w)
        reg = self.reg_weight * batch_sq_reg(
            u, pos_e, neg_e, batch_size=self.batch_size, weight=w
        )
        side_u, side_i = side[: self.n_users], side[self.n_users :]
        cont_u, cont_i = content[: self.n_users], content[self.n_users :]
        cl_items = infonce(side_i[pos], cont_i[pos], self.cl_temp, weight=w)
        cl_users = infonce(side_u[users], cont_u[users], self.cl_temp, weight=w)
        cl = cl_items + cl_users
        total = mf + reg + self.cl_loss * cl
        return total, {
            "mf_loss": mf,
            "emb_loss": reg,
            "cl_items": cl_items,
            "cl_users": cl_users,
        }

    def eval_embeddings(self, ctx):
        all_embeds, _, _ = self.views(ctx, train=False)
        return all_embeds[: self.n_users], all_embeds[self.n_users :]

    def diagnostics(self, ctx) -> Dict[str, Any]:
        """Spectral band energies + gate activation stats (`smore.py:424-449`)."""
        image_feats = self.image_trs(ctx["v_feat"])
        text_feats = self.text_trs(ctx["t_feat"])
        img_lo, img_mid, img_hi = band_energies(image_feats)
        txt_lo, txt_mid, txt_hi = band_energies(text_feats)
        image_conv, text_conv, fusion_conv = self.spectrum_convolution(
            image_feats, text_feats
        )
        out = {
            "spec/image_lo": img_lo, "spec/image_mid": img_mid, "spec/image_hi": img_hi,
            "spec/text_lo": txt_lo, "spec/text_mid": txt_mid, "spec/text_hi": txt_hi,
        }
        for name, conv, gate in (
            ("gV", image_conv, self.gate_v),
            ("gT", text_conv, self.gate_t),
            ("gF", fusion_conv, self.gate_f),
        ):
            g = gate(conv)
            out[f"gate/{name}_mean"] = g.mean()
            out[f"gate/{name}_std"] = g.std()
            out[f"gate/{name}_sparsity"] = (g < 0.1).mean()
        return out

    @classmethod
    def from_config(cls, config, data) -> "SMORE":
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
            inject_mode=str(config.get("inject_mode") or "residual"),
            inject_scale=float(cfg_scalar(config, "inject_scale", 0.7)),
            spectral_weight_norm=bool(
                config.get("spectral_weight_norm", True)
            ),
            batch_size=int(config["train_batch_size"]),
        )

    @classmethod
    def build_ctx(cls, config, data, dense=None):
        import os

        def _s(v):
            return v[0] if isinstance(v, list) else v

        image_k = int(cfg_scalar(config, "image_knn_k", 20))
        text_k = int(cfg_scalar(config, "text_knn_k", 15))
        cache_dir = os.path.join(str(config["data_path"]), str(config["dataset"]))
        image_adj = build_knn_ell(
            data.v_feat, image_k, cache_dir=cache_dir, cache_key="image",
            dense=dense,
        )
        text_adj = build_knn_ell(
            data.t_feat, text_k, cache_dir=cache_dir, cache_key="text",
            dense=dense,
        )
        fusion_adj = ell_union_max(image_adj, text_adj)
        norm_adj, r_hat = build_norm_adj_and_r(
            data.train_users_np, data.train_items_np, data.n_users,
            data.n_items, dense=dense,
        )
        return {
            "norm_adj": norm_adj,
            "R": r_hat,
            "image_adj": image_adj,
            "text_adj": text_adj,
            "fusion_adj": fusion_adj,
            "v_feat": data.v_feat,
            "t_feat": data.t_feat,
        }


MODEL = SMORE
