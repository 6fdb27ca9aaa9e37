"""SMOREMG (reference `/root/reference/src/models/smoremg.py`).

SMORE plus:
- an item-aware frequency band gate (Linear d -> freq_bins + sigmoid on the
  item id embedding) multiplying every filtered spectrum (`smoremg.py:140-146,
  190-223`);
- frequency-domain residual injection scaled by ``freq_residual_alpha``
  (`smoremg.py:235-243`), falling back to multiplicative gating;
- shared low-frequency consistency loss: MSE between real/imag parts of the
  filtered image and text spectra on the batch's positive items
  (`smoremg.py:319-331`);
- MG-style stochastic consistency regularizer: MSE between two dropout views
  of side/content embeddings (`smoremg.py:332-344`);
- per-band energy diagnostics export (`smoremg.py:380-449`).
"""

from __future__ import annotations

from recommendar_systems_tpu.models.base import cfg_scalar

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from recommendar_systems_tpu.models.layers import Dense
from recommendar_systems_tpu.models.losses import batch_sq_reg, bpr_loss, infonce
from recommendar_systems_tpu.models.multiview import (
    modality_view,
    modality_views_batched,
    ui_content_view,
)
from recommendar_systems_tpu.models.smore import SMORE, normal_init
from recommendar_systems_tpu.ops.spectral import complex_from_pair, irfft_ortho, rfft_ortho


class SMOREMG(SMORE):
    use_freq_residual: bool = True
    freq_residual_alpha: float = 0.25
    low_freq_ratio: float = 0.15
    freq_consistency_weight: float = 0.0
    mg_consistency_weight: float = 0.0

    def setup(self):
        super().setup()
        self.item_freq_gate = Dense(self.embedding_size // 2 + 1, name="item_freq_gate")

    def _filtered_spectra(self, image_feats, text_feats):
        d = self.embedding_size
        image_fft = rfft_ortho(image_feats)
        text_fft = rfft_ortho(text_feats)
        w_i = complex_from_pair(self.image_complex_weight)
        w_t = complex_from_pair(self.text_complex_weight)
        w_f = complex_from_pair(self.fusion_complex_weight)
        item_gate = nn.sigmoid(self.item_freq_gate(self.item_id_embedding))
        gate_c = item_gate.astype(image_fft.dtype)
        image_filt = image_fft * w_i * gate_c
        text_filt = text_fft * w_t * gate_c
        fusion_fft = (image_fft * text_fft) * w_f * gate_c
        image_conv = irfft_ortho(image_filt, d)
        text_conv = irfft_ortho(text_filt, d)
        fusion_conv = irfft_ortho(fusion_fft, d)
        return image_conv, text_conv, fusion_conv, image_filt, text_filt

    def views(self, ctx, train: bool, with_cache: bool = False):
        image_feats = self.image_trs(ctx["v_feat"])
        text_feats = self.text_trs(ctx["t_feat"])
        image_conv, text_conv, fusion_conv, image_filt, text_filt = (
            self._filtered_spectra(image_feats, text_feats)
        )
        iid = self.item_id_embedding
        if self.use_freq_residual:
            image_item = iid + self.freq_residual_alpha * self.gate_v(image_conv)
            text_item = iid + self.freq_residual_alpha * self.gate_t(text_conv)
            fusion_item = iid + self.freq_residual_alpha * self.gate_f(fusion_conv)
        else:
            image_item = iid * self.gate_v(image_conv)
            text_item = iid * self.gate_t(text_conv)
            fusion_item = iid * self.gate_f(fusion_conv)

        content = ui_content_view(
            ctx["norm_adj"], self.user_embedding, iid, self.n_ui_layers
        )
        image_embeds, text_embeds, fusion_embeds = modality_views_batched(
            [ctx["image_adj"], ctx["text_adj"], ctx["fusion_adj"]],
            ctx["R"],
            [image_item, text_item, fusion_item],
            self.n_layers,
        )

        agg_image = jax.nn.softmax(self.query_v(fusion_embeds), axis=-1) * image_embeds
        agg_text = jax.nn.softmax(self.query_t(fusion_embeds), axis=-1) * text_embeds
        det = not train
        image_prefer = self.prefer_dropout(self.gate_image_prefer(content), deterministic=det)
        text_prefer = self.prefer_dropout(self.gate_text_prefer(content), deterministic=det)
        fusion_prefer = self.prefer_dropout(self.gate_fusion_prefer(content), deterministic=det)
        side = (
            image_prefer * agg_image + text_prefer * agg_text + fusion_prefer * fusion_embeds
        ) / 3.0
        all_embeds = content + side
        if with_cache:
            return all_embeds, side, content, image_filt, text_filt
        return all_embeds, side, content

    def loss(self, ctx, batch, train: bool = True):
        all_embeds, side, content, image_filt, text_filt = self.views(
            ctx, train, with_cache=True
        )
        ue, ie = all_embeds[: self.n_users], all_embeds[self.n_users :]
        users, pos, neg = batch["users"], batch["pos_items"], batch["neg_items"]
        w = batch.get("weight")
        u, pe, ne = ue[users], ie[pos], ie[neg]
        mf = bpr_loss(jnp.sum(u * pe, 1), jnp.sum(u * ne, 1), gamma=0.0, weight=w)
        reg = self.reg_weight * batch_sq_reg(u, pe, ne, batch_size=self.batch_size, weight=w)
        side_u, side_i = side[: self.n_users], side[self.n_users :]
        cont_u, cont_i = content[: self.n_users], content[self.n_users :]
        cl = infonce(side_i[pos], cont_i[pos], 0.2, weight=w) + infonce(
            side_u[users], cont_u[users], 0.2, weight=w
        )

        # low-band frequency consistency (`smoremg.py:319-331`)
        freq_c = 0.0
        if self.freq_consistency_weight > 0:
            F = self.embedding_size // 2 + 1
            k = max(1, int(F * self.low_freq_ratio))
            i_f = image_filt[pos, :k]
            t_f = text_filt[pos, :k]
            mse = jnp.mean((i_f.real - t_f.real) ** 2) + jnp.mean(
                (i_f.imag - t_f.imag) ** 2
            )
            freq_c = self.freq_consistency_weight * mse

        # MG-style stochastic consistency (`smoremg.py:332-344`)
        mg_c = 0.0
        if self.mg_consistency_weight > 0 and train:
            s1 = self.prefer_dropout(side, deterministic=False)
            s2 = self.prefer_dropout(side, deterministic=False)
            c1 = self.prefer_dropout(content, deterministic=False)
            c2 = self.prefer_dropout(content, deterministic=False)
            mg_c = self.mg_consistency_weight * (
                jnp.mean((s1 - s2) ** 2) + jnp.mean((c1 - c2) ** 2)
            )

        total = mf + reg + self.cl_loss * cl + freq_c + mg_c
        return total, {
            "mf_loss": mf,
            "emb_loss": reg,
            "cl_loss": cl,
            "freq_consistency": freq_c,
            "mg_consistency": mg_c,
        }

    def export_diagnostics(self, ctx) -> Dict[str, Any]:
        """Per-band spectral energy stats for the analysis tooling
        (`smoremg.py:380-449`); consumed by tools/plot_smore_diagnostics.py."""
        image_feats = self.image_trs(ctx["v_feat"])
        text_feats = self.text_trs(ctx["t_feat"])
        _, _, _, image_filt, text_filt = self._filtered_spectra(image_feats, text_feats)
        out = {}
        for name, filt in (("image", image_filt), ("text", text_filt)):
            energy = (filt.real ** 2 + filt.imag ** 2).mean(axis=0)
            out[f"{name}_band_energy"] = energy
        gate = nn.sigmoid(self.item_freq_gate(self.item_id_embedding))
        out["item_gate_mean"] = gate.mean(axis=0)
        out["item_gate_std"] = gate.std(axis=0)
        return out

    @classmethod
    def from_config(cls, config, data) -> "SMOREMG":
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
            dropout_rate=float(cfg_scalar(config, "dropout_rate", 0.1)),
            batch_size=int(config["train_batch_size"]),
            use_freq_residual=bool(
                True if config.get("use_freq_residual") is None
                else config.get("use_freq_residual")
            ),
            freq_residual_alpha=float(cfg_scalar(config, "freq_residual_alpha", 0.25)),
            low_freq_ratio=float(cfg_scalar(config, "low_freq_ratio", 0.15)),
            freq_consistency_weight=float(cfg_scalar(config, "freq_consistency_weight", 0.0)),
            mg_consistency_weight=float(cfg_scalar(config, "mg_consistency_weight", 0.0)),
        )


MODEL = SMOREMG
