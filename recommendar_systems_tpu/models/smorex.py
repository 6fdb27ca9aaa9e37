"""SMOREX (reference `/root/reference/src/models/smorex.py`).

SMORE with a selectable spectral method (`smorex.py:254-283`):
- 'fft': the original learnable complex filters (no unit-mag normalization);
- 'dwt': 1-level Haar wavelet denoising keeping the approximation band and
  top-p (or soft-thresholded) detail coefficients (`smorex.py:143-176`),
  fusion = element-wise product of denoised modalities;
- 'wiener': James-Stein shrinkage with noise = alpha * median feature
  variance (`smorex.py:186-194`).

Injection is multiplicative (original SMORE style, `smorex.py:294-296`).
"""

from __future__ import annotations

from recommendar_systems_tpu.models.base import cfg_scalar

import jax.numpy as jnp

from recommendar_systems_tpu.models.smore import SMORE
from recommendar_systems_tpu.ops.spectral import (
    cross_spectral_fusion,
    haar_dwt1,
    haar_idwt1,
    soft_threshold,
    spectral_filter,
)


class SMOREX(SMORE):
    spec_method: str = "fft"
    dwt_keep_ratio: float = 0.5
    dwt_use_softthr: bool = False
    dwt_softthr_k: float = 0.0
    wiener_alpha: float = 0.5
    wiener_eps: float = 1e-6

    def _wavelet_denoise(self, x):
        a, d = haar_dwt1(x)
        d2 = d.shape[-1]
        if self.dwt_use_softthr and self.dwt_softthr_k > 0:
            k = max(1, int(d2 * self.dwt_softthr_k))
            thr = jnp.sort(jnp.abs(d), axis=1)[:, -k][:, None]
            d = soft_threshold(d, thr)
        else:
            k = max(1, int(d2 * self.dwt_keep_ratio))
            thr = jnp.sort(jnp.abs(d), axis=1)[:, -k][:, None]
            d = jnp.where(jnp.abs(d) >= thr, d, 0.0)
        return haar_idwt1(a, d, x.shape[-1])

    def _wiener_denoise(self, x):
        var_feat = jnp.var(x, axis=0)
        noise_var = jnp.median(var_feat) * self.wiener_alpha + self.wiener_eps
        shrink = jnp.clip(var_feat / (var_feat + noise_var), 0.0, 1.0)
        return x * shrink[None, :]

    def spectrum_convolution(self, image_feats, text_feats):
        if self.spec_method == "fft":
            image_conv = spectral_filter(
                image_feats, self.image_complex_weight, normalize_weight=False
            )
            text_conv = spectral_filter(
                text_feats, self.text_complex_weight, normalize_weight=False
            )
            fusion_conv = cross_spectral_fusion(
                text_feats, image_feats, self.fusion_complex_weight,
                normalize_weight=False,
            )
            return image_conv, text_conv, fusion_conv
        if self.spec_method == "dwt":
            image_dn = self._wavelet_denoise(image_feats)
            text_dn = self._wavelet_denoise(text_feats)
            return image_dn, text_dn, image_dn * text_dn
        if self.spec_method == "wiener":
            image_dn = self._wiener_denoise(image_feats)
            text_dn = self._wiener_denoise(text_feats)
            return image_dn, text_dn, image_dn * text_dn
        raise ValueError(f"unknown spec_method {self.spec_method!r}")

    @classmethod
    def config_kwargs(cls, config, data) -> dict:
        def _s(v):
            return v[0] if isinstance(v, list) else v

        return dict(
            n_users=data.n_users,
            n_items=data.n_items,
            embedding_size=int(config["embedding_size"]),
            n_ui_layers=int(cfg_scalar(config, "n_ui_layers", 4)),
            n_layers=int(cfg_scalar(config, "n_layers", 1)),
            reg_weight=float(_s(config["reg_weight"])),
            cl_loss=float(_s(config["cl_loss"])),
            cl_temp=float(cfg_scalar(config, "cl_temp", 0.2)),
            dropout_rate=float(cfg_scalar(config, "dropout_rate", 0.1)),
            inject_mode="mul",  # `smorex.py:294-296`
            spectral_weight_norm=False,
            batch_size=int(config["train_batch_size"]),
            spec_method=str(_s(config.get("spec_method")) or "fft").lower(),
            dwt_keep_ratio=float(cfg_scalar(config, "dwt_keep_ratio", 0.5)),
            dwt_use_softthr=bool(config.get("dwt_use_softthr") or False),
            dwt_softthr_k=float(cfg_scalar(config, "dwt_softthr_k", 0.0)),
            wiener_alpha=float(cfg_scalar(config, "wiener_alpha", 0.5)),
            wiener_eps=float(cfg_scalar(config, "wiener_eps", 1e-6)),
        )

    @classmethod
    def from_config(cls, config, data) -> "SMOREX":
        return cls(**cls.config_kwargs(config, data))


MODEL = SMOREX
