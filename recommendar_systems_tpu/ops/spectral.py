"""Spectral ops for the SMORE family: rFFT filters, Haar DWT, Wiener shrink.

Counterparts of the reference's torch.fft usage:
- ``spectral_filter``: rfft over the embedding dim, multiply by a learnable
  complex filter, irfft back (`smore.py:209-237`, norm='ortho').  Small dims
  (<= ``MATML_DFT_MAX_DIM``) lower as explicit DFT matmuls for the MXU.
- ``unit_magnitude``: phase-preserving unit-modulus normalization of the
  filter (`smore.py:221-229`).
- ``band_energies``: low/mid/high spectral band energy fractions for the
  diagnostics surface (`smore.py:239-252`).
- ``haar_dwt1``/``haar_idwt1``: single-level Haar wavelet transform pair used
  by SMOREX/SMOREDiff denoisers (`smorex.py:126-176`, `smorediff.py:234-276`).
- ``wiener_shrink``: James-Stein/Wiener shrinkage of detail coefficients
  (`smorex.py:150-176`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def complex_from_pair(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 2] real parameter -> complex (torch.view_as_complex parity)."""
    return jax.lax.complex(w[..., 0], w[..., 1])


# ---------------------------------------------------------------------------
# rFFT/irFFT as explicit DFT matmuls.
#
# For the embedding dims used here (d <= a few hundred) the DFT as two real
# [d, d/2+1] matmuls is MXU-friendly and at least as fast as an FFT kernel —
# and it avoids the FFT op entirely, which the axon TPU backend fails to
# compile inside large fused programs (SMOREX-fft vs SMOREX-wiener compat
# probe).  Exact to float tolerance vs jnp.fft (ortho norm), including the
# hermitian-doubling bookkeeping for the inverse.
# ---------------------------------------------------------------------------
from functools import lru_cache as _lru_cache

MATML_DFT_MAX_DIM = 512


@_lru_cache(maxsize=16)
def _dft_mats(d: int):
    n = np.arange(d)[:, None]
    k = np.arange(d // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / d
    scale = 1.0 / np.sqrt(d)
    fwd_cos = jnp.asarray(np.cos(ang) * scale, dtype=jnp.float32)   # [d, F]
    fwd_sin = jnp.asarray(-np.sin(ang) * scale, dtype=jnp.float32)  # [d, F]
    c = np.full(d // 2 + 1, 2.0)
    c[0] = 1.0
    if d % 2 == 0:
        c[-1] = 1.0
    inv_cos = jnp.asarray((np.cos(ang) * c[None, :] * scale).T, dtype=jnp.float32)  # [F, d]
    inv_sin = jnp.asarray((-np.sin(ang) * c[None, :] * scale).T, dtype=jnp.float32)
    return fwd_cos, fwd_sin, inv_cos, inv_sin


def rfft_mm(x: jnp.ndarray):
    """(real, imag) of the ortho rFFT along the last axis via matmul."""
    fwd_cos, fwd_sin, _, _ = _dft_mats(x.shape[-1])
    return x @ fwd_cos, x @ fwd_sin


def irfft_mm(re: jnp.ndarray, im: jnp.ndarray, d: int) -> jnp.ndarray:
    """Ortho irFFT of hermitian-half spectra via matmul."""
    _, _, inv_cos, inv_sin = _dft_mats(d)
    return re @ inv_cos + im @ inv_sin


def rfft_ortho(x: jnp.ndarray) -> jnp.ndarray:
    """Complex ortho rFFT along the last axis (matmul DFT for small dims)."""
    if x.shape[-1] <= MATML_DFT_MAX_DIM:
        re, im = rfft_mm(x)
        return jax.lax.complex(re, im)
    return jnp.fft.rfft(x, axis=-1, norm="ortho")


def irfft_ortho(y: jnp.ndarray, d: int) -> jnp.ndarray:
    """Real ortho irFFT of hermitian-half spectra along the last axis."""
    if d <= MATML_DFT_MAX_DIM:
        return irfft_mm(y.real, y.imag, d)
    return jnp.fft.irfft(y, n=d, axis=-1, norm="ortho")


def unit_magnitude(wc: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return wc / (jnp.abs(wc) + eps)


def spectral_filter(
    x: jnp.ndarray, weight_pair: jnp.ndarray, normalize_weight: bool = True
) -> jnp.ndarray:
    """irfft( rfft(x) * W ) along the last axis with ortho norm."""
    d = x.shape[-1]
    xf = rfft_ortho(x)
    w = complex_from_pair(weight_pair)
    if normalize_weight:
        w = unit_magnitude(w)
    return irfft_ortho(xf * w, d)


def cross_spectral_fusion(
    a: jnp.ndarray,
    b: jnp.ndarray,
    weight_pair: jnp.ndarray,
    normalize_weight: bool = True,
) -> jnp.ndarray:
    """irfft( rfft(a) * rfft(b) * W ): circular cross-modal convolution
    (`smore.py:236-237`)."""
    d = a.shape[-1]
    af = rfft_ortho(a)
    bf = rfft_ortho(b)
    w = complex_from_pair(weight_pair)
    if normalize_weight:
        w = unit_magnitude(w)
    return irfft_ortho(af * bf * w, d)


def band_energies(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(low, mid, high) mean-energy fractions of rfft(x) (`smore.py:239-252`)."""
    xf = rfft_ortho(x)
    mag2 = (xf.real ** 2 + xf.imag ** 2).mean(axis=0)
    F = mag2.shape[0]
    lo = mag2[: max(1, F // 3)].sum()
    mid = mag2[max(1, F // 3) : max(2, 2 * F // 3)].sum()
    hi = mag2[max(2, 2 * F // 3) :].sum()
    total = lo + mid + hi + 1e-12
    return lo / total, mid / total, hi / total


def haar_dwt1(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-level Haar DWT along the last axis (even length assumed;
    odd lengths are zero-padded).  Returns (approx, detail)."""
    d = x.shape[-1]
    if d % 2 == 1:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, 1)])
    even = x[..., 0::2]
    odd = x[..., 1::2]
    s = (even + odd) / jnp.sqrt(2.0)
    w = (even - odd) / jnp.sqrt(2.0)
    return s, w


def haar_idwt1(s: jnp.ndarray, w: jnp.ndarray, out_len: int) -> jnp.ndarray:
    even = (s + w) / jnp.sqrt(2.0)
    odd = (s - w) / jnp.sqrt(2.0)
    x = jnp.stack([even, odd], axis=-1).reshape(*s.shape[:-1], -1)
    return x[..., :out_len]


def soft_threshold(w: jnp.ndarray, thresh: jnp.ndarray) -> jnp.ndarray:
    return jnp.sign(w) * jnp.maximum(jnp.abs(w) - thresh, 0.0)


def wiener_shrink(w: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """James-Stein/Wiener shrinkage per coefficient column: scale by
    var/(var + noise) with noise estimated from the median absolute value."""
    noise = jnp.median(jnp.abs(w)) / 0.6745 + eps
    var = jnp.mean(w * w, axis=0, keepdims=True)
    gain = var / (var + noise ** 2)
    return w * gain
