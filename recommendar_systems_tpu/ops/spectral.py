"""Spectral ops for the SMORE family: rFFT filters, Haar DWT, Wiener shrink.

Counterparts of the reference's torch.fft usage:
- ``spectral_filter``: rfft over the embedding dim, multiply by a learnable
  complex filter, irfft back (`smore.py:209-237`, norm='ortho').  XLA lowers
  jnp.fft natively on TPU.
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


def complex_from_pair(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 2] real parameter -> complex (torch.view_as_complex parity)."""
    return jax.lax.complex(w[..., 0], w[..., 1])


def unit_magnitude(wc: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return wc / (jnp.abs(wc) + eps)


def spectral_filter(
    x: jnp.ndarray, weight_pair: jnp.ndarray, normalize_weight: bool = True
) -> jnp.ndarray:
    """irfft( rfft(x) * W ) along the last axis with ortho norm."""
    d = x.shape[-1]
    xf = jnp.fft.rfft(x, axis=-1, norm="ortho")
    w = complex_from_pair(weight_pair)
    if normalize_weight:
        w = unit_magnitude(w)
    return jnp.fft.irfft(xf * w, n=d, axis=-1, norm="ortho")


def cross_spectral_fusion(
    a: jnp.ndarray,
    b: jnp.ndarray,
    weight_pair: jnp.ndarray,
    normalize_weight: bool = True,
) -> jnp.ndarray:
    """irfft( rfft(a) * rfft(b) * W ): circular cross-modal convolution
    (`smore.py:236-237`)."""
    d = a.shape[-1]
    af = jnp.fft.rfft(a, axis=-1, norm="ortho")
    bf = jnp.fft.rfft(b, axis=-1, norm="ortho")
    w = complex_from_pair(weight_pair)
    if normalize_weight:
        w = unit_magnitude(w)
    return jnp.fft.irfft(af * bf * w, n=d, axis=-1, norm="ortho")


def band_energies(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(low, mid, high) mean-energy fractions of rfft(x) (`smore.py:239-252`)."""
    xf = jnp.fft.rfft(x, axis=-1, norm="ortho")
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
