"""Loss functions with reference-identical semantics.

Counterparts of `/root/reference/src/common/loss.py`:
- ``bpr_loss``: mean of ``-log(gamma + sigmoid(pos - neg))`` (`loss.py:9-35`).
- ``emb_loss``: sum of Frobenius norms of the given embedding batches divided
  by the last batch's size (`loss.py:38-51` — note: norm, not squared norm).
- ``l2_loss``: 0.5 * sum of squares (`loss.py:54-62`).

All take an optional ``weight`` vector so zero-weight padding rows (our
static-shape replacement for the reference's smaller final batch) drop out of
the means exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _wmean(x: jnp.ndarray, weight: Optional[jnp.ndarray]) -> jnp.ndarray:
    if weight is None:
        return x.mean()
    return (x * weight).sum() / jnp.maximum(weight.sum(), 1.0)


def bpr_loss(
    pos_score: jnp.ndarray,
    neg_score: jnp.ndarray,
    gamma: float = 1e-10,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    return _wmean(-jnp.log(gamma + jax.nn.sigmoid(pos_score - neg_score)), weight)


def bpr_loss_log2(
    pos_score: jnp.ndarray,
    neg_score: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """The DualGNN/DRAGON/MENTOR flavor: ``-sum(log2(sigmoid(pos-neg)))``
    averaged over the batch (reference `dualgnn.py:182-197`).

    Computed as ``softplus(neg - pos) / ln 2`` — algebraically identical but
    stable where ``sigmoid`` underflows to 0 in f32 (pos - neg < -88), which
    otherwise turns the loss into inf and the gradients into NaN."""
    return _wmean(
        jax.nn.softplus(neg_score - pos_score) / jnp.log(2.0), weight
    )


def emb_loss(
    *embeddings: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    norm: int = 2,
) -> jnp.ndarray:
    """Sum of p-norms over batches / batch size (reference `loss.py:38-51`).

    With ``weight`` given, padding rows are zeroed before the norm and the
    divisor is the number of real rows.
    """
    total = 0.0
    denom = embeddings[-1].shape[0]
    for e in embeddings:
        if weight is not None and e.ndim >= 1 and e.shape[0] == weight.shape[0]:
            e = e * weight.reshape((-1,) + (1,) * (e.ndim - 1))
        if norm == 2:
            total = total + jnp.sqrt(jnp.sum(e * e) + 1e-24)
        else:
            total = total + jnp.sum(jnp.abs(e) ** norm) ** (1.0 / norm)
    if weight is not None:
        denom = jnp.maximum(weight.sum(), 1.0)
    return total / denom


def l2_loss(*embeddings: jnp.ndarray) -> jnp.ndarray:
    total = 0.0
    for e in embeddings:
        total = total + 0.5 * jnp.sum(e * e)
    return total


def batch_sq_reg(
    *embeddings: jnp.ndarray,
    batch_size: int,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """SMORE/MGCN-style regularizer: ``0.5 * sum(e^2)`` over the gathered
    batch embeddings divided by the *configured* batch size
    (`smore.py:366-372` divides by ``self.batch_size``, not the actual
    batch length)."""
    total = 0.0
    for e in embeddings:
        if weight is not None and e.shape[0] == weight.shape[0]:
            e = e * weight.reshape((-1,) + (1,) * (e.ndim - 1))
        total = total + 0.5 * jnp.sum(e * e)
    return total / batch_size


def infonce(
    view1: jnp.ndarray,
    view2: jnp.ndarray,
    temperature: float,
    weight: Optional[jnp.ndarray] = None,
    b_cos: bool = True,
) -> jnp.ndarray:
    """In-batch InfoNCE between two aligned views (reference `mgcn.py:222-231`):
    positives are matching rows, negatives all other rows of ``view2``.

    ``weight`` doubles as the padding mask: zero-weight rows are excluded
    from the mean AND masked out of every denominator, so the static-shape
    padded batch computes exactly the reference's partial-batch value.
    """
    if b_cos:
        view1 = view1 / (jnp.linalg.norm(view1, axis=1, keepdims=True) + 1e-12)
        view2 = view2 / (jnp.linalg.norm(view2, axis=1, keepdims=True) + 1e-12)
    pos = jnp.sum(view1 * view2, axis=1) / temperature
    if weight is None and view1.shape[0] >= 4096:
        # full-table InfoNCE (MENTOR noise views, `mentor.py:441-446`):
        # autodiff would save the [N, N] logits as a residual (1.5 GB at
        # baby scale); the flash-lse kernel keeps everything [N, N]-shaped
        # in VMEM and recomputes in its VJP
        from recommendar_systems_tpu.ops.flash_nce import fits_vmem, row_lse

        if fits_vmem(view2.shape[0], view2.shape[1]):
            lse = row_lse(view1 / temperature, view2)
            return jnp.mean(lse - pos)
    logits = (view1 @ view2.T) / temperature
    if weight is not None:
        logits = jnp.where(weight[None, :] > 0, logits, -jnp.inf)
    lse = jax.nn.logsumexp(logits, axis=1)
    return _wmean(-(pos - lse), weight)
