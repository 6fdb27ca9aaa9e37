"""Segment ops for edge-level attention (GRCN's GATConv routing).

``segment_softmax`` reproduces torch-geometric's ``softmax(alpha,
index)`` (`/root/reference/src/models/grcn.py:63-74`): a numerically
stable softmax over edges grouped by their destination node.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_softmax(
    values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    seg_max = jax.ops.segment_max(
        values, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.exp(values - seg_max[segment_ids])
    seg_sum = jax.ops.segment_sum(
        ex, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return ex / (seg_sum[segment_ids] + 1e-16)


def scatter_weighted_sum(
    src_values: jnp.ndarray,
    weights: jnp.ndarray,
    dst_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """sum_e w_e * src_values[e] grouped by destination (SAGE/GAT message)."""
    return jax.ops.segment_sum(
        src_values * weights.reshape(-1, 1), dst_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
