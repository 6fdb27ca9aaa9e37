"""Shared building blocks: initializers and graph propagation.

``lightgcn_propagate`` is the K-layer linear propagation + layer mean used by
the whole graph-model family (reference `lightgcn.py:117-130`,
`encoders.py:93-115`): repeated SpMM over the normalized adjacency with the
layer stack averaged.  It is expressed with ``lax.scan``-free Python
unrolling because K is a small static config value; XLA fuses the gathers.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
from flax import linen as nn

from recommendar_systems_tpu.graph.sparse import spmm

# torch xavier on an [n, d] tensor == glorot on (n, d): std^2 = 2/(n+d)
xavier_normal = nn.initializers.glorot_normal()
xavier_uniform = nn.initializers.glorot_uniform()

# torch nn.Linear DEFAULT inits: kernel kaiming_uniform(a=sqrt(5)) ==
# U(+-1/sqrt(fan_in)); bias U(+-1/sqrt(fan_in)).  Models that build plain
# nn.Linear layers in the reference (without re-initializing them) get
# these, and the bias is NOT cosmetic: SLMRec's convergence basin hinges on
# the feature-projection bias (measured: recall@20 0.044 with zero bias vs
# 0.176 with the torch bias, everything else identical — see PARITY.md).
torch_linear_kernel = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_linear_bias(fan_in: int):
    """torch Linear default bias init U(+-1/sqrt(fan_in)); fan_in must be
    supplied because flax bias initializers don't see the input width."""
    import numpy as _np

    bound = 1.0 / float(_np.sqrt(fan_in))

    def init(key, shape, dtype=jnp.float32):
        import jax as _jax

        return _jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound
        )

    return init


class Dense(nn.Dense):
    """nn.Dense with torch-Linear-style xavier-normal kernel + zero bias
    (reference `init.py:8-24`)."""

    kernel_init: nn.initializers.Initializer = xavier_normal
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()


def lightgcn_propagate(
    adj,
    ego: jnp.ndarray,
    n_layers: int,
    mean_layers: bool = True,
    include_ego: bool = True,
) -> jnp.ndarray:
    """K-layer LightGCN propagation; returns the layer mean (or sum).

    Args:
        adj: COO/ELL normalized adjacency over the node axis of ``ego``.
        ego: [N, d] input embeddings.
        n_layers: number of propagation layers K (static).
        mean_layers: True => mean over [ego, h1..hK] (LightGCN); False => sum.
        include_ego: include the 0-th (ego) layer in the pooling.
    """
    from recommendar_systems_tpu.graph.sparse import pad_nodes, unpad_nodes

    # padded DenseBip blocks propagate in padded space (zero rows are inert):
    # one pad before the loop, one un-pad after, instead of per layer
    ego_p = pad_nodes(adj, ego)
    layers: List[jnp.ndarray] = [ego_p] if include_ego else []
    h = ego_p
    for _ in range(n_layers):
        h = spmm(adj, h)
        layers.append(h)
    stack = jnp.stack(layers, axis=1)
    out = stack.mean(axis=1) if mean_layers else stack.sum(axis=1)
    return unpad_nodes(adj, out)


def propagate_layers(adj, ego: jnp.ndarray, n_layers: int) -> List[jnp.ndarray]:
    """All intermediate layers [ego, h1, ..., hK] for models that post-process
    the per-layer stack (LayerGCN's layer refinement, SLMRec, etc.)."""
    layers = [ego]
    h = ego
    for _ in range(n_layers):
        h = spmm(adj, h)
        layers.append(h)
    return layers


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # rsqrt(sum_sq + eps) rather than x / (||x|| + eps): the norm's sqrt has
    # a NaN gradient at exactly-zero rows (which dropout produces)
    import jax

    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)
