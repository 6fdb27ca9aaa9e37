"""Compile + run the fused GRCN kernels on the real TPU (tiny shapes)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from recommendar_systems_tpu.ops.grcn_fused import (  # noqa: E402
    dual_colstats,
    gated_dual_hop,
)

print("backend:", jax.default_backend(), flush=True)
U, I, c, d = 256, 256, 16, 24
rng = np.random.default_rng(0)
mask = np.zeros((U, I), np.int8)
nz = rng.random((U, I)) < 0.1
mask[nz] = 1
mask = jnp.asarray(mask)
q1 = jnp.asarray(rng.normal(size=(U, c)).astype(np.float32))
k1 = jnp.asarray(rng.normal(size=(I, c)).astype(np.float32))
q2 = jnp.asarray(rng.normal(size=(U, c)).astype(np.float32))
k2 = jnp.asarray(rng.normal(size=(I, c)).astype(np.float32))
cu = jnp.asarray(rng.normal(size=(U, 2)).astype(np.float32))
ci = jnp.asarray(rng.normal(size=(I, 2)).astype(np.float32))
zu = jnp.asarray(rng.normal(size=(U, d)).astype(np.float32))
zi = jnp.asarray(rng.normal(size=(I, d)).astype(np.float32))


def loss(q1, k1, q2, k2, cu, ci, zu, zi):
    stats = dual_colstats(q1, k1, q2, k2, mask)
    outs = gated_dual_hop(q1, k1, q2, k2, cu, ci, zu, zi, stats, mask)
    return sum(jnp.sum(o**2) for o in outs)


print("fwd...", flush=True)
stats = dual_colstats(q1, k1, q2, k2, mask)
print("stats ok", float(np.asarray(stats).sum()), flush=True)
outs = gated_dual_hop(q1, k1, q2, k2, cu, ci, zu, zi, stats, mask)
print("fwd ok", [float(np.asarray(o).sum()) for o in outs], flush=True)
g = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6, 7))(
    q1, k1, q2, k2, cu, ci, zu, zi
)
print("bwd ok", [float(np.asarray(x).sum()) for x in g], flush=True)
print("ALL OK", flush=True)
