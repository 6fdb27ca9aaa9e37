"""Microbench ops/flash_nce.py vs plain XLA logsumexp at MENTOR scale."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from recommendar_systems_tpu.ops.flash_nce import row_lse

N, d = 19445, 128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
k = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
w = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))


def xla_lse(q, k):
    b = jnp.bfloat16
    s = jnp.matmul(q.astype(b), k.astype(b).T,
                   preferred_element_type=jnp.float32)
    return jax.nn.logsumexp(s, axis=1)


def bench(name, fn, iters=20):
    run = jax.jit(lambda q, k: jax.lax.scan(
        lambda c, _: (c + 1e-6 * fn(q + c * 0.0, k).mean(), ()),
        0.0, None, length=iters)[0])
    float(np.asarray(run(q, k)))  # compile+warm
    t0 = time.time()
    float(np.asarray(run(q, k)))
    print(f"{name:16s} {(time.time()-t0)/iters*1e3:8.2f} ms/iter", flush=True)


def gradf(fn):
    return lambda q, k: jax.grad(
        lambda q, k: jnp.sum(fn(q, k) * w), argnums=0)(q, k).mean(
    ) + jax.grad(lambda q, k: jnp.sum(fn(q, k) * w), argnums=1)(q, k).mean()


def bench_grad(name, fn, iters=10):
    g = gradf(fn)
    run = jax.jit(lambda q, k: jax.lax.scan(
        lambda c, _: (c + 1e-6 * g(q + c * 0.0, k), ()),
        0.0, None, length=iters)[0])
    float(np.asarray(run(q, k)))
    t0 = time.time()
    float(np.asarray(run(q, k)))
    print(f"{name:16s} {(time.time()-t0)/iters*1e3:8.2f} ms/iter", flush=True)


print("backend:", jax.default_backend(), flush=True)
err = float(jnp.max(jnp.abs(row_lse(q, k) - xla_lse(q, k))))
print("fwd max abs err:", err, flush=True)
bench("xla fwd", xla_lse)
bench("flash fwd", row_lse)
bench_grad("xla fwd+bwd", xla_lse)
bench_grad("flash fwd+bwd", row_lse)
