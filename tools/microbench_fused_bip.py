"""Microbenchmark + correctness check for ops/fused_bip.py.

Compares, at (padded) baby scale:
  xla2   : top = A @ xi ; bot = A.T @ xu        (two HBM passes over A)
  fused  : fused_bip_matmul(A, xu, xi)          (one HBM pass, Pallas)

Run on the real TPU:  python tools/microbench_fused_bip.py
CPU correctness only: python tools/microbench_fused_bip.py --cpu --iters 1
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=19456)  # 19445 padded to 256
    p.add_argument("--items", type=int, default=7168)   # 7050 padded to 128
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16", "int8"])
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from recommendar_systems_tpu.ops.fused_bip import fused_bip_matmul

    U, I, d = args.users, args.items, args.dim
    rng = np.random.default_rng(0)
    a_np = (rng.random((U, I), dtype=np.float32) < 0.001).astype(np.float32)
    if args.dtype == "int8":
        a = jnp.asarray(a_np.astype(np.int8))
    else:
        a_np *= rng.random((U, I), dtype=np.float32)
        a = jnp.asarray(a_np, dtype=args.dtype)
    xu = jnp.asarray(rng.standard_normal((U, d), dtype=np.float32))
    xi = jnp.asarray(rng.standard_normal((I, d), dtype=np.float32))
    abytes = U * I * a.dtype.itemsize

    def xla2(a, xu, xi):
        af = a.astype(jnp.bfloat16) if a.dtype == jnp.int8 else a
        top = jnp.matmul(af, xi.astype(af.dtype),
                         preferred_element_type=jnp.float32)
        bot = jnp.matmul(af.T, xu.astype(af.dtype),
                         preferred_element_type=jnp.float32)
        return top, bot

    fused = fused_bip_matmul

    def scanned(fn):
        # amortize the per-dispatch tunnel overhead: k iterations in one jit,
        # feeding (top, bot) back as (xu, xi) so no iteration is dead code
        @jax.jit
        def run(a, xu, xi):
            def body(carry, _):
                u, i = carry
                t, b = fn(a, u, i)
                return (t / (jnp.max(jnp.abs(t)) + 1.0),
                        b / (jnp.max(jnp.abs(b)) + 1.0)), ()
            (u, i), _ = jax.lax.scan(body, (xu, xi), None, length=args.iters)
            return u, i
        return run

    def _sync(o):
        return float(np.asarray(o[0]).reshape(-1)[0]) + float(
            np.asarray(o[1]).reshape(-1)[0]
        )

    # correctness first (single call, CPU or TPU)
    ref = jax.jit(xla2)(a, xu, xi)
    out = jax.jit(fused)(a, xu, xi)
    for r, o, tag in [(ref[0], out[0], "top"), (ref[1], out[1], "bot")]:
        err = float(jnp.max(jnp.abs(r - o)) / (jnp.max(jnp.abs(r)) + 1e-9))
        print(f"{tag} max rel err vs xla2: {err:.2e}")

    for name, fn, passes in [("xla2", xla2, 2), ("fused", fused, 1)]:
        try:
            run = scanned(fn)
            o = run(a, xu, xi)
            _sync(o)  # compile + warm
            t0 = time.time()
            o = run(a, xu, xi)
            _sync(o)
            dt = (time.time() - t0) / args.iters
            eff = abytes * passes / dt / 1e9  # raw A bytes actually read
            print(f"{name:6s} {dt*1e3:8.2f} ms/iter   A-read bw {eff:7.1f} GB/s "
                  f"(x{passes} pass)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:6s} FAILED: {type(e).__name__}: {str(e)[:400]}")

    # gradient correctness (custom VJP)
    def loss_fused(xu, xi):
        t, b = fused_bip_matmul(a, xu, xi)
        return jnp.sum(t * t) + jnp.sum(b)

    def loss_xla(xu, xi):
        t, b = xla2(a, xu, xi)
        return jnp.sum(t * t) + jnp.sum(b)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(xu, xi)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(xu, xi)
    for gf, gx, tag in [(g1[0], g2[0], "d_xu"), (g1[1], g2[1], "d_xi")]:
        err = float(jnp.max(jnp.abs(gf - gx)) / (jnp.max(jnp.abs(gx)) + 1e-9))
        print(f"grad {tag} max rel err: {err:.2e}")


if __name__ == "__main__":
    main()
