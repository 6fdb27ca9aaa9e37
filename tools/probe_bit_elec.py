"""Isolate the bit_dual_matmul kernel at elec scale: compile time + step time
per block_u choice.

Usage: python tools/probe_bit_elec.py [--users 192512 --items 63001 --dim 64]
       [--blocks 64,128,256]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=192512)
    ap.add_argument("--items", type=int, default=63001)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--nnz", type=int, default=1689188)
    ap.add_argument("--blocks", default="64,128")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from recommendar_systems_tpu.ops import bitbip

    U = args.users
    ip = bitbip.pad_cols(args.items)
    K = ip // 32
    d = args.dim
    rng = np.random.default_rng(0)
    print(f"U={U} Ip={ip} K={K} d={d}", flush=True)

    packed = np.zeros((U, K), np.uint32)
    u = rng.integers(0, U, args.nnz)
    i = rng.integers(0, args.items, args.nnz)
    np.bitwise_or.at(packed, (u, i // 32), np.uint32(1) << (i % 32).astype(np.uint32))
    packed = jnp.asarray(packed.view(np.int32))
    xu = jnp.asarray(rng.standard_normal((U, d)), jnp.bfloat16)
    xi = jnp.asarray(rng.standard_normal((ip, d)), jnp.bfloat16)

    for bu in [int(b) for b in args.blocks.split(",")]:
        bitbip.set_block_u(bu)
        run = jax.jit(lambda p, a, b: bitbip.bit_dual_matmul(p, a, b))
        t0 = time.time()
        try:
            top, bot = run(packed, xu, xi)
            s = float(np.asarray(top[:8, :8]).sum()) + float(np.asarray(bot[:8, :8]).sum())
            t_compile = time.time() - t0
            t0 = time.time()
            for _ in range(args.iters):
                top, bot = run(packed, xu, xi)
            float(np.asarray(top[:1, :1]).sum())
            dt = (time.time() - t0) / args.iters
            print(f"bu={bu:4d}  compile+first {t_compile:7.1f}s   "
                  f"{dt*1e3:9.3f} ms/iter   (chk {s:.3f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bu={bu:4d}  FAILED after {time.time()-t0:.1f}s: "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)
        finally:
            bitbip.set_block_u(None)
        run.clear_cache()


if __name__ == "__main__":
    main()
