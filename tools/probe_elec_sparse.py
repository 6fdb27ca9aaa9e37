"""Isolate the elec-scale TPU worker crash: run ONLY the COO-propagation
forward+backward at a given scale (no trainer, no eval).

Usage: python tools/probe_elec_sparse.py [--users N --items N --inters N]
       [--layers 4] [--grad] [--scan N]
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
    ap.add_argument("--users", type=int, default=192403)
    ap.add_argument("--items", type=int, default=63001)
    ap.add_argument("--inters", type=int, default=1689188)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--scan", type=int, default=0,
                    help="wrap in a scan of N steps (mimic the epoch loop)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from recommendar_systems_tpu.graph.build import build_norm_adj
    from recommendar_systems_tpu.graph.sparse import set_bit_adj, spmm
    from recommendar_systems_tpu.models.layers import lightgcn_propagate

    set_bit_adj(False)
    rng = np.random.default_rng(0)
    u = rng.integers(0, args.users, args.inters)
    i = rng.integers(0, args.items, args.inters)
    print(f"building adj {args.users}x{args.items} nnz={args.inters}", flush=True)
    adj = build_norm_adj(u, i, args.users, args.items, dense=False)
    print(f"adj type: {type(adj).__name__}", flush=True)

    n = args.users + args.items
    x = jnp.asarray(rng.standard_normal((n, args.dim)), jnp.float32)

    def fwd(x):
        out = lightgcn_propagate(adj, x, args.layers)
        return jnp.sum(out * x)

    fn = jax.grad(fwd) if args.grad else fwd
    if args.scan:
        # carry-dependent body so XLA cannot hoist the propagation out of
        # the loop — each iteration really runs (mimics the epoch scan)
        def scanned(x):
            def body(c, _):
                r = fn(x * (1.0 + 1e-9 * c))
                r = r if args.grad else jnp.broadcast_to(r, (1,))
                return c + 1e-12 * jnp.sum(r), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.scan)
            return c
        run = jax.jit(scanned)
    else:
        run = jax.jit(lambda x: jnp.sum(fn(x)) if args.grad else fn(x))

    print("compiling...", flush=True)
    t0 = time.time()
    r = run(x)
    v = float(np.asarray(r))
    print(f"ok: {v:.4f}  (compile+run {time.time()-t0:.1f}s)", flush=True)
    t0 = time.time()
    v = float(np.asarray(run(x)))
    print(f"steady: {time.time()-t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
