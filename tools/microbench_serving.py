"""Serving-path microbenchmark: masked top-k queries/s on the real chip.

Measures the ServingEngine hot path (scores matmul + seen scatter-mask +
`lax.top_k`) at baby-scale catalog shapes over request batch sizes, two
ways:

- **wall**: median end-to-end `eng.topk()` latency (includes the axon
  tunnel's ~100-250 ms dispatch latency — the deployment-relevant number
  on a LOCAL runtime is far lower, see PARITY.md eval roofline);
- **device**: in-dispatch repetition — R query batches scanned inside one
  jitted program — isolating the per-query device cost.

Usage: python tools/microbench_serving.py [--cpu] [--int8]
Prints one JSON line per batch size plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--approx", action="store_true",
                   help="rank with lax.approx_max_k (wide-catalog MIPS path)")
    p.add_argument("--users", type=int, default=19445)
    p.add_argument("--items", type=int, default=7050)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--reps", type=int, default=50, help="in-dispatch batches")
    p.add_argument("--walls", type=int, default=9, help="wall-timed calls")
    p.add_argument("--max-batch", type=int, default=4096,
                   help="cap request batch (a [B, I] f32 score block must "
                        "fit HBM: 4096x1M = 16 GB)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from recommendar_systems_tpu.serve.engine import ServingEngine
    from recommendar_systems_tpu.serve.export import quantize_item_table

    rng = np.random.default_rng(0)
    U, I, d = args.users, args.items, args.dim
    ue = rng.normal(size=(U, d)).astype(np.float32)
    ie = rng.normal(size=(I, d)).astype(np.float32)
    # synthetic power-law-ish seen lists, ~7 per user, CSR form
    deg = np.clip(rng.zipf(1.6, size=U), 1, 60)
    indptr = np.zeros(U + 1, dtype=np.int32)
    np.cumsum(deg, out=indptr[1:])
    pos = rng.integers(0, I, size=int(indptr[-1])).astype(np.int32)

    meta = {"n_users": U, "n_items": I, "dim": d, "mode": "embedding",
            "quantized_int8": args.int8, "model": "bench", "dataset": "bench"}
    arrays = {"user_emb": ue, "item_emb": ie,
              "pos_indptr": indptr, "pos_items": pos}
    if args.int8:
        q, s = quantize_item_table(ie)
        arrays["item_q"], arrays["item_scale"] = q, s
    eng = ServingEngine(meta, arrays)

    for B in (16, 64, 256, 1024, 4096):
        if B > args.max_batch:
            continue
        ids = rng.integers(0, U, size=B).astype(np.int32)
        eng.topk(ids, k=args.k, approx=args.approx)  # compile
        walls = []
        for _ in range(args.walls):
            t0 = time.perf_counter()
            items, _ = eng.topk(ids, k=args.k, approx=args.approx)
            np.asarray(items).sum()  # force host sync (CLAUDE.md)
            walls.append(time.perf_counter() - t0)
        wall_ms = float(np.median(walls) * 1e3)

        # in-dispatch repetition: R different batches under one jit; the
        # tables ride as ARGUMENTS of the outer jit too (closure constants
        # blow the axon remote-compile request at 1M-item scale)
        R = args.reps
        batches = jnp.asarray(
            rng.integers(0, U, size=(R, B)).astype(np.int32))
        jfn, pre, ops = eng._topk_parts(args.k, True, B, args.approx)

        def rep(ue_, seen_, bs, *ops_):
            def body(c, u):
                v, i = jfn(ue_, seen_, u, *ops_)
                return c + i.sum(), None
            out, _ = jax.lax.scan(body, jnp.int32(0), bs)
            return out

        repj = jax.jit(rep)
        np.asarray(repj(*pre, batches, *ops)).sum()  # compile
        t0 = time.perf_counter()
        np.asarray(repj(*pre, batches, *ops)).sum()
        dt = time.perf_counter() - t0
        dev_us_per_batch = dt / R * 1e6
        print(json.dumps({
            "bench": "serving_topk", "batch": B, "int8": args.int8,
            "approx": args.approx,
            "wall_ms_median": round(wall_ms, 3),
            "wall_qps": round(B / (wall_ms / 1e3)),
            "device_us_per_batch": round(dev_us_per_batch, 1),
            "device_qps": round(B / (dev_us_per_batch / 1e6)),
        }))


if __name__ == "__main__":
    main()
