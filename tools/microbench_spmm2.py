"""Scan-amortized SpMM microbenchmark: isolates true per-op device cost.

Single-dispatch timings through the axon tunnel carry ~2ms of host/RTT
overhead, so each candidate op is run REPS times inside one jitted
``lax.scan`` (carrying the output so XLA cannot dead-code it) and the
per-iteration time is reported.  Decomposes the SpMM into:

- gather only            x[col]                         (nnz x d read)
- scatter only           segment_sum(y, row)            (nnz x d reduce)
- full spmm_coo          gather * val -> segment_sum
- cumsum-spmm            gather * val -> cumsum -> boundary gather
- ELL gather-sum         x[idx] * val -> sum over k
- dense roofline         [m, m] @ [m, d] of equal MACs

Usage: python tools/microbench_spmm2.py [--reps 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_time(fn, x, reps):
    """Per-iteration seconds of fn applied reps times inside one jit."""
    import jax
    from jax import lax

    @jax.jit
    def loop(x0):
        def body(c, _):
            return fn(c), None

        out, _ = lax.scan(body, x0, None, length=reps)
        return out

    r = loop(x)  # compile + warm
    np.asarray(jax.tree_util.tree_leaves(r)[0]).sum()
    t0 = time.time()
    r = loop(x)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).sum()
    return (time.time() - t0) / reps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=19445)
    ap.add_argument("--items", type=int, default=7050)
    ap.add_argument("--nnz", type=int, default=272000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from recommendar_systems_tpu.graph.build import build_norm_adj
    from recommendar_systems_tpu.graph.sparse import ELL, spmm_coo, spmm_ell

    rng = np.random.default_rng(0)
    E = args.nnz // 2
    u = rng.integers(0, args.users, E)
    i = rng.integers(0, args.items, E)
    adj = build_norm_adj(u, i, args.users, args.items)
    N = args.users + args.items
    d = args.dim
    x = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    nnz = adj.nnz
    row, col, val = adj.rows, adj.cols, adj.vals

    # stream bytes of the SpMM: gather nnz*d read + out write (+8B idx)
    bytes_spmm = nnz * (d * 4 * 2 + 8)

    def report(name, t, bts=None):
        gbs = f"  (~{bts / t / 1e9:.0f} GB/s)" if bts else ""
        print(f"{name}: {t * 1e3:.3f} ms{gbs}", flush=True)

    # keep output shape == input shape so scan can carry it
    def renorm(y):
        return y / (jnp.linalg.norm(y) + 1.0)

    t = scan_time(lambda c: renorm(spmm_coo(adj, c)), x, args.reps)
    report("spmm_coo", t, bytes_spmm)

    # gather-only: materialize x[col], reduce back to [N, d] with a cheap
    # reshape-sum over a fixed factor so the carry keeps shape
    pad = (-nnz) % N
    factor = (nnz + pad) // N

    def gather_reduce(c):
        g = c[col]
        g = jnp.concatenate([g, jnp.zeros((pad, d), g.dtype)], axis=0)
        return renorm(g.reshape(N, factor, d).sum(axis=1))

    t = scan_time(gather_reduce, x, args.reps)
    report(f"gather+reshape-sum (no scatter)", t, bytes_spmm)

    seg = jax.ops.segment_sum

    def scatter_only(c):
        src = jnp.broadcast_to(c.mean(axis=0, keepdims=True), (nnz, d))
        return renorm(seg(src, row, num_segments=N, indices_are_sorted=True))

    t = scan_time(scatter_only, x, args.reps)
    report("segment_sum only (broadcast src)", t, nnz * (d * 4 + 4) + N * d * 4)

    indptr = np.zeros(N + 1, np.int64)
    np.add.at(indptr, np.asarray(adj.rows) + 1, 1)
    indptr = np.cumsum(indptr)
    end_idx = jnp.asarray((indptr[1:] - 1).astype(np.int32))
    start_idx = jnp.asarray((indptr[:-1] - 1).astype(np.int32))
    has = jnp.asarray((indptr[1:] > indptr[:-1]).astype(np.float32))[:, None]

    def spmm_cumsum(c):
        y = val[:, None] * c[col]
        cs = jnp.cumsum(y, axis=0)
        out = (cs[end_idx] - jnp.where(start_idx[:, None] >= 0, cs[jnp.maximum(start_idx, 0)], 0.0)) * has
        return renorm(out)

    t = scan_time(spmm_cumsum, x, args.reps)
    report("cumsum-spmm", t, bytes_spmm)

    k = max(1, nnz // N)
    idx = jnp.asarray(rng.integers(0, N, (N, k)).astype(np.int32))
    ev = jnp.asarray(rng.normal(size=(N, k)).astype(np.float32))
    ell = ELL(idx, ev, N)
    t = scan_time(lambda c: renorm(spmm_ell(ell, c)), x, args.reps)
    report(f"spmm_ell (k={k})", t, N * k * (d * 4 * 2 + 8))

    m = max(64, int(np.sqrt(nnz)))
    a = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32))

    def dense_step(c):
        return renorm(a @ c[:m]).sum() * 0 + c

    t = scan_time(dense_step, x, args.reps)
    report(f"dense {m}x{m}x{d}", t)

    # bf16 spmm
    from recommendar_systems_tpu.graph.sparse import set_spmm_dtype

    set_spmm_dtype("bfloat16")
    t = scan_time(lambda c: renorm(spmm_coo(adj, c)), x, args.reps)
    set_spmm_dtype(None)
    report("spmm_coo bf16", t, nnz * (d * 2 * 2 + 8))


if __name__ == "__main__":
    main()
