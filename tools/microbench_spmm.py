"""Microbenchmark: SpMM strategies for the propagation hot path.

Measures on the current default device:
- spmm_coo (gather + sorted segment_sum) forward and forward+backward
- ELL gather-sum at equivalent nnz
- the on-device negative sampler
- a dense matmul of equal FLOPs as the roofline reference

Usage: python tools/microbench_spmm.py [--users 19445 --items 7050 --nnz 272000 --dim 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=2):
    import jax

    for _ in range(warmup):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).sum()
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).sum()
    return (time.time() - t0) / n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=19445)
    ap.add_argument("--items", type=int, default=7050)
    ap.add_argument("--nnz", type=int, default=272000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from recommendar_systems_tpu.graph.build import build_norm_adj
    from recommendar_systems_tpu.graph.sparse import ELL, spmm_coo, spmm_ell
    from recommendar_systems_tpu.data.sampling import sample_negatives
    from recommendar_systems_tpu.data.arrays import _build_pos_csr

    rng = np.random.default_rng(0)
    E = args.nnz // 2
    u = rng.integers(0, args.users, E)
    i = rng.integers(0, args.items, E)
    adj = build_norm_adj(u, i, args.users, args.items)
    N = args.users + args.items
    x = jnp.asarray(rng.normal(size=(N, args.dim)).astype(np.float32))

    f_fwd = jax.jit(lambda x: spmm_coo(adj, x))
    t = timeit(f_fwd, x)
    bw = adj.nnz * (args.dim * 4 * 2 + 8) / t / 1e9
    print(f"spmm_coo fwd: {t*1e3:.3f} ms  (~{bw:.0f} GB/s effective)")

    f_bwd = jax.jit(jax.grad(lambda x: spmm_coo(adj, x).sum()))
    t = timeit(f_bwd, x)
    print(f"spmm_coo fwd+bwd: {t*1e3:.3f} ms")

    k = max(1, adj.nnz // N)
    idx = jnp.asarray(rng.integers(0, N, (N, k)).astype(np.int32))
    val = jnp.asarray(rng.normal(size=(N, k)).astype(np.float32))
    ell = ELL(idx, val, N)
    f_ell = jax.jit(lambda x: spmm_ell(ell, x))
    t = timeit(f_ell, x)
    print(f"spmm_ell fwd (k={k}): {t*1e3:.3f} ms")

    # negative sampler
    indptr, pos_sorted, _ = _build_pos_csr(u.astype(np.int32), i.astype(np.int32), args.users)
    indptr_d = jnp.asarray(indptr)
    pos_d = jnp.asarray(pos_sorted)
    users_b = jnp.asarray(rng.integers(0, args.users, 2048).astype(np.int32))

    f_neg = jax.jit(
        lambda key, us: sample_negatives(key, us, args.items, indptr_d, pos_d)
    )
    t = timeit(f_neg, jax.random.key(0), users_b)
    print(f"neg sampling (B=2048): {t*1e3:.3f} ms")

    # dense roofline: same MACs as spmm (nnz * dim)
    m = max(64, int(np.sqrt(adj.nnz)))
    a = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(m, args.dim)).astype(np.float32))
    f_mm = jax.jit(lambda a, b: a @ b)
    t = timeit(f_mm, a, b)
    print(f"dense matmul {m}x{m}x{args.dim}: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
