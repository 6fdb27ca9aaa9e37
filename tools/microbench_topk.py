"""Eval top-k microbenchmark: `lax.top_k` (sort-based) vs
`lax.approx_max_k` (TPU PartialReduce) on the full-catalog eval shape.

The eval-path trace (PARITY.md) shows the scanned score/mask/top-k pass
is ~18 ms device-side for 19,445 users x 7,050 items, dominated by the
top-k over each [4096, I] score batch.  approx_max_k with
recall_target=1.0 lowers to the TPU's PartialReduce and should beat the
O(n log n) sort; this measures both (in-dispatch repetition — wall
per-call timing over the axon tunnel measures dispatch latency, not the
kernel) and checks result-set agreement.

Usage: python tools/microbench_topk.py [--cpu]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--rows", type=int, default=4096)
    p.add_argument("--cols", type=int, default=7050)
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    B, I, k = args.rows, args.cols, args.k
    REPS = 30
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, I)).astype(np.float32))

    def loop(f):
        @jax.jit
        def run(x):
            def body(i, acc):
                xx = x + 1e-6 * i  # defeat CSE; identical for both variants
                _, idx = f(xx)
                return acc + idx[0, 0]

            return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

        return run

    f_sort = loop(lambda v: jax.lax.top_k(v, k))
    f_approx = loop(lambda v: jax.lax.approx_max_k(v, k, recall_target=0.99))
    f_exact2 = loop(
        lambda v: jax.lax.approx_max_k(
            v, k, recall_target=0.99, aggregate_to_topk=True
        )
    )

    # agreement of the top-k SET (order matters for ndcg; values are
    # continuous so ties are measure-zero)
    _, i_sort = jax.lax.top_k(x, k)
    _, i_approx = jax.lax.approx_max_k(x, k, recall_target=0.99)
    same = float(
        np.mean(np.asarray(i_sort) == np.asarray(i_approx))
    )
    print(f"# elementwise index agreement top_k vs approx(0.99): {same:.6f}",
          flush=True)

    def timeit(f, name):
        np.asarray(f(x)).sum()
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            r = f(x)
            np.asarray(r).sum()
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts)) / REPS
        print(f"{name}: {med*1e3:.3f} ms/call "
              f"({B/med:,.0f} rows/s)", flush=True)
        return med

    t_sort = timeit(f_sort, f"lax.top_k            [B={B}, I={I}, k={k}]")
    t_apx = timeit(f_approx, "lax.approx_max_k 0.99")
    timeit(f_exact2, "approx_max_k 0.99 agg")
    print(f"speedup approx vs sort: {t_sort/t_apx:.2f}x", flush=True)


if __name__ == "__main__":
    main()
