"""Transposed-contraction microbenchmark for the GRCN backward kernels.

The gmod/dpre kernels accumulate ``dk[I, c] += ds[bu, I]^T @ q[bu, c]`` (a
dim-0 contraction) per row tile; PARITY.md identified Mosaic's transposed
contraction at c=64 as the binding constraint of the fused backward
(5.8 ms vs a ~1.5 ms bf16-MXU roofline).  Hypothesis: the slow direction
must transpose the BIG [bu, I] operand in-registers, while the flipped
form ``dkT[c, I] += q^T @ ds`` transposes only the SMALL [bu, c] operand
and streams ds in its natural layout — same FLOPs, same output (up to a
final [c, I] -> [I, c] transpose done once outside the kernel).

Variants, each a one-input streaming kernel over row tiles of a resident
HBM ds (mirrors how the real kernels recompute ds per tile in VMEM):
  A: dk_acc[I, c]  += dot_general(ds_tile, q_tile, contract dim 0) (current)
  C: dkT_acc[c, I] += dot_general(q_tile, ds_tile, contract dim 0) (flipped)

Usage: python tools/microbench_trans_contract.py [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--users", type=int, default=19456)
    p.add_argument("--items", type=int, default=7168)
    p.add_argument("--c", type=int, default=64)
    p.add_argument("--bu", type=int, default=64)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    U, I, c, bu = args.users, args.items, args.c, args.bu
    interpret = jax.default_backend() == "cpu"

    def kern_a(ds_ref, q_ref, out_any, acc, sem):
        r = pl.program_id(0)
        n_r = pl.num_programs(0)
        dk_c = jax.lax.dot_general(
            ds_ref[:], q_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(r == 0)
        def _():
            acc[:] = dk_c

        @pl.when(r > 0)
        def _():
            acc[:] = acc[:] + dk_c

        @pl.when(r == n_r - 1)
        def _():
            cp = pltpu.make_async_copy(acc, out_any, sem)
            cp.start()
            cp.wait()

    def kern_c(ds_ref, q_ref, out_any, acc, sem):
        r = pl.program_id(0)
        n_r = pl.num_programs(0)
        dk_c = jax.lax.dot_general(
            q_ref[:], ds_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(r == 0)
        def _():
            acc[:] = dk_c

        @pl.when(r > 0)
        def _():
            acc[:] = acc[:] + dk_c

        @pl.when(r == n_r - 1)
        def _():
            cp = pltpu.make_async_copy(acc, out_any, sem)
            cp.start()
            cp.wait()

    def build(kern, out_shape, acc_shape):
        return pl.pallas_call(
            kern,
            grid=(U // bu,),
            in_specs=[
                pl.BlockSpec((bu, I), lambda r: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bu, c), lambda r: (r, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            scratch_shapes=[
                pltpu.VMEM(acc_shape, jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=96 * 2**20),
            interpret=interpret,
        )

    fa = jax.jit(build(kern_a, (I, c), (I, c)))
    fc = jax.jit(build(kern_c, (c, I), (c, I)))

    # In-dispatch repetition: a single tunnel dispatch costs 100-250 ms of
    # host latency, so per-call wall timing measures the tunnel, not the
    # kernel.  Loop REPS kernel launches inside one jit (scaling q per
    # iteration defeats CSE; the q scale is a [U, c] elementwise pass,
    # identical for both variants).
    REPS = 50

    def loop(f, reduce_to_scalar):
        @jax.jit
        def run(ds, q):
            def body(i, acc):
                qq = q * (1.0 + 1e-6 * i.astype(jnp.bfloat16))
                return acc + reduce_to_scalar(f(ds, qq))

            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        return run

    la = loop(fa, lambda o: o[0, 0])
    lc = loop(fc, lambda o: o[0, 0])

    rng = np.random.default_rng(0)
    ds = jnp.asarray(rng.normal(size=(U, I)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    q = jnp.asarray(rng.normal(size=(U, c)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    # correctness cross-check
    a = np.asarray(fa(ds, q))
    cc = np.asarray(fc(ds, q))
    ref = np.asarray(ds, np.float32).T @ np.asarray(q, np.float32)
    rel_a = np.linalg.norm(a - ref) / np.linalg.norm(ref)
    rel_c = np.linalg.norm(cc.T - ref) / np.linalg.norm(ref)
    print(f"# rel err A={rel_a:.2e} C={rel_c:.2e}", flush=True)

    flops = 2.0 * U * I * c

    def timeit(f, name):
        np.asarray(f(ds, q)).sum()  # warm
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            r = f(ds, q)
            np.asarray(r).sum()  # host sync (tunnel-safe)
            ts.append(time.perf_counter() - t0)
        # subtract the dispatch floor: min wall over an empty-ish dispatch
        # is not measurable here, so report per-kernel = wall/REPS, which
        # amortizes the tunnel latency to ~2-5 ms/REPS
        med = float(np.median(ts)) / REPS
        print(f"{name}: {med*1e3:.3f} ms/kernel (median of {args.iters} "
              f"dispatches of {REPS}; {flops/med/1e12:.1f} TFLOP/s eff)",
              flush=True)
        return med

    ta = timeit(la, f"A dim0-contract  [bu={bu},I={I}]x[bu,{c}] -> [I,{c}]")
    tc = timeit(lc, f"C flipped        [bu={bu},{c}]x[bu,I] -> [{c},I]")
    print(f"speedup C vs A: {ta/tc:.2f}x", flush=True)


if __name__ == "__main__":
    main()
