"""Microbenchmark: Pallas DMA-pipelined row gather vs XLA gather/segment_sum.

The sparse SpMM fallback (graph/sparse.py::spmm_coo — used when the catalog
is too large to densify, e.g. elec) is bound by random row gathers from HBM:
XLA's gather achieves ~20 GB/s effective on this chip
(tools/microbench_spmm2.py).  This probes whether a hand-pipelined Pallas
kernel with N outstanding row DMAs gets closer to the random-access HBM
bound, which would justify a Pallas SpMM backend for large catalogs.

Run on the real TPU:  python tools/microbench_pallas_gather.py

MEASURED VERDICT (TPU v5e, 2026-08-18): single-row (512 B) DMAs issued from
a fori_loop are latency-serialized by Mosaic — 0.2 GB/s vs XLA gather's
8-40 GB/s (batch-size dependent).  Hand-rolled per-row DMA pipelining loses
to XLA's native gather here; the dense-matmul path (graph/sparse.py) remains
the TPU answer where storage fits, and XLA gather/segment_sum is kept for
the large-catalog fallback.  At 2M+ edges the axon remote-compile helper
also 500s on the big unrolled kernel.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_gather(x: jnp.ndarray, cols: jnp.ndarray, eb: int = 2048,
                  nbuf: int = 16) -> jnp.ndarray:
    """out[e] = x[cols[e]] with a depth-``nbuf`` DMA pipeline."""
    E = cols.shape[0]
    d = x.shape[1]
    assert E % eb == 0

    def kernel(cols_ref, x_hbm, out_ref, sems):
        base = pl.program_id(0) * eb

        def dma(j, slot):
            return pltpu.make_async_copy(
                x_hbm.at[cols_ref[base + j]], out_ref.at[j], sems.at[slot]
            )

        for j in range(nbuf):  # static warm-up: fill the pipeline
            dma(j, j % nbuf).start()

        def body(j, carry):
            dma(j, j % nbuf).wait()

            @pl.when(j + nbuf < eb)
            def _():
                dma(j + nbuf, j % nbuf).start()

            return carry

        jax.lax.fori_loop(0, eb, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E // eb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((eb, d), lambda i, _: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nbuf,))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((E, d), x.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.default_backend() == "cpu",
    )(cols, x)


def _sync(x):
    return float(np.asarray(x).reshape(-1)[0])  # reliable sync over the tunnel


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=250_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--edges", type=int, default=1 << 21)  # ~2M
    p.add_argument("--eb", type=int, default=2048)
    p.add_argument("--nbuf", type=int, default=16)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.rows, args.dim), dtype=np.float32))
    cols = jnp.asarray(rng.integers(0, args.rows, size=args.edges, dtype=np.int32))
    nbytes = args.edges * args.dim * 4

    @jax.jit
    def xla_gather(x, cols):
        return x[cols]

    for name, fn in [
        ("xla_gather", lambda: xla_gather(x, cols)),
        ("pallas_gather", lambda: pallas_gather(x, cols, args.eb, args.nbuf)),
    ]:
        try:
            out = fn()
            _sync(out.sum())
            t0 = time.time()
            for _ in range(args.iters):
                out = fn()
            _sync(out.sum())
            dt = (time.time() - t0) / args.iters
            print(f"{name:16s} {dt*1e3:8.2f} ms   {nbytes/dt/1e9:8.1f} GB/s")
            ok = np.asarray(out[:64]) == np.asarray(x)[np.asarray(cols[:64])]
            print(f"{'':16s} correct={bool(ok.all())}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
