"""Microbenchmark: bit-packed 0/1 adjacency vs int8/int4 dense storage.

The factored dense adjacency (graph/sparse.py) stores the u-i COUNT matrix
M as int8; the propagation matmuls stream it from HBM at ~94% of peak, so
storage bytes ARE the step time.  For deduplicated interaction data M is
0/1, so it can be packed 1 bit/entry — 8x fewer A bytes than int8.

Contenders (all computing top = A @ xi ; bot = A.T @ xu):
  xla-int8 : current production path (convert fused into matmul reads)
  xla-int4 : same with int4 storage (2x fewer bytes, if the backend streams it)
  bitpack  : Pallas kernel over int32 bit-planes, one HBM pass for BOTH
             directions (16x fewer A bytes than xla-int8's two passes)

Bit-plane layout: packed[u, k] holds 32 columns; physical (permuted) column
p = j*K + k is bit j of word k, i.e. unpack = concat_j((P >> j) & 1).
Logical item c lives at physical p with c = (p % K) * 32 + p // K, so the
operand permutation is a reshape-transpose (no gather):
    xi_perm = xi.reshape(K, 32, d).transpose(1, 0, 2).reshape(Ip, d)

Run on the real TPU:  python tools/microbench_bitpack.py
CPU correctness only: python tools/microbench_bitpack.py --cpu --iters 1
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# packing helpers (host side)
# ---------------------------------------------------------------------------


def pack_planes(m01: np.ndarray) -> np.ndarray:
    """[U, Ip] 0/1 -> int32 [U, Ip/32]; bit j of word k = logical col 32k+j."""
    u, ip = m01.shape
    assert ip % 32 == 0
    w = m01.astype(np.uint32).reshape(u, ip // 32, 32)
    shifts = np.arange(32, dtype=np.uint32)
    return (w << shifts[None, None, :]).sum(axis=2, dtype=np.uint32).view(np.int32)


def perm_items(x: jnp.ndarray, k_words: int) -> jnp.ndarray:
    """Logical [Ip, d] -> physical bit-plane order."""
    ip, d = x.shape
    return x.reshape(k_words, 32, d).transpose(1, 0, 2).reshape(ip, d)


def unperm_items(x: jnp.ndarray, k_words: int) -> jnp.ndarray:
    ip, d = x.shape
    return x.reshape(32, k_words, d).transpose(1, 0, 2).reshape(ip, d)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _kernel(p_ref, xu_ref, xi_any, top_ref, bot_any, xi_vmem, bot_acc, sems):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        cp = pltpu.make_async_copy(xi_any, xi_vmem, sems.at[0])
        cp.start()
        cp.wait()

    p = p_ref[:]  # int32 [bu, K]
    planes = [
        jnp.bitwise_and(jax.lax.shift_right_logical(p, j), 1).astype(jnp.bfloat16)
        for j in range(32)
    ]
    un = jnp.concatenate(planes, axis=1)  # [bu, Ip] physical order
    top_ref[:] = jnp.dot(un, xi_vmem[:], preferred_element_type=jnp.float32)
    contrib = jax.lax.dot_general(
        un, xu_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(r == 0)
    def _():
        bot_acc[:] = contrib

    @pl.when(r > 0)
    def _():
        bot_acc[:] = bot_acc[:] + contrib

    @pl.when(r == n_r - 1)
    def _():
        cp = pltpu.make_async_copy(bot_acc, bot_any, sems.at[1])
        cp.start()
        cp.wait()


def bitpack_dual(packed, xu, xi_perm, block_u=256, interpret=False):
    U, K = packed.shape
    ip = K * 32
    d = xu.shape[1]
    return pl.pallas_call(
        _kernel,
        grid=(U // block_u,),
        in_specs=[
            pl.BlockSpec((block_u, K), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_u, d), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((block_u, d), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((U, d), jnp.float32),
            jax.ShapeDtypeStruct((ip, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ip, d), jnp.bfloat16),
            pltpu.VMEM((ip, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=96 * 2**20,
        ),
        interpret=interpret,
    )(packed.astype(jnp.int32), xu.astype(jnp.bfloat16), xi_perm.astype(jnp.bfloat16))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=19456)
    ap.add_argument("--items", type=int, default=8192)  # multiple of 4096
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--block-u", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    U, Ip, d = args.users, args.items, args.dim
    K = Ip // 32
    rng = np.random.default_rng(0)
    m01 = (rng.random((U, Ip)) < 0.001).astype(np.int8)
    packed = jnp.asarray(pack_planes(m01))
    a8 = jnp.asarray(m01, dtype=jnp.int8)
    xu = jnp.asarray(rng.standard_normal((U, d)), dtype=jnp.float32)
    xi = jnp.asarray(rng.standard_normal((Ip, d)), dtype=jnp.float32)

    def xla_dual(a, xu, xi):
        af = a.astype(jnp.bfloat16)
        top = jnp.matmul(af, xi.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        bot = jnp.matmul(af.T, xu.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return top, bot

    def bit_dual(packed, xu, xi):
        xi_p = perm_items(xi.astype(jnp.bfloat16), K)
        top, bot_p = bitpack_dual(packed, xu, xi_p, args.block_u,
                                  interpret=args.cpu)
        return top, unperm_items(bot_p, K)

    # correctness
    ref = jax.jit(functools.partial(xla_dual, a8))(xu, xi)
    out = jax.jit(functools.partial(bit_dual, packed))(xu, xi)
    for r, o, tag in [(ref[0], out[0], "top"), (ref[1], out[1], "bot")]:
        err = float(jnp.max(jnp.abs(r - o)) / (jnp.max(jnp.abs(r)) + 1e-9))
        print(f"bitpack {tag} max rel err vs xla-int8: {err:.2e}")

    contenders = [("xla-int8", xla_dual, a8, U * Ip * 2)]
    try:
        a4 = a8.astype(jnp.int4)
        contenders.append(("xla-int4", xla_dual, a4, U * Ip))
    except Exception as e:  # noqa: BLE001
        print("int4 unavailable:", e)
    contenders.append(("bitpack", bit_dual, packed, U * Ip // 8))

    def scanned(fn):
        # the adjacency rides as a jit ARGUMENT: on the axon backend device
        # arrays captured as closure constants fail to lower (UNIMPLEMENTED
        # at _array_mlir_constant_handler)
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
        return float(np.asarray(o[0]).reshape(-1)[0])

    for name, fn, a, abytes in contenders:
        try:
            run = scanned(fn)
            _sync(run(a, xu, xi))
            t0 = time.time()
            _sync(run(a, xu, xi))
            dt = (time.time() - t0) / args.iters
            print(f"{name:9s} {dt*1e3:8.3f} ms/iter  A-bytes/iter {abytes/1e6:7.1f} MB")
        except Exception as e:  # noqa: BLE001
            print(f"{name:9s} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
