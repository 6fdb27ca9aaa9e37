"""Probe: where does the bit-unpack dual-matmul kernel spend its time?

Contenders (same logical work where applicable, U x Ip @ d):
  xla-bf16    : two XLA matmuls over a bf16 A (2x int8 bytes)  -> HBM ceiling
  xla-int8    : two XLA matmuls over int8 A (convert fused?)
  bitpack     : production kernel (unpack via shift/and + lane concat + 2 MXU)
  planes      : bitpack WITHOUT the concat — 32 per-plane matmuls accumulated
  unpackonly  : unpack + cheap reduction, NO matmul -> isolates VPU unpack cost
  mxuonly     : the two MXU matmuls on a resident bf16 tile, NO unpack

Run: python tools/probe_bitunpack.py [--users 19456 --items 8192 --dim 64]
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

from tools.microbench_bitpack import pack_planes, perm_items


def _unpack(p):
    planes = [
        jnp.bitwise_and(jax.lax.shift_right_logical(p, j), 1).astype(jnp.bfloat16)
        for j in range(32)
    ]
    return jnp.concatenate(planes, axis=1)


# --- bitpack (production shape) ---------------------------------------------

def _bit_kernel(p_ref, xu_ref, xi_ref, top_ref, bot_any, bot_acc, sems):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)
    un = _unpack(p_ref[:])
    top_ref[:] = jnp.dot(un, xi_ref[:], preferred_element_type=jnp.float32)
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
        cp = pltpu.make_async_copy(bot_acc, bot_any, sems.at[0])
        cp.start()
        cp.wait()


# --- per-plane matmuls, no concat -------------------------------------------

def _planes_kernel(p_ref, xu_ref, xi_ref, top_ref, bot_any, bot_acc, sems):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)
    p = p_ref[:]
    K = p.shape[1]
    acc = None
    for j in range(32):
        pj = jnp.bitwise_and(jax.lax.shift_right_logical(p, j), 1).astype(
            jnp.bfloat16
        )
        c = jnp.dot(pj, xi_ref[j], preferred_element_type=jnp.float32)
        acc = c if acc is None else acc + c
    top_ref[:] = acc
    # transpose direction: per-plane outer products into slices of bot
    contribs = []
    for j in range(32):
        pj = jnp.bitwise_and(jax.lax.shift_right_logical(p, j), 1).astype(
            jnp.bfloat16
        )
        contribs.append(jax.lax.dot_general(
            pj, xu_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    contrib = jnp.stack(contribs, axis=0)  # [32, K, d]

    @pl.when(r == 0)
    def _():
        bot_acc[:] = contrib

    @pl.when(r > 0)
    def _():
        bot_acc[:] = bot_acc[:] + contrib

    @pl.when(r == n_r - 1)
    def _():
        cp = pltpu.make_async_copy(bot_acc, bot_any, sems.at[0])
        cp.start()
        cp.wait()


# --- unpack only -------------------------------------------------------------

def _unpack_kernel(p_ref, out_ref):
    un = _unpack(p_ref[:])
    out_ref[:] = jnp.sum(un.astype(jnp.float32), axis=1, keepdims=True) * jnp.ones(
        (1, 128), jnp.float32
    )


# --- mxu only (resident bf16 tile, no unpack) --------------------------------

def _mxu_kernel(a_ref, xu_ref, xi_ref, top_ref, bot_any, bot_acc, sems):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)
    un = a_ref[:]
    top_ref[:] = jnp.dot(un, xi_ref[:], preferred_element_type=jnp.float32)
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
        cp = pltpu.make_async_copy(bot_acc, bot_any, sems.at[0])
        cp.start()
        cp.wait()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=19456)
    ap.add_argument("--items", type=int, default=8192)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--block-u", type=int, default=256)
    args = ap.parse_args()

    U, Ip, d, bu = args.users, args.items, args.dim, args.block_u
    K = Ip // 32
    rng = np.random.default_rng(0)
    m01 = (rng.random((U, Ip)) < 0.001).astype(np.int8)
    packed = jnp.asarray(pack_planes(m01))
    abf = jnp.asarray(m01, dtype=jnp.bfloat16)
    a8 = jnp.asarray(m01, dtype=jnp.int8)
    xu = jnp.asarray(rng.standard_normal((U, d)), dtype=jnp.bfloat16)
    xi = jnp.asarray(rng.standard_normal((Ip, d)), dtype=jnp.bfloat16)
    xi_perm = perm_items(xi, K)
    xi_planes = jnp.asarray(
        np.asarray(xi_perm).reshape(32, K, d)
    )  # plane j's columns

    vp = pltpu.CompilerParams(
        has_side_effects=True, vmem_limit_bytes=100 * 2**20
    )

    def bitpack(packed, xu, xi_perm):
        return pl.pallas_call(
            _bit_kernel,
            grid=(U // bu,),
            in_specs=[
                pl.BlockSpec((bu, K), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bu, d), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Ip, d), lambda r: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bu, d), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((U, d), jnp.float32),
                jax.ShapeDtypeStruct((Ip, d), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((Ip, d), jnp.float32),
                pltpu.SemaphoreType.DMA((1,)),
            ],
            compiler_params=vp,
        )(packed, xu, xi_perm)

    def planes(packed, xu, xi_planes):
        return pl.pallas_call(
            _planes_kernel,
            grid=(U // bu,),
            in_specs=[
                pl.BlockSpec((bu, K), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bu, d), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((32, K, d), lambda r: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bu, d), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((U, d), jnp.float32),
                jax.ShapeDtypeStruct((32, K, d), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((32, K, d), jnp.float32),
                pltpu.SemaphoreType.DMA((1,)),
            ],
            compiler_params=vp,
        )(packed, xu, xi_planes)

    def unpackonly(packed):
        return pl.pallas_call(
            _unpack_kernel,
            grid=(U // bu,),
            in_specs=[
                pl.BlockSpec((bu, K), lambda r: (r, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bu, 128), lambda r: (r, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((U, 128), jnp.float32),
            compiler_params=vp,
        )(packed)

    def mxuonly(abf, xu, xi_perm):
        return pl.pallas_call(
            _mxu_kernel,
            grid=(U // bu,),
            in_specs=[
                pl.BlockSpec((bu, Ip), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bu, d), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Ip, d), lambda r: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bu, d), lambda r: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((U, d), jnp.float32),
                jax.ShapeDtypeStruct((Ip, d), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((Ip, d), jnp.float32),
                pltpu.SemaphoreType.DMA((1,)),
            ],
            compiler_params=vp,
        )(abf, xu, xi_perm)

    def xla_dual(a, xu, xi):
        af = a.astype(jnp.bfloat16)
        top = jnp.matmul(af, xi, preferred_element_type=jnp.float32)
        bot = jnp.matmul(af.T, xu, preferred_element_type=jnp.float32)
        return top, bot

    def timed(name, fn, *operands, reps=3):
        @jax.jit
        def run(*ops):
            def body(c, _):
                out = fn(*ops)
                leaf = out[0] if isinstance(out, (tuple, list)) else out
                return c + leaf[0, 0], ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.iters)
            return c

        try:
            float(np.asarray(run(*operands)))  # compile+warm
            best = 1e9
            for _ in range(reps):
                t0 = time.time()
                float(np.asarray(run(*operands)))
                best = min(best, (time.time() - t0) / args.iters)
            print(f"{name:11s} {best*1e3:8.3f} ms/iter")
        except Exception as e:  # noqa: BLE001
            print(f"{name:11s} FAILED: {type(e).__name__}: {str(e)[:200]}")

    timed("xla-bf16", xla_dual, abf, xu, xi)
    timed("xla-int8", xla_dual, a8, xu, xi)
    timed("bitpack", bitpack, packed, xu, xi_perm)
    timed("planes", planes, packed, xu, xi_planes)
    timed("unpackonly", unpackonly, packed)
    timed("mxuonly", mxuonly, abf, xu, xi_perm)


if __name__ == "__main__":
    main()
