"""Primitive probe: exact top_k vs approx_max_k across row widths.

The serving probes measured approx_max_k ~22x faster at [256, 1M]
(tools/probe_serving_1m.py); the round-5 eval-width probe measured the
masked-approx eval ~5x SLOWER than exact at [4096, 63k].  This isolates
the ranking primitive itself at both operating points (in-dispatch
repetition, arrays as jit args).

Usage: python tools/probe_topk_width.py [--cpu] [--batch 4096]
       [--width 63001] [--k 20]
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
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--width", type=int, default=63001)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from recommendar_systems_tpu.utils.compile_cache import (
            enable_compile_cache,
        )

        enable_compile_cache()

    import jax.numpy as jnp

    B, I, k, R = args.batch, args.width, args.k, args.reps
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, I)).astype(np.float32))

    def v_exact_f32(s):
        v, i = jax.lax.top_k(s, k)
        return v.sum() + i.sum()

    def v_exact_bf16(s):
        v, i = jax.lax.top_k(s.astype(jnp.bfloat16), k)
        return v.astype(jnp.float32).sum() + i.sum()

    def v_approx95(s):
        v, i = jax.lax.approx_max_k(s.astype(jnp.bfloat16), k,
                                    recall_target=0.95)
        return v.astype(jnp.float32).sum() + i.sum()

    def v_approx80(s):
        v, i = jax.lax.approx_max_k(s.astype(jnp.bfloat16), k,
                                    recall_target=0.80)
        return v.astype(jnp.float32).sum() + i.sum()

    def v_approx_noagg(s):
        v, i = jax.lax.approx_max_k(s.astype(jnp.bfloat16), k,
                                    recall_target=0.95,
                                    aggregate_to_topk=False)
        return v.astype(jnp.float32).sum() + i.sum()

    def v_approx_f32(s):
        v, i = jax.lax.approx_max_k(s, k, recall_target=0.95)
        return v.sum() + i.sum()

    for name, fn in (("exact_f32", v_exact_f32), ("exact_bf16", v_exact_bf16),
                     ("approx95_bf16", v_approx95),
                     ("approx80_bf16", v_approx80),
                     ("approx95_noagg", v_approx_noagg),
                     ("approx95_f32", v_approx_f32)):
        def rep(s, xs):
            def body(c, i_):
                return c + fn(jnp.roll(s, i_, axis=0)), None
            out, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return out

        try:
            rj = jax.jit(rep)
            xs = jnp.arange(R, dtype=jnp.int32)
            float(np.asarray(rj(x, xs)))
            t0 = time.perf_counter()
            float(np.asarray(rj(x, xs)))
            dt = time.perf_counter() - t0
            print(json.dumps({
                "probe": name, "batch": B, "width": I, "k": k,
                "ms_per_call": round(dt / R * 1e3, 3),
            }), flush=True)
        except Exception as e:
            print(f"# {name} failed: {e!r}", flush=True)


if __name__ == "__main__":
    main()
