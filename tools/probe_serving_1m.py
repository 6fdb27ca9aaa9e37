"""Wide-catalog serving probe: which stage binds at I=10^6?

Times four cumulative variants of the query program in one in-dispatch
scan (R repetitions, arrays as jit ARGUMENTS — closure constants blow the
axon remote-compile request):

  matmul        scores = ue[users] @ ie.T        (bf16 out for parity)
  +mask         + extended-column seen scatter
  +exact_topk   + lax.top_k(scores, k)
  +approx_topk  + lax.approx_max_k(scores, k)    (instead of exact)

Usage: python tools/probe_serving_1m.py [--cpu] [--int8] [--batch 256]
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
    p.add_argument("--users", type=int, default=100000)
    p.add_argument("--items", type=int, default=1000000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--reps", type=int, default=50)
    p.add_argument("--maxp", type=int, default=32, help="seen-list width")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    U, I, d, B, k, R = (args.users, args.items, args.dim, args.batch,
                        args.k, args.reps)
    ue = jnp.asarray(rng.normal(size=(U, d)).astype(np.float32))
    if args.int8:
        ie_q = jnp.asarray(rng.integers(-127, 128, size=(I, d), dtype=np.int64
                                        ).astype(np.int8))
        iscale = jnp.asarray(rng.uniform(0.01, 0.02, size=I).astype(np.float32))
        ops = (ie_q, iscale)
    else:
        ops = (jnp.asarray(rng.normal(size=(I, d)).astype(np.float32)),)
    seen = jnp.asarray(rng.integers(0, I, size=(U, args.maxp)).astype(np.int32))
    batches = jnp.asarray(rng.integers(0, U, size=(R, B)).astype(np.int32))

    def scores_of(rows, *ops_):
        if len(ops_) == 2:
            # contract over d WITHOUT transposing the big operand: the
            # int8->bf16 convert then fuses into the matmul A-read (the
            # .T.astype form materializes a converted copy — 22.5 ms vs
            # ~1 ms measured at [1M, 64])
            raw = jnp.einsum("bd,id->bi", rows.astype(jnp.bfloat16),
                             ops_[0].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            return (raw * ops_[1][None, :]).astype(jnp.bfloat16)
        return (rows @ ops_[0].T).astype(jnp.bfloat16)

    def masked(s, rows):
        ext = jnp.concatenate([s, jnp.zeros((s.shape[0], 1), s.dtype)], axis=1)
        b = jnp.arange(s.shape[0])[:, None]
        return ext.at[b, rows].set(-1e10)[:, :-1]

    def v_matmul(ue_, seen_, u, *ops_):
        return scores_of(ue_[u], *ops_).sum()

    def v_mask(ue_, seen_, u, *ops_):
        return masked(scores_of(ue_[u], *ops_), seen_[u]).sum()

    def v_exact(ue_, seen_, u, *ops_):
        s = masked(scores_of(ue_[u], *ops_), seen_[u])
        v, i = jax.lax.top_k(s, k)
        return v.astype(jnp.float32).sum() + i.sum()

    def v_approx(ue_, seen_, u, *ops_):
        s = masked(scores_of(ue_[u], *ops_), seen_[u])
        v, i = jax.lax.approx_max_k(s, k, recall_target=0.95)
        return v.astype(jnp.float32).sum() + i.sum()

    def v_approx_post(ue_, seen_, u, *ops_):
        # no full-width mask at all: take k+maxp approx candidates from the
        # RAW scores, then exclude seen by membership on the tiny candidate
        # set (a user's seen items can displace at most maxp candidates)
        s = scores_of(ue_[u], *ops_)
        v, i = jax.lax.approx_max_k(s, k + args.maxp, recall_target=0.95)
        rows = seen_[u]
        hit = (i[:, :, None] == rows[:, None, :]).any(-1)
        v = jnp.where(hit, -1e10, v.astype(jnp.float32))
        vv, pos = jax.lax.top_k(v, k)
        ii = jnp.take_along_axis(i, pos, axis=1)
        return vv.sum() + ii.sum()

    for name, fn in (("matmul", v_matmul), ("mask", v_mask),
                     ("exact_topk", v_exact), ("approx_topk", v_approx),
                     ("approx_postfilter", v_approx_post)):
        def rep(ue_, seen_, bs, *ops_):
            def body(c, u):
                return c + fn(ue_, seen_, u, *ops_), None
            out, _ = jax.lax.scan(body, jnp.float32(0), bs)
            return out

        repj = jax.jit(rep)
        np.asarray(repj(ue, seen, batches, *ops)).sum()  # compile+run
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(repj(ue, seen, batches, *ops)).sum()
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        print(json.dumps({
            "probe": name, "batch": B, "items": I, "int8": args.int8,
            "us_per_batch": round(dt / R * 1e6, 1),
            "qps": round(B / (dt / R)),
        }))


if __name__ == "__main__":
    main()
