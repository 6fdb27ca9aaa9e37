"""Offline-eval rate probe: exact vs approx-MIPS at a given catalog width.

Measures, for one model at one synthetic shape (VERDICT r4 item 1: baby AND
elec/ml-20m widths):

- exact path wall rate (`_eval_cached_jit` — reference semantics,
  `/root/reference/src/common/trainer.py:519-527`);
- approx path wall rate (`eval_approx=true`, which self-selects the
  postfilter or masked formulation by candidate slack — see
  `Trainer._approx_topk`);
- DEVICE rates for both via two-point in-dispatch repetition (the bench.py
  pattern: constant dispatch latency differences out).

Usage: python tools/probe_eval_width.py [--users 192403 --items 63001
       --inters 1689188] [--model LightGCN] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="LightGCN")
    ap.add_argument("--users", type=int, default=192403)
    ap.add_argument("--items", type=int, default=63001)
    ap.add_argument("--inters", type=int, default=1689188)
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-features", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from recommendar_systems_tpu.utils.compile_cache import (
            enable_compile_cache,
        )

        enable_compile_cache()

    from recommendar_systems_tpu.data.arrays import build_data_bundle
    from recommendar_systems_tpu.data.synthetic import generate_synthetic_fast
    from recommendar_systems_tpu.models import get_model
    from recommendar_systems_tpu.train.trainer import Trainer
    from recommendar_systems_tpu.utils.configurator import Config

    cfg = Config(
        args.model, "synthetic",
        config_dict={
            "epochs": 1, "train_batch_size": 8192, "eval_batch_size": 4096,
            "topk": [10, 20], "seed": [0],
        },
    )
    for ax in cfg["hyper_parameters"]:
        v = cfg[ax]
        if isinstance(v, list) and v:
            cfg[ax] = v[0]
    ds = generate_synthetic_fast(
        n_users=args.users, n_items=args.items, n_inter=args.inters, seed=0,
        with_features=not args.no_features,
    )
    data = build_data_bundle(ds, cfg)
    cls = get_model(args.model)
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)
    trainer = Trainer(cfg, model, ctx, data)
    trainer.init_state(0)

    ev = data.valid_eval
    total_users = int(ev.n_valid.sum())
    maxp = max(int(data.max_pos_len), 1)
    heavy = trainer._heavy_tail_eval()
    use_cached = getattr(cls, "has_eval_embeddings", False)
    print(f"# {args.model} {args.users}u/{args.items}i maxp={maxp} "
          f"eval_users={total_users} cached={use_cached} heavy={heavy}",
          flush=True)

    exact_pass = trainer._eval_pass_fn(ev)
    trainer.eval_approx = True
    approx_pass = trainer._eval_pass_fn(ev)
    trainer.eval_approx = False

    results = {}
    for label, fn in (("exact", exact_pass), ("approx", approx_pass)):
        np.asarray(fn())  # compile + warm
        times = []
        for _ in range(max(1, args.passes)):
            t0 = time.time()
            np.asarray(fn())
            times.append(time.time() - t0)
        results[f"{label}_wall_users_per_s"] = round(
            total_users / statistics.median(times), 1)

    # device rates: two-point in-dispatch repetition with rolled inputs
    def rep_exact(params, net_state, ctx, users, mr, mi, xs):
        def body(c, x):
            t = trainer._eval_cached_impl(
                params, net_state, ctx, jnp.roll(users, x, axis=0),
                jnp.roll(mr, x, axis=0), jnp.roll(mi, x, axis=0))
            return c + t.sum(), None
        out, _ = jax.lax.scan(body, jnp.int32(0), xs)
        return out

    if heavy:
        def rep_approx(params, net_state, ctx, users, mr, mi, xs):
            def body(c, x):
                t = trainer._eval_cached_amask_impl(
                    params, net_state, ctx, jnp.roll(users, x, axis=0),
                    jnp.roll(mr, x, axis=0), jnp.roll(mi, x, axis=0))
                return c + t.sum(), None
            out, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return out

        approx_extra = (ev.users, ev.mask_rows, ev.mask_items)
    else:
        seen = trainer._eval_seen()

        def rep_approx(params, net_state, ctx, users, seen_, xs):
            def body(c, x):
                t = trainer._eval_cached_approx_impl(
                    params, net_state, ctx, jnp.roll(users, x, axis=0),
                    seen_)
                return c + t.sum(), None
            out, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return out

        approx_extra = (ev.users, seen)

    r1, r2 = 2, 8
    for label, rep, extra in (
        ("exact", rep_exact, (ev.users, ev.mask_rows, ev.mask_items)),
        ("approx", rep_approx, approx_extra),
    ):
        try:
            rj = jax.jit(rep)
            dts = {}
            for r in (r1, r2):
                xs = jnp.arange(r, dtype=jnp.int32)
                a = (trainer.params, trainer.net_state, trainer.ctx,
                     *extra, xs)
                int(np.asarray(rj(*a)))
                t0 = time.time()
                int(np.asarray(rj(*a)))
                dts[r] = time.time() - t0
            per = (dts[r2] - dts[r1]) / (r2 - r1)
            results[f"{label}_device_users_per_s"] = round(
                total_users / max(per, 1e-9), 1)
        except Exception as e:
            print(f"# device rate [{label}] failed: {e!r}", flush=True)

    row = {
        "probe": "eval_width", "model": args.model, "users": args.users,
        "items": args.items, "maxp": maxp, "heavy": heavy,
        "eval_users": total_users,
        **results,
    }
    print(json.dumps(row))


if __name__ == "__main__":
    main()
