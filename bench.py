"""Benchmark: flagship-model training throughput on real TPU hardware.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N}

Protocol: baby-scale synthetic dataset (19,445 users / 7,050 items /
~160k interactions, CLIP-sized features — the statistics of the reference's
headline benchmark, see BASELINE.md), flagship model (SMORE once available,
else LightGCN), one warm-up epoch (XLA compile), then timed epochs.  The
baseline denominator is the measured examples/s of the ACTUAL reference
PyTorch code running the same model on the same synthetic data on this
host's CPU (see tools/measure_reference_baseline.py; result cached in
BASELINE_MEASURED.json).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, help="model name (default: flagship)")
    p.add_argument("--users", type=int, default=19445)
    p.add_argument("--items", type=int, default=7050)
    p.add_argument("--inters", type=int, default=160792)
    p.add_argument("--epochs", type=int, default=3, help="timed epochs after warmup")
    p.add_argument("--batch-size", type=int, default=2048)
    p.add_argument("--cpu", action="store_true", help="debug: run on host CPU")
    p.add_argument(
        "--bf16", action="store_true",
        help="bfloat16 adjacency storage + SpMM compute (f32 accumulation)",
    )
    p.add_argument(
        "--profile", type=str, default=None, metavar="DIR",
        help="wrap the timed epochs in a JAX profiler trace written to DIR",
    )
    p.add_argument(
        "--profile-eval", type=str, default=None, metavar="DIR",
        help="wrap the timed EVAL passes in a JAX profiler trace",
    )
    p.add_argument(
        "--eval-passes", type=int, default=5,
        help="timed full-catalog eval passes; the MEDIAN users/s is "
             "reported (single-pass timing swung 2.6x across rounds from "
             "host-load/tunnel noise — see PARITY.md eval roofline)",
    )
    p.add_argument(
        "--no-fused", action="store_true",
        help="disable the fused one-pass bidirectional propagation kernel",
    )
    p.add_argument(
        "--no-mg", action="store_true",
        help="skip the Mirror-Gradient throughput measurement",
    )
    p.add_argument(
        "--no-approx-eval", action="store_true",
        help="skip the approx-MIPS eval-rate measurement",
    )
    p.add_argument(
        "--ui-mode", default=None, choices=["xla", "pallas"],
        help="u-i propagation kernel on factored int8 storage "
             "(default: the library default, currently 'xla')",
    )
    p.add_argument(
        "--bit-adj", default=None, choices=["true", "false", "auto"],
        help="bit-packed 0/1 adjacency storage (default: library 'auto' — "
             "TPU only, only past the int8 densify threshold)",
    )
    p.add_argument(
        "--no-features", action="store_true",
        help="generate the dataset without modality features (id-only "
             "models at large scale; saves ~1.1 GB HBM at elec size)",
    )
    p.add_argument(
        "--config", nargs="*", default=[], metavar="K=V",
        help="extra config overrides (YAML-parsed values), e.g. "
             "n_layers=2 use_branch_norm=false",
    )
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from recommendar_systems_tpu.data.arrays import build_data_bundle
    from recommendar_systems_tpu.data.synthetic import generate_synthetic_fast
    from recommendar_systems_tpu.models import get_model
    from recommendar_systems_tpu.train.trainer import Trainer
    from recommendar_systems_tpu.utils.configurator import Config

    # candidate chain: the axon tunnel backend fails/hangs compiling some of
    # the largest fused programs (see CLAUDE.md); try each candidate in a
    # watchdogged subprocess so one hung compile cannot eat the bench window
    if args.model is not None:
        _run_one(args, args.model)
        return

    import subprocess
    import sys as _sys

    import __graft_entry__ as ge

    candidates = [ge._flagship_name(), "MGCN", "FREEDOM", "LightGCN"]
    budget = int(os.environ.get("BENCH_PER_MODEL_TIMEOUT", "900"))
    for model_name in candidates:
        cmd = [_sys.executable, os.path.abspath(__file__), "--model", model_name,
               "--epochs", str(args.epochs), "--batch-size", str(args.batch_size),
               "--users", str(args.users), "--items", str(args.items),
               "--inters", str(args.inters)] + (["--cpu"] if args.cpu else []) \
              + (["--bf16"] if args.bf16 else []) \
              + (["--no-fused"] if args.no_fused else []) \
              + (["--no-mg"] if args.no_mg else []) \
              + (["--no-approx-eval"] if args.no_approx_eval else []) \
              + (["--ui-mode", args.ui_mode] if args.ui_mode else []) \
              + (["--bit-adj", args.bit_adj] if args.bit_adj else []) \
              + (["--config"] + args.config if args.config else [])
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=budget,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if out.returncode == 0 and lines:
                print(lines[-1])
                return
            print(f"# bench: {model_name} failed (rc={out.returncode}); falling back",
                  flush=True)
        except subprocess.TimeoutExpired:
            print(f"# bench: {model_name} timed out after {budget}s; falling back",
                  flush=True)
    raise SystemExit("bench: all candidates failed")


def _run_one(args, model_name: str) -> None:
    import jax

    from recommendar_systems_tpu.data.arrays import build_data_bundle
    from recommendar_systems_tpu.data.synthetic import generate_synthetic_fast
    from recommendar_systems_tpu.models import get_model
    from recommendar_systems_tpu.train.trainer import Trainer
    from recommendar_systems_tpu.utils.compile_cache import enable_compile_cache
    from recommendar_systems_tpu.utils.configurator import Config

    # persistent XLA compile cache: SMORE's cold compile over the axon
    # tunnel exceeds the 900 s per-model watchdog; a warm cache loads the
    # same executable in <1 s (utils/compile_cache.py)
    enable_compile_cache()

    extra = {}
    for kv in args.config:
        import yaml

        k, _, v = kv.partition("=")
        extra[k] = yaml.safe_load(v)
    cfg = Config(
        model_name,
        "synthetic",
        config_dict={
            "epochs": args.epochs + 1,
            "train_batch_size": args.batch_size,
            "eval_batch_size": 4096,
            "topk": [5, 10, 20, 50],
            "seed": [0],
            **extra,
        },
    )
    if args.bf16:
        import jax.numpy as jnp

        from recommendar_systems_tpu.graph.sparse import set_dense_dtype

        set_dense_dtype(jnp.bfloat16)
        cfg["compute_dtype"] = "bfloat16"
    from recommendar_systems_tpu.graph.sparse import set_fused_bip
    from recommendar_systems_tpu.ops.masked_attn import set_fused_attn

    set_fused_bip(not args.no_fused)
    set_fused_attn(not args.no_fused)
    if args.ui_mode:
        from recommendar_systems_tpu.graph.sparse import set_ui_matmul_mode

        set_ui_matmul_mode(args.ui_mode)
    if args.bit_adj:
        from recommendar_systems_tpu.graph.sparse import set_bit_adj

        set_bit_adj(
            args.bit_adj if args.bit_adj == "auto" else args.bit_adj == "true"
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
    cls = get_model(model_name)
    model = cls.from_config(cfg, data)
    print("# bench: building ctx", flush=True)
    ctx = cls.build_ctx(cfg, data)
    print(f"# bench: adj={type(ctx.get('norm_adj')).__name__}", flush=True)
    trainer = Trainer(cfg, model, ctx, data)
    trainer.init_state(0)

    # warm-up epoch (compile); steps_per_dispatch= in --config bounds the
    # single-dispatch scan length (the tunnel kills ~90 s dispatches at
    # catalog scale — PARITY.md elec notes)
    epoch_fn = (trainer._train_epoch_chunked
                if 0 < trainer.steps_per_dispatch < trainer.n_steps
                else trainer._train_epoch_jit)
    print("# bench: warm-up epoch (compile)", flush=True)
    key = jax.random.key(1)
    key, k0 = jax.random.split(key)
    out = epoch_fn(
        trainer.params, trainer.opt_state, trainer.net_state, trainer.ctx,
        trainer._data_arrays(), k0
    )
    trainer.params, trainer.opt_state, trainer.net_state = out[0], out[1], out[2]
    # a host transfer is the only reliable sync on the axon tunnel
    float(np.asarray(out[3]).sum())
    print("# bench: warm-up done; timing", flush=True)

    # timed epochs
    if args.profile:
        os.makedirs(args.profile, exist_ok=True)
        jax.profiler.start_trace(args.profile)
    t0 = time.time()
    for _ in range(args.epochs):
        key, ke = jax.random.split(key)
        out = epoch_fn(
            trainer.params, trainer.opt_state, trainer.net_state, trainer.ctx,
            trainer._data_arrays(), ke
        )
        trainer.params, trainer.opt_state, trainer.net_state = out[0], out[1], out[2]
        float(np.asarray(out[3]).sum())  # force completion of this epoch
    dt = time.time() - t0
    if args.profile:
        jax.profiler.stop_trace()
    n_train = data.n_train
    train_eps = n_train * args.epochs / dt

    # eval throughput (full-catalog scoring, users/s) — warm then timed;
    # whole pass is one scanned dispatch (see Trainer._eval_scan_impl)
    ev = data.valid_eval
    use_cached = getattr(type(model), "has_eval_embeddings", False)

    # single-dispatch path (propagation + scanned top-k fused for cached-
    # embedding models); dispatch latency dominates eval wall over the tunnel
    eval_pass = trainer._eval_pass_fn(ev)

    np.asarray(eval_pass())  # compile + warm
    if args.profile_eval:
        os.makedirs(args.profile_eval, exist_ok=True)
        jax.profiler.start_trace(args.profile_eval)
    times = []
    for _ in range(max(1, args.eval_passes)):
        t1 = time.time()
        r = eval_pass()
        np.asarray(r)
        times.append(time.time() - t1)
    if args.profile_eval:
        jax.profiler.stop_trace()
    import statistics

    total_users = int(ev.n_valid.sum())
    eval_ups = total_users / statistics.median(times)
    eval_ups_min = total_users / max(times)
    eval_ups_max = total_users / min(times)

    # DEVICE-side eval rate, separated from the per-dispatch host/tunnel
    # latency that dominates the wall numbers (PARITY.md eval roofline;
    # VERDICT r4 item 4): run R eval passes inside ONE dispatch, at two
    # repetition counts, and difference out the constant dispatch cost.
    # Each pass is rolled to distinct inputs so XLA cannot hoist the
    # loop-invariant computation out of the scan.
    import jax.numpy as jnp

    eval_impl = (trainer._eval_cached_impl if use_cached
                 else trainer._eval_scan_impl)

    def _rep_eval(params, net_state, ctx, users, mask_rows, mask_items, xs):
        def body(c, x):
            t = eval_impl(
                params, net_state, ctx, jnp.roll(users, x, axis=0),
                jnp.roll(mask_rows, x, axis=0),
                jnp.roll(mask_items, x, axis=0),
            )
            return c + t.sum(), None
        out, _ = jax.lax.scan(body, jnp.int32(0), xs)
        return out

    eval_ups_device = None
    try:
        rep_jit = jax.jit(_rep_eval)
        r1, r2 = 4, 36
        dts = {}
        for r in (r1, r2):
            xs = jnp.arange(r, dtype=jnp.int32)
            a = (trainer.params, trainer.net_state, trainer.ctx,
                 ev.users, ev.mask_rows, ev.mask_items, xs)
            int(np.asarray(rep_jit(*a)))  # compile + warm
            t1 = time.time()
            int(np.asarray(rep_jit(*a)))
            dts[r] = time.time() - t1
        per_pass = (dts[r2] - dts[r1]) / (r2 - r1)
        eval_ups_device = total_users / max(per_pass, 1e-9)
    except Exception as e:  # never let a diagnostics field kill the line
        print(f"# bench: device eval rate failed: {e!r}", flush=True)

    # approx-MIPS eval rate (eval_approx=true path — the serving
    # formulation applied to the offline evaluator, VERDICT r4 item 1)
    eval_ups_approx = None
    eval_ups_approx_band = None
    if not args.no_approx_eval:
        try:
            trainer.eval_approx = True
            approx_pass = trainer._eval_pass_fn(ev)
            trainer.eval_approx = False

            np.asarray(approx_pass())  # compile + warm
            atimes = []
            for _ in range(max(1, args.eval_passes)):
                t1 = time.time()
                np.asarray(approx_pass())
                atimes.append(time.time() - t1)
            eval_ups_approx = total_users / statistics.median(atimes)
            eval_ups_approx_band = [total_users / max(atimes),
                                    total_users / min(atimes)]
        except Exception as e:
            print(f"# bench: approx eval rate failed: {e!r}", flush=True)

    # Mirror-Gradient throughput (trainer-level flavor, reference
    # trainer.py:207-224; VERDICT r4 item 3): same model/data, MG fused
    # into the scanned step, measured against the plain rate above.
    mg_eps = None
    if not args.no_mg:
        try:
            mg_trainer = Trainer(cfg, model, ctx, data, mg=True)
            mg_trainer.init_state(0)
            mg_epoch_fn = (mg_trainer._train_epoch_chunked
                           if 0 < mg_trainer.steps_per_dispatch < mg_trainer.n_steps
                           else mg_trainer._train_epoch_jit)
            kmg = jax.random.key(7)
            kmg, k0 = jax.random.split(kmg)
            out = mg_epoch_fn(
                mg_trainer.params, mg_trainer.opt_state, mg_trainer.net_state,
                mg_trainer.ctx, mg_trainer._data_arrays(), k0)
            mg_trainer.params, mg_trainer.opt_state, mg_trainer.net_state = (
                out[0], out[1], out[2])
            float(np.asarray(out[3]).sum())  # warm-up done
            tmg = time.time()
            for _ in range(args.epochs):
                kmg, ke = jax.random.split(kmg)
                out = mg_epoch_fn(
                    mg_trainer.params, mg_trainer.opt_state,
                    mg_trainer.net_state, mg_trainer.ctx,
                    mg_trainer._data_arrays(), ke)
                mg_trainer.params, mg_trainer.opt_state, mg_trainer.net_state = (
                    out[0], out[1], out[2])
                float(np.asarray(out[3]).sum())
            mg_eps = n_train * args.epochs / (time.time() - tmg)
        except Exception as e:
            print(f"# bench: MG measurement failed: {e!r}", flush=True)

    baseline = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    if os.path.isfile(baseline_path):
        with open(baseline_path) as f:
            measured = json.load(f)
        baseline = measured.get(model_name, {}).get("train_examples_per_s")
        if baseline is None:
            baseline = measured.get("LightGCN", {}).get("train_examples_per_s")

    vs = round(train_eps / baseline, 2) if baseline else None
    print(
        json.dumps(
            {
                "metric": f"{model_name}_train_examples_per_s_per_chip",
                "value": round(train_eps, 1),
                "unit": "examples/s",
                "vs_baseline": vs,
                "extra": {
                    "eval_users_per_s": round(eval_ups, 1),
                    "eval_users_per_s_band": [
                        round(eval_ups_min, 1), round(eval_ups_max, 1)
                    ],
                    "eval_users_per_s_device": (
                        round(eval_ups_device, 1)
                        if eval_ups_device else None),
                    "eval_users_per_s_approx": (
                        round(eval_ups_approx, 1)
                        if eval_ups_approx else None),
                    "eval_users_per_s_approx_band": (
                        [round(x, 1) for x in eval_ups_approx_band]
                        if eval_ups_approx_band else None),
                    "mg_train_examples_per_s": (
                        round(mg_eps, 1) if mg_eps else None),
                    "mg_overhead_x": (
                        round(train_eps / mg_eps, 2) if mg_eps else None),
                    "eval_passes": max(1, args.eval_passes),
                    "epoch_time_s": round(dt / args.epochs, 3),
                    "n_train": n_train,
                    "dtype": "bf16" if args.bf16 else "f32",
                    "dataset": f"synthetic({args.users}u/{args.items}i)",
                    "baseline_ref": "reference PyTorch on host CPU (BASELINE_MEASURED.json)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
