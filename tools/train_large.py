"""Train + evaluate at large synthetic scale (elec / ml-20m shapes) through
the full Trainer.fit loop — the throughput bench (bench.py) times epochs;
this drives convergence so metric movement at scale is on record.

Usage:
  python tools/train_large.py --users 138493 --items 27278 --inters 20000000 \
      --epochs 6 --batch-size 1048576 [--bit-adj auto|true|false] [--model M]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="LightGCN")
    ap.add_argument("--users", type=int, default=138493)
    ap.add_argument("--items", type=int, default=27278)
    ap.add_argument("--inters", type=int, default=20_000_000)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=1_048_576)
    ap.add_argument("--bit-adj", default=None, choices=["true", "false", "auto"])
    ap.add_argument("--steps-per-dispatch", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from recommendar_systems_tpu.data.arrays import build_data_bundle
    from recommendar_systems_tpu.data.synthetic import generate_synthetic_fast
    from recommendar_systems_tpu.models import get_model
    from recommendar_systems_tpu.train.trainer import Trainer
    from recommendar_systems_tpu.utils.configurator import Config

    if args.bit_adj:
        from recommendar_systems_tpu.graph.sparse import set_bit_adj

        set_bit_adj(args.bit_adj if args.bit_adj == "auto"
                    else args.bit_adj == "true")

    cfg = Config(
        args.model, "synthetic",
        config_dict={
            "epochs": args.epochs,
            "train_batch_size": args.batch_size,
            "eval_batch_size": 4096,
            "topk": [10, 20],
            "seed": [0],
            "stopping_step": args.epochs,  # no early stop: show the curve
            "steps_per_dispatch": args.steps_per_dispatch,
        },
    )
    for ax in cfg["hyper_parameters"]:
        v = cfg[ax]
        if isinstance(v, list) and v:
            cfg[ax] = v[0]

    t0 = time.time()
    ds = generate_synthetic_fast(
        n_users=args.users, n_items=args.items, n_inter=args.inters, seed=0,
        with_features=False,
    )
    data = build_data_bundle(ds, cfg)
    cls = get_model(args.model)
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)
    print(f"# setup {time.time()-t0:.1f}s  adj={type(ctx.get('norm_adj')).__name__}"
          f"  n_train={data.n_train}", flush=True)
    trainer = Trainer(cfg, model, ctx, data)
    trainer.init_state(0)
    score, best_valid, best_test = trainer.fit(saved=False, verbose=True)
    print("BEST valid:", {k: round(v, 4) for k, v in best_valid.items()})
    print("BEST test :", {k: round(v, 4) for k, v in best_test.items()})

    # exact vs approx-MIPS eval at this catalog width (VERDICT r4 item 1:
    # rates AND metric deltas at large width; the approx path's win grows
    # with catalog width — see PARITY.md eval section)
    import numpy as np

    ev = data.valid_eval
    total_users = int(ev.n_valid.sum())
    for label, approx in (("exact", False), ("approx", True)):
        trainer.eval_approx = approx
        res = trainer.evaluate(ev)  # compile + warm
        times = []
        for _ in range(3):
            t1 = time.time()
            trainer.evaluate(ev)
            times.append(time.time() - t1)
        rate = total_users / float(np.median(times))
        print(f"EVAL[{label}]: {rate:,.0f} users/s  "
              f"metrics={ {k: round(v, 4) for k, v in res.items()} }",
              flush=True)
    trainer.eval_approx = False


if __name__ == "__main__":
    main()
