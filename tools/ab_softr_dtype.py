"""A/B: SMOREDiff/X soft-R state dtype (TPU-default bf16 vs softr_f32).

Quantifies the metric consequence of the TPU default's ~0.4% perturbed-
edge-value rounding (PARITY.md soft-R storage note; VERDICT r4 item 7):
same data, same seed, one fit with the bf16 default and one with
``softr_f32=true`` (the CPU-pinned exact formulation,
reference f32 per-edge math `/root/reference/src/models/smorediff.py:287-338`).

Runs on the TPU by default (the CPU backend forces f32 either way, so the
A/B is only meaningful on-chip). Uses the convergence-protocol synthetic
(2000u/800i/24k, baby-format features, seed 999 — the same operating point
as PARITY.md's SMOREDiff convergence row).

Usage: python tools/ab_softr_dtype.py [--model SMOREDiff] [--epochs 25]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SMOREDiff")
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--items", type=int, default=800)
    ap.add_argument("--inters", type=int, default=24000)
    ap.add_argument("--seed", type=int, default=999)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from recommendar_systems_tpu.utils.compile_cache import (
            enable_compile_cache,
        )

        enable_compile_cache()

    from recommendar_systems_tpu.data.synthetic import (
        generate_synthetic_fast,
        write_dataset_files,
    )
    from recommendar_systems_tpu.quick_start import quick_start

    work = tempfile.mkdtemp(prefix="ab-softr-")
    data_dir = os.path.join(work, "data", "baby")
    ds = generate_synthetic_fast(
        n_users=args.users, n_items=args.items, n_inter=args.inters,
        seed=0, name="baby", v_dim=128, t_dim=64,
    )
    write_dataset_files(ds, data_dir)

    results = {}
    for label, f32 in (("bf16-default", False), ("softr_f32", True)):
        cfg = {
            "epochs": args.epochs,
            "eval_step": 1,
            "stopping_step": max(5, args.epochs),
            "seed": [args.seed],
            "hyper_parameters": ["seed"],
            "save_recommended_topk": False,
            "softr_f32": f32,
            "data_path": os.path.join(work, "data") + os.sep,
            "log_dir": os.path.join(work, "log") + os.sep,
            "checkpoint_dir": os.path.join(work, "saved") + os.sep,
        }
        out = quick_start(args.model, "baby", config_dict=cfg,
                          save_model=False)
        results[label] = out
        print(f"\n=== {args.model} [{label}] ===", flush=True)
        print("valid:", {k: round(v, 4)
                         for k, v in out["best_valid_result"].items()})
        print("test: ", {k: round(v, 4)
                         for k, v in out["best_test_upon_valid"].items()})

    a = results["bf16-default"]["best_valid_result"]
    b = results["softr_f32"]["best_valid_result"]
    print("\n=== DELTA (bf16 - f32) ===")
    for k in a:
        print(f"{k}: {a[k] - b[k]:+.4f}")


if __name__ == "__main__":
    main()
