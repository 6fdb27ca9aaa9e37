"""MVGAE dynamics ablation (cross-init showed init is NOT the decider).

Runs OUR MVGAE on the settlement synthetic with one training-dynamics
ingredient toggled off per run:
  --mode noise_off    z = mu in training (no reparametrization noise)
  --mode dropout_off  conv dropout disabled in training
  --mode both_off     both
  --mode base         unmodified

Usage: python tools/mvgae_ablate.py --mode noise_off [--epochs 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="base",
                    choices=["base", "noise_off", "dropout_off", "both_off",
                             "eval_traindrop"])
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--users", type=int, default=1000)
    ap.add_argument("--items", type=int, default=400)
    ap.add_argument("--inters", type=int, default=12000)
    ap.add_argument("--seed", type=int, default=999)
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from recommendar_systems_tpu.models import mvgae as M

    if args.mode in ("noise_off", "both_off"):
        def _reparam(self, mu, logvar, train):
            return mu

        M.MVGAE._reparam = _reparam
    if args.mode == "eval_traindrop":
        # reference eval semantics: full_sort_predict reads result_embed
        # from the LAST TRAINING forward (dropout active) — mimic with a
        # fixed-draw dropout in the eval forward
        from flax import linen as fnn

        from recommendar_systems_tpu.graph.sparse import spmm
        from recommendar_systems_tpu.models.layers import l2_normalize

        def _conv(self, adj, x, w, b, train):
            h = l2_normalize(spmm(adj, x @ w) + b)
            if train:
                return fnn.Dropout(rate=0.1, deterministic=False)(h)
            keep = jax.random.bernoulli(
                jax.random.key(4242 + x.shape[0]), 0.9, h.shape
            )
            return jnp.where(keep, h / 0.9, 0.0)

        M._VGCN._conv = _conv
    if args.mode in ("dropout_off", "both_off"):
        from recommendar_systems_tpu.graph.sparse import spmm
        from recommendar_systems_tpu.models.layers import l2_normalize

        def _conv(self, adj, x, w, b, train):
            return l2_normalize(spmm(adj, x @ w) + b)

        M._VGCN._conv = _conv

    from recommendar_systems_tpu.data.synthetic import (
        generate_synthetic_fast,
        write_dataset_files,
    )
    from recommendar_systems_tpu.quick_start import quick_start

    work = tempfile.mkdtemp(prefix="mvgae-abl-")
    data_dir = os.path.join(work, "data", "baby")
    ds = generate_synthetic_fast(
        n_users=args.users, n_items=args.items, n_inter=args.inters,
        seed=0, name="baby", v_dim=128, t_dim=64,
    )
    write_dataset_files(ds, data_dir)
    out = quick_start("MVGAE", "baby", config_dict={
        "epochs": args.epochs, "eval_step": 1,
        "stopping_step": max(5, args.epochs),
        "seed": [args.seed], "hyper_parameters": ["seed"],
        "learning_rate": 0.001, "beta": 0.1,
        "data_path": os.path.join(work, "data") + os.sep,
        "save_recommended_topk": False,
    }, save_model=False)
    print(f"\n=== MODE {args.mode} ===")
    print("valid:", out["best_valid_result"])
    print("test: ", out["best_test_upon_valid"])


if __name__ == "__main__":
    main()
