"""MVGAE cross-init localization (the SLMRec protocol, PARITY.md).

Our engine's MVGAE per-step loss parity is exact, but end-to-end it
converges ~2x below the reference on the settlement synthetic.  This
script separates INIT from DYNAMICS: construct the unmodified reference
model at seed 999 (no training), copy its exact parameter values and its
frozen preference/collaborative tensors into our engine, then run OUR
trainer.  If the run reaches the reference's operating point, the engine
is correct and the initialization (or its RNG stream) decides the basin;
if not, the difference is in training dynamics.

Usage: python tools/mvgae_crossinit.py [--epochs 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile


def main() -> None:
    ap = argparse.ArgumentParser()
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

    import numpy as np

    from recommendar_systems_tpu.data.arrays import build_data_bundle
    from recommendar_systems_tpu.data.synthetic import (
        generate_synthetic_fast,
        write_dataset_files,
    )
    from recommendar_systems_tpu.models import get_model
    from recommendar_systems_tpu.train.trainer import Trainer
    from recommendar_systems_tpu.utils.configurator import Config
    from recommendar_systems_tpu.utils.misc import init_seed

    work = tempfile.mkdtemp(prefix="mvgae-xinit-")
    data_dir = os.path.join(work, "data", "baby")
    ds = generate_synthetic_fast(
        n_users=args.users, n_items=args.items, n_inter=args.inters,
        seed=0, name="baby", v_dim=128, t_dim=64,
    )
    write_dataset_files(ds, data_dir)

    cfg = Config("MVGAE", "baby", config_dict={
        "epochs": args.epochs, "eval_step": 1,
        "stopping_step": max(5, args.epochs),
        "seed": [args.seed], "hyper_parameters": ["seed"],
        "learning_rate": 0.001, "beta": 0.1,
        "data_path": os.path.join(work, "data") + os.sep,
        "save_recommended_topk": False,
    })
    for ax in cfg["hyper_parameters"]:
        v = cfg[ax]
        if isinstance(v, list) and v:
            cfg[ax] = v[0]
    data = build_data_bundle(ds, cfg)
    cls = get_model("MVGAE")
    model = cls.from_config(cfg, data)
    ctx = cls.build_ctx(cfg, data)

    # ---- reference model construction at the reference's own seeding ----
    sys.path.insert(0, os.path.join(repo_root, "tests"))
    import ref_compat as rc

    rc.install_ref_shims()
    import torch

    init_seed(args.seed)  # same seeding quick_start applies before build
    ref_mod = rc.import_ref_model("mvgae")
    ref_cfg = rc.ref_config(
        end2end=False, is_multimodal_model=True,
        data_path=os.path.join(work, "data") + os.sep, dataset="baby",
        vision_feature_file="image_feat.npy",
        text_feature_file="text_feat.npy",
        embedding_size=int(cfg["embedding_size"]),
        n_layers=int(cfg["n_layers"]) if cfg.get("n_layers") else 2,
        beta=0.1, train_batch_size=int(cfg["train_batch_size"]),
    )
    u = data.train_users_np.astype(np.int64)
    i = data.train_items_np.astype(np.int64)
    ref = ref_mod.MVGAE(
        ref_cfg, rc.FakeRefDataset(u, i, data.n_users, data.n_items)
    )
    vals = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    def t2n(t):
        return np.asarray(t.detach().cpu().numpy(), np.float32)

    # frozen tensors are NOT in state_dict — copy them into the ctx
    ctx["collaborative"] = t2n(ref.collaborative)
    ctx["v_preference"] = t2n(ref.v_gcn.preference)
    ctx["t_preference"] = t2n(ref.t_gcn.preference)
    ctx["c_preference"] = t2n(ref.c_gcn.preference)

    trainer = Trainer(cfg, model, ctx, data, mg=False)
    trainer.init_state(args.seed)

    mapping = {}
    for tower in ("v_gcn", "t_gcn", "c_gcn"):
        mapping[(tower, "MLP", "kernel")] = (f"{tower}.MLP.weight", "T")
        mapping[(tower, "MLP", "bias")] = f"{tower}.MLP.bias"
        for k in (1, 2, 4, 5):
            mapping[(tower, f"conv_w{k}")] = f"{tower}.conv_embed_{k}.weight"
            mapping[(tower, f"conv_b{k}")] = f"{tower}.conv_embed_{k}.bias"
            mapping[(tower, f"g{k}", "kernel")] = (
                f"{tower}.g_layer{k}.weight", "T")
            mapping[(tower, f"g{k}", "bias")] = f"{tower}.g_layer{k}.bias"
        for k in (4, 5):
            mapping[(tower, f"linear{k}", "kernel")] = (
                f"{tower}.linear_layer{k}.weight", "T")
            mapping[(tower, f"linear{k}", "bias")] = (
                f"{tower}.linear_layer{k}.bias")
    # keep only entries our tree actually has (n_layers may be < 2)
    from flax.traverse_util import flatten_dict

    present = set(flatten_dict(trainer.params).keys())
    mapping = {k: v for k, v in mapping.items() if k in present}
    trainer.params = rc.map_flax_params(trainer.params, mapping, vals)
    trainer.ctx = ctx

    score, valid, test = trainer.fit(saved=False, verbose=True)
    print("\n=== OURS from reference torch init ===")
    print("valid:", valid)
    print("test: ", test)


if __name__ == "__main__":
    main()
