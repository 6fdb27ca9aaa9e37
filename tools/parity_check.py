"""Accuracy parity: our engine vs the actual reference code, same data.

Runs the unmodified reference (`/root/reference/src`, torch CPU) and this
engine on the SAME synthetic dataset with the same hyperparameters, then
prints both valid/test metric dicts side by side.  This is the executable
form of the SURVEY.md §4 "metric-alignment validation" strategy, usable
without the (unshipped) Amazon datasets.

Usage:
    python tools/parity_check.py --model LightGCN --epochs 30 \
        [--users 2000 --items 800 --inters 24000]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import tempfile
import types


def stub_torchvision():
    tv = types.ModuleType("torchvision")
    tv.__path__ = []
    transforms = types.ModuleType("torchvision.transforms")
    transforms.__path__ = []
    functional = types.ModuleType("torchvision.transforms.functional")
    for name in ("Normalize", "Compose", "ToTensor", "Resize"):
        setattr(transforms, name, lambda *a, **k: None)
    functional.pad = lambda *a, **k: None
    functional.resize = lambda *a, **k: None
    tv.transforms = transforms
    transforms.functional = functional
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", transforms)
    sys.modules.setdefault("torchvision.transforms.functional", functional)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="LightGCN")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--items", type=int, default=800)
    ap.add_argument("--inters", type=int, default=24000)
    ap.add_argument("--seed", type=int, default=999)
    ap.add_argument("--overrides", default="{}", help="JSON of scalar hyperparams")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--mg", action="store_true",
                    help="trainer-level Mirror-Gradient on BOTH sides "
                         "(reference trainer.py:207-224)")
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from recommendar_systems_tpu.data.synthetic import (
        generate_synthetic_fast,
        write_dataset_files,
    )

    work = tempfile.mkdtemp(prefix="parity-")
    data_dir = os.path.join(work, "data", "baby")
    ds = generate_synthetic_fast(
        n_users=args.users, n_items=args.items, n_inter=args.inters,
        seed=0, name="baby", v_dim=128, t_dim=64,
    )
    write_dataset_files(ds, data_dir)
    for src, dst in (("image_feat.npy", "image_feat_raw.npy"),
                     ("text_feat.npy", "text_feat_raw.npy")):
        s = os.path.join(data_dir, src)
        if os.path.isfile(s):
            import shutil

            shutil.copy(s, os.path.join(data_dir, dst))

    # baseline scalarizations first (hyper_parameters is overridden to
    # ["seed"], so every model-yaml sweep axis must arrive as a scalar),
    # then the user's --overrides on top
    from tools.measure_reference_baseline import MODEL_OVERRIDES

    overrides = {**MODEL_OVERRIDES.get(args.model, {}),
                 **json.loads(args.overrides)}
    if args.mg:
        # scalarize the mg.yaml sweep axes (reference src/configs/mg.yaml:
        # alpha1 [1.0], alpha2 [0.1,0.2,0.3], beta [3]); alpha2=0.2 is the
        # middle of the published sweep
        overrides.setdefault("alpha1", 1.0)
        overrides.setdefault("alpha2", 0.2)
        overrides.setdefault("beta", 3)
    shared = {
        "epochs": args.epochs,
        "eval_step": 1,
        "stopping_step": max(5, args.epochs),
        "seed": [args.seed],
        "hyper_parameters": ["seed"],
        "save_recommended_topk": False,
        **overrides,
    }

    # ---------------- ours ----------------
    from recommendar_systems_tpu.quick_start import quick_start as ours_qs

    ours_cfg = dict(shared)
    ours_cfg["data_path"] = os.path.join(work, "data") + os.sep
    ours = ours_qs(args.model, "baby", config_dict=ours_cfg, save_model=False,
                   mg=args.mg)
    print("\n=== OURS ===")
    print("valid:", ours["best_valid_result"])
    print("test: ", ours["best_test_upon_valid"])

    if args.skip_reference:
        return

    # ---------------- reference ----------------
    stub_torchvision()
    os.symlink("/root/reference/src/configs", os.path.join(work, "configs"))
    os.chdir(work)
    # defeat hard-coded .cuda() + shim absent geometric deps so EVERY
    # reference model runs on CPU (same shims as the parity unit tests)
    from tests.ref_compat import install_ref_shims

    install_ref_shims()
    if args.model == "SMORE1":
        # the reference's models/smore1.py names its class SMORE; the
        # name-reflection loader (`utils.py:28-41`) expects SMORE1
        import importlib

        _m = importlib.import_module("models.smore1")
        if not hasattr(_m, "SMORE1"):
            _m.SMORE1 = _m.SMORE
    if args.model in ("MENTOR", "DualGNN", "DRAGON"):
        # these read a host-precomputed u-u co-occurrence dict
        from tools.measure_reference_baseline import _gen_user_graph

        _gen_user_graph(data_dir)
    if args.model in ("DualGNN", "DRAGON"):
        # modern torch rejects nested-list tensor indexing (`dualgnn.py:261`)
        import importlib

        import torch as _t

        mod = importlib.import_module(f"models.{args.model.lower()}")
        _orig_fwd = mod.User_Graph_sample.forward

        def _fwd(self, features, user_graph, user_matrix):
            if not _t.is_tensor(user_graph):
                user_graph = _t.tensor(user_graph, dtype=_t.long)
            return _orig_fwd(self, features, user_graph, user_matrix)

        mod.User_Graph_sample.forward = _fwd
    logging.getLogger().handlers.clear()
    from utils.quick_start import quick_start as ref_qs  # reference module

    ref_cfg = dict(shared)
    ref_cfg["data_path"] = os.path.join(work, "data") + os.sep
    ref_cfg["use_gpu"] = False
    # the reference returns nothing; capture its BEST log lines
    import re

    captured = []
    handler = logging.Handler()
    pat = re.compile(r"(valid|test).*?(recall@\d+.*)", re.IGNORECASE)

    def emit(record):
        captured.append(record.getMessage())

    handler.emit = emit
    logging.getLogger().addHandler(handler)
    logging.getLogger().setLevel(logging.INFO)
    ref_qs(model=args.model, dataset="baby", config_dict=ref_cfg,
           save_model=False, mg=args.mg)
    print("\n=== REFERENCE loss curve ===")
    for line in captured:
        if "train loss" in line:
            print(line)
    print("\n=== REFERENCE (tail of log) ===")
    for line in captured[-8:]:
        print(line)


if __name__ == "__main__":
    main()
