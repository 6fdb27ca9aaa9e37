"""Measure the ACTUAL reference implementation's training throughput.

Runs the unmodified reference code (`/root/reference/src`) on a synthetic
baby-scale dataset written in its on-disk format, on this host's CPU (the
only PyTorch device available here), and records examples/s per epoch into
`BASELINE_MEASURED.json` for `bench.py`'s ``vs_baseline`` denominator.

Usage: python tools/measure_reference_baseline.py [--model LightGCN] [--epochs 3]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import re
import sys
import tempfile
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="LightGCN")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--users", type=int, default=19445)
    p.add_argument("--items", type=int, default=7050)
    p.add_argument("--inters", type=int, default=160792)
    p.add_argument("--overrides", default="{}", help="JSON of scalar hyperparams")
    args = p.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    from recommendar_systems_tpu.data.synthetic import (
        generate_synthetic_fast,
        write_dataset_files,
    )

    work = tempfile.mkdtemp(prefix="refbench-")
    data_dir = os.path.join(work, "data", "baby")
    ds = generate_synthetic_fast(
        n_users=args.users, n_items=args.items, n_inter=args.inters,
        seed=0, name="baby", with_features=True, v_dim=4096, t_dim=384,
    )
    write_dataset_files(ds, data_dir)
    # the reference baby.yaml names *_raw.npy feature files
    for src, dst in (("image_feat.npy", "image_feat_raw.npy"),
                     ("text_feat.npy", "text_feat_raw.npy")):
        s = os.path.join(data_dir, src)
        if os.path.isfile(s):
            os.replace(s, os.path.join(data_dir, dst))
    n_train = len(ds.train["users"])
    print(f"dataset written to {data_dir}: n_train={n_train}")

    # run the reference in-process (it loads configs from cwd/configs)
    os.symlink("/root/reference/src/configs", os.path.join(work, "configs"))
    os.chdir(work)
    sys.path.insert(0, "/root/reference/src")
    sys.argv = ["main.py"]
    # torchvision is absent in this image; the reference only uses it in the
    # unused UNITER leftovers (data_utils.py) — stub it
    import types

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
    from utils.quick_start import quick_start  # reference module

    epoch_times = []
    handler = logging.Handler()
    pat = re.compile(r"epoch \d+ training \[time: ([0-9.]+)s")

    def emit(record):
        m = pat.search(record.getMessage())
        if m:
            epoch_times.append(float(m.group(1)))

    handler.emit = emit
    root = logging.getLogger()
    root.addHandler(handler)
    # reference init_logger uses basicConfig(handlers=...) which no-ops once a
    # handler exists; set the level ourselves so INFO records reach our parser
    root.setLevel(logging.INFO)

    t0 = time.time()
    quick_start(
        model=args.model,
        dataset="baby",
        config_dict={
            "data_path": os.path.join(work, "data") + os.sep,
            "use_gpu": False,
            "epochs": args.epochs,
            "eval_step": args.epochs + 1,  # time pure training epochs
            "stopping_step": args.epochs + 1,
            "seed": [999],
            "hyper_parameters": ["seed"],
            "save_recommended_topk": False,
            # scalarize the model's sweep-list hyperparameters
            "n_layers": 4,
            "reg_weight": 0.01,
            **__import__("json").loads(args.overrides),
        },
        save_model=False,
        mg=False,
    )
    wall = time.time() - t0
    assert epoch_times, "no epoch timings captured from reference logs"
    # drop the first epoch (warm-up) when there are enough samples
    times = epoch_times[1:] if len(epoch_times) > 1 else epoch_times
    per_epoch = sum(times) / len(times)
    eps = n_train / per_epoch

    out_path = os.path.join(repo_root, "BASELINE_MEASURED.json")
    measured = {}
    if os.path.isfile(out_path):
        with open(out_path) as f:
            measured = json.load(f)
    measured[args.model] = {
        "train_examples_per_s": round(eps, 1),
        "epoch_time_s": round(per_epoch, 3),
        "n_train": n_train,
        "epochs_timed": len(times),
        "host": "reference PyTorch on CPU (no CUDA in this image)",
        "wall_s": round(wall, 1),
    }
    with open(out_path, "w") as f:
        json.dump(measured, f, indent=2)
    print(json.dumps(measured[args.model]))


if __name__ == "__main__":
    main()
