"""CLI entry point (reference `/root/reference/src/main.py:16-27`).

Usage:
    python -m recommendar_systems_tpu.main --model SMORE --dataset baby [--mg]
"""

from __future__ import annotations

import argparse

from recommendar_systems_tpu.quick_start import quick_start


def main() -> None:
    parser = argparse.ArgumentParser(description="TPU-native recommender engine")
    parser.add_argument("--model", "-m", type=str, default="SMORE", help="model name")
    parser.add_argument("--dataset", "-d", type=str, default="baby", help="dataset name")
    parser.add_argument("--mg", action="store_true", help="enable Mirror Gradient")
    parser.add_argument(
        "--no-save", action="store_true", help="disable best-checkpoint saving"
    )
    parser.add_argument(
        "--config",
        "-c",
        nargs="*",
        default=[],
        metavar="KEY=VALUE",
        help="config overrides, e.g. --config epochs=5 device=cpu",
    )
    parser.add_argument(
        "--overrides",
        type=str,
        default=None,
        help='config overrides as one JSON object, e.g. \'{"epochs": 5}\'',
    )
    parser.add_argument(
        "--device",
        type=str,
        default=None,
        choices=["cpu", "tpu"],
        help="force platform (cpu = host; default = let jax pick)",
    )
    # strict parsing: unknown flags are an error, not a silent no-op
    args = parser.parse_args()

    overrides = {}
    for kv in args.config:
        if "=" not in kv:
            raise SystemExit(f"--config entries must be KEY=VALUE, got {kv!r}")
        k, v = kv.split("=", 1)
        overrides[k] = _parse_value(v)
    if args.overrides:
        import json

        overrides.update(json.loads(args.overrides))
    if args.device:
        overrides["device"] = args.device

    quick_start(
        model=args.model,
        dataset=args.dataset,
        config_dict=overrides,
        save_model=not args.no_save,
        mg=args.mg,
    )


def _parse_value(v: str):
    import yaml

    try:
        return yaml.safe_load(v)
    except yaml.YAMLError:
        return v


if __name__ == "__main__":
    main()
