"""Run bench.py for a list of models sequentially on the real TPU, appending
each JSON result line to analysis/tpu_model_matrix.jsonl.

Each model runs in its own subprocess under a timeout so one hung remote
compile cannot eat the whole window (see CLAUDE.md on the axon tunnel).

Usage: python tools/bench_matrix.py MODEL [MODEL ...] [--timeout S] [--epochs N]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("models", nargs="+")
    p.add_argument("--timeout", type=int, default=540)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--extra", nargs="*", default=[],
                   help="extra bench.py flags, e.g. --extra --no-mg")
    p.add_argument("--out", default=os.path.join(ROOT, "analysis/tpu_model_matrix.jsonl"))
    args = p.parse_args()

    for name in args.models:
        cmd = [sys.executable, os.path.join(ROOT, "bench.py"),
               "--model", name, "--epochs", str(args.epochs)] + args.extra
        print(f"== {name}", flush=True)
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=args.timeout, cwd=ROOT)
        except subprocess.TimeoutExpired:
            print(f"   TIMEOUT after {args.timeout}s", flush=True)
            continue
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode == 0 and lines:
            with open(args.out, "a") as f:
                f.write(lines[-1] + "\n")
            print("   " + lines[-1], flush=True)
        else:
            tail = (out.stderr or out.stdout).strip().splitlines()[-5:]
            print(f"   FAIL rc={out.returncode}: " + " | ".join(tail), flush=True)


if __name__ == "__main__":
    main()
