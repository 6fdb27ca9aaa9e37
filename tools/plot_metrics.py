"""Render the trainer's JSONL scalar logs (TB-equivalent dashboards).

Counterpart of the reference's TensorBoard usage + the `analysis/tb_compare_*`
comparisons: plots selected tags across one or more runs.

Usage:
    python tools/plot_metrics.py log/scalars/RUN.jsonl [more.jsonl ...] \
        [--tags loss/total valid/recall@20] [--out cmp.png]
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict


def load_run(path: str):
    series = defaultdict(list)
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            series[ev["tag"]].append((ev["step"], ev["value"]))
    return series


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--tags", nargs="*", default=["loss/total", "valid/recall@20"])
    ap.add_argument("--out", default="metrics.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(
        len(args.tags), 1, figsize=(8, 3 * len(args.tags)), squeeze=False
    )
    for ti, tag in enumerate(args.tags):
        ax = axes[ti][0]
        for run in args.runs:
            series = load_run(run)
            if tag in series:
                pts = sorted(series[tag])
                ax.plot([p[0] for p in pts], [p[1] for p in pts],
                        label=os.path.basename(run)[:40])
        ax.set_title(tag)
        ax.grid(alpha=0.3)
        ax.legend(fontsize=7)
    plt.tight_layout()
    plt.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
