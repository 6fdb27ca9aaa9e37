"""Parse training logs and plot per-epoch metric curves.

Counterpart of `/root/reference/src/plot_log_metric.py:1-197`: regex-parses
the structured training log (per-combo parameter headers, per-epoch valid
results) and renders one curve per hyperparameter combination.

Usage: python tools/plot_log_metric.py <logfile> [--metric recall@20] [--out plot.png]
"""

from __future__ import annotations

import argparse
import re
from collections import defaultdict

PARAM_RE = re.compile(r"Parameters:(\[.*?\])=(\[.*?\])")
EPOCH_RE = re.compile(r"epoch (\d+) evaluating")
METRIC_RE = re.compile(r"(\w+@\d+): ([0-9.]+)")


def parse_log(path: str):
    runs = []  # list of (combo_str, {epoch: {metric: value}})
    combo = None
    cur = None
    pending_epoch = None
    want_valid = False
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            m = PARAM_RE.search(line)
            if m and "=====" in line:
                combo = m.group(2)
                cur = defaultdict(dict)
                runs.append((combo, cur))
                continue
            m = EPOCH_RE.search(line)
            if m:
                pending_epoch = int(m.group(1))
                want_valid = False
                continue
            if "valid result" in line:
                want_valid = True
                continue
            if want_valid and pending_epoch is not None and cur is not None:
                pairs = METRIC_RE.findall(line)
                if pairs:
                    for k, v in pairs:
                        cur[pending_epoch][k.lower()] = float(v)
                    want_valid = False
    return runs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("logfile")
    ap.add_argument("--metric", default="recall@20")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    runs = parse_log(args.logfile)
    if not runs:
        raise SystemExit("no runs parsed from log")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(8, 5))
    for combo, series in runs:
        epochs = sorted(series)
        ys = [series[e].get(args.metric.lower()) for e in epochs]
        pts = [(e, y) for e, y in zip(epochs, ys) if y is not None]
        if pts:
            plt.plot(*zip(*pts), label=str(combo)[:40])
    plt.xlabel("epoch")
    plt.ylabel(args.metric)
    plt.legend(fontsize=7)
    plt.grid(alpha=0.3)
    out = args.out or (args.logfile + f".{args.metric.replace('@','_')}.png")
    plt.savefig(out, dpi=120, bbox_inches="tight")
    print(f"wrote {out} ({len(runs)} combos)")


if __name__ == "__main__":
    main()
