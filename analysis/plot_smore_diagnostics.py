"""Plot SMORE/SMOREMG spectral diagnostics.

Counterpart of the reference's `analysis/plot_smore_diagnostics.py` and
`plot_smore_diagnostics_over_epochs.py`: renders the per-band spectral
energies and item-gate statistics exported by ``SMOREMG.export_diagnostics``
(saved as .npz by the runner) or the scalar JSONL tags ``model/spec/*``.

Usage:
    python analysis/plot_smore_diagnostics.py logs/smoremg_snr_epoch*.npz --out diag.png
    python analysis/plot_smore_diagnostics.py log/scalars/RUN.jsonl --out diag.png
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--out", default="smore_diagnostics.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if args.inputs[0].endswith(".jsonl"):
        series = defaultdict(list)
        with open(args.inputs[0]) as f:
            for line in f:
                ev = json.loads(line)
                if ev["tag"].startswith("model/spec/") or ev["tag"].startswith("model/gate/"):
                    series[ev["tag"]].append((ev["step"], ev["value"]))
        fig, ax = plt.subplots(figsize=(8, 5))
        for tag, pts in sorted(series.items()):
            pts = sorted(pts)
            ax.plot([p[0] for p in pts], [p[1] for p in pts], label=tag.split("model/")[-1])
        ax.set_xlabel("epoch")
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
    else:
        fig, axes = plt.subplots(1, 2, figsize=(12, 4))
        for path in sorted(args.inputs):
            z = np.load(path)
            label = os.path.basename(path)
            if "image_band_energy" in z:
                axes[0].plot(z["image_band_energy"], label=f"img {label}", alpha=0.7)
                axes[0].plot(z["text_band_energy"], "--", label=f"txt {label}", alpha=0.7)
            if "item_gate_mean" in z:
                axes[1].plot(z["item_gate_mean"], label=label, alpha=0.7)
        axes[0].set_title("per-band spectral energy")
        axes[1].set_title("item frequency gate mean")
        for ax in axes:
            ax.grid(alpha=0.3)
            ax.legend(fontsize=6)
    plt.tight_layout()
    plt.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
