"""SMORE/SMOREMG spectral-diagnostics EVOLUTION across epochs.

Counterpart of the reference's
`/root/reference/analysis/plot_smore_diagnostics_over_epochs.py:1-122`:
given per-epoch `.npz` exports (written by ``Trainer.fit`` when
``diag_export_dir`` is set; keys ``image_band_energy``/``text_band_energy``
from ``SMOREMG.export_diagnostics``, with the reference's
``img_energy``/``txt_energy`` accepted as aliases), render a 2x2 panel:
epoch x frequency heatmaps for both modalities plus mean/max energy summary
curves over epochs.

Usage:
    python analysis/plot_smore_diagnostics_over_epochs.py logs/diag/ --out evo.png
    python analysis/plot_smore_diagnostics_over_epochs.py run_epoch*.npz --out evo.png
"""

from __future__ import annotations

import argparse
import glob
import os
import re

import numpy as np

_ALIASES = {
    "image": ("image_band_energy", "img_energy"),
    "text": ("text_band_energy", "txt_energy"),
}


def _epoch_of(path: str) -> int:
    m = re.search(r"epoch(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 1 << 30


def _load(path: str):
    z = np.load(path)
    out = {}
    for mod, keys in _ALIASES.items():
        for k in keys:
            if k in z:
                out[mod] = np.asarray(z[k]).reshape(-1)
                break
    return out


def collect(paths) -> list:
    files = []
    for entry in paths:
        if os.path.isdir(entry):
            files.extend(sorted(glob.glob(os.path.join(entry, "*.npz"))))
        elif entry.endswith(".npz") and os.path.exists(entry):
            files.append(entry)
    return sorted(set(files), key=_epoch_of)


def main(argv=None) -> str:
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+", help=".npz files or directories")
    ap.add_argument("--out", default="smore_diagnostics_over_epochs.png")
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    files = collect(args.paths)
    if not files:
        raise SystemExit("no npz files found")
    rows = [_load(f) for f in files]
    epochs = [_epoch_of(f) for f in files]
    if epochs[-1] == 1 << 30:  # unnumbered files: positional order
        epochs = list(range(1, len(files) + 1))

    fig, axes = plt.subplots(2, 2, figsize=(12, 8), sharex="col")
    for col, (mod, cmap) in enumerate((("image", "viridis"),
                                       ("text", "magma"))):
        mat = np.stack([r[mod] for r in rows if mod in r])
        im = axes[0, col].imshow(mat, aspect="auto", origin="lower",
                                 cmap=cmap)
        axes[0, col].set_title(f"{mod} energy per frequency")
        axes[0, col].set_ylabel("epoch")
        axes[0, col].set_yticks(range(len(epochs)))
        axes[0, col].set_yticklabels(epochs)
        fig.colorbar(im, ax=axes[0, col], shrink=0.8)
        axes[1, col].plot(epochs, mat.mean(axis=1), label="mean")
        axes[1, col].plot(epochs, mat.max(axis=1), "--", label="max")
        axes[1, col].set_xlabel("epoch")
        axes[1, col].set_ylabel("energy")
        axes[1, col].set_title(f"{mod} energy summary")
        axes[1, col].legend()
        axes[1, col].grid(alpha=0.3)
    fig.suptitle("SMORE diagnostics across epochs")
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    plt.close(fig)
    print(f"saved plot -> {args.out}")
    return args.out


if __name__ == "__main__":
    main()
