"""Sanity stage 6: 2-D projection of the image/text feature spaces.

Script counterpart of the reference's `preprocessing/UMAP.ipynb`: project
both modality feature matrices to 2-D, scatter them in one figure with a
thin line connecting each item's image point to its text point (visual
check that the encoders produced aligned, non-degenerate spaces).

UMAP isn't installed in this image; PCA (scikit-learn, same fallback the
reference notebook imports) is the default projector, `--projector umap`
uses UMAP when available.

Usage:
    python preprocessing/plot_feature_space.py ./data/baby --out feats.png
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _project(x: np.ndarray, projector: str, seed: int) -> np.ndarray:
    if projector == "umap":
        try:
            import umap

            return umap.UMAP(n_components=2, random_state=seed).fit_transform(x)
        except ImportError:
            print("umap not installed; falling back to PCA")
    from sklearn.decomposition import PCA

    return PCA(n_components=2, random_state=seed).fit_transform(x)


def main(argv=None) -> str:
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("--image", default="image_feat.npy")
    ap.add_argument("--text", default="text_feat.npy")
    ap.add_argument("--out", default="feature_space.png")
    ap.add_argument("--projector", default="pca", choices=["pca", "umap"])
    ap.add_argument("--max-items", type=int, default=2000,
                    help="subsample cap (pair lines get unreadable past this)")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.load(os.path.join(args.data_dir, args.image))
    txt = np.load(os.path.join(args.data_dir, args.text))
    n = min(len(img), len(txt))
    if n > args.max_items:
        sel = np.random.default_rng(args.seed).choice(
            n, args.max_items, replace=False
        )
        img, txt = img[sel], txt[sel]
    img2 = _project(img, args.projector, args.seed)
    txt2 = _project(txt, args.projector, args.seed)

    fig, ax = plt.subplots(figsize=(12, 8))
    for a, b in zip(img2, txt2):
        ax.plot([a[0], b[0]], [a[1], b[1]], c="gray", lw=0.5, alpha=0.3)
    ax.scatter(img2[:, 0], img2[:, 1], s=6, c="tab:blue", label="image")
    ax.scatter(txt2[:, 0], txt2[:, 1], s=6, c="tab:orange", label="text")
    ax.legend()
    ax.set_title(f"{args.projector.upper()} projection of modality features")
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    plt.close(fig)
    print(f"saved plot -> {args.out}")
    return args.out


if __name__ == "__main__":
    main()
