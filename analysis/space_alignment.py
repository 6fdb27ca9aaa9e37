"""Feature-space alignment metrics: CLIP vs raw features.

Counterpart of the reference's `analysis/space_alignment_baby.py:1-50+` and
the report in `evaluation/baby_alignment_report.md`: measures how well the
image and text feature spaces align via
- retrieval AUC (image->text matching vs random pairs),
- Recall@K of cross-modal nearest-neighbor retrieval,
- linear CKA between the two feature matrices.

Usage:
    python analysis/space_alignment.py data/<ds>/image_feat.npy data/<ds>/text_feat.npy
"""

from __future__ import annotations

import argparse

import numpy as np


def _norm(x):
    return x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)


def retrieval_recall_at_k(sim: np.ndarray, ks=(1, 5, 10)) -> dict:
    ranks = (-sim).argsort(axis=1)
    target = np.arange(sim.shape[0])[:, None]
    out = {}
    for k in ks:
        out[f"R@{k}"] = float((ranks[:, :k] == target).any(axis=1).mean())
    return out


def pair_auc(sim: np.ndarray, n_neg: int = 50, seed: int = 0) -> float:
    rng = np.random.default_rng(seed)
    n = sim.shape[0]
    pos = np.diag(sim)
    wins = 0
    total = 0
    for _ in range(n_neg):
        j = rng.integers(0, n, n)
        neg = sim[np.arange(n), j]
        mask = j != np.arange(n)
        wins += (pos[mask] > neg[mask]).sum() + 0.5 * (pos[mask] == neg[mask]).sum()
        total += mask.sum()
    return float(wins / total)


def linear_cka(x: np.ndarray, y: np.ndarray) -> float:
    x = x - x.mean(0)
    y = y - y.mean(0)
    xty = x.T @ y
    num = np.linalg.norm(xty) ** 2
    den = np.linalg.norm(x.T @ x) * np.linalg.norm(y.T @ y)
    return float(num / (den + 1e-12))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("image_feat")
    ap.add_argument("text_feat")
    ap.add_argument("--sample", type=int, default=5000)
    args = ap.parse_args()

    v = np.load(args.image_feat, allow_pickle=True).astype(np.float32)
    t = np.load(args.text_feat, allow_pickle=True).astype(np.float32)
    assert len(v) == len(t), "feature matrices must be item-aligned"
    if len(v) > args.sample:
        idx = np.random.default_rng(0).choice(len(v), args.sample, replace=False)
        v, t = v[idx], t[idx]

    d = min(v.shape[1], t.shape[1])
    # project to common dim via PCA for cross-modal similarity
    def pca(x, k):
        x = x - x.mean(0)
        _, _, vt = np.linalg.svd(x, full_matrices=False)
        return x @ vt[:k].T

    vz, tz = _norm(pca(v, d)), _norm(pca(t, d))
    sim = vz @ tz.T
    report = {"AUC": pair_auc(sim), **retrieval_recall_at_k(sim), "CKA": linear_cka(v[:, :d], t[:, :d])}
    for k, val in report.items():
        print(f"{k}: {val:.4f}")


if __name__ == "__main__":
    main()
