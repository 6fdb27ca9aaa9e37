"""Per-user temporal ratio split writing the `x_label` column.

Script counterpart of `preprocessing/1splitting.ipynb` (see the reference's
`preprocessing/README.md:18-20`): each user's interactions are sorted by
timestamp and split train/valid/test by ratio; `x_label` 0/1/2 marks the
split, matching `RecDataset.split()` (`src/utils/dataset.py:57-74`).

Usage:
    python preprocessing/split_inter.py data/<ds>/<ds>.inter --ratios 0.8 0.1 0.1
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd


def ratio_split_labels(users, ts, ratios):
    order = np.lexsort((ts, users))
    labels = np.zeros(len(users), dtype=np.int64)
    u_sorted = users[order]
    boundaries = np.flatnonzero(np.diff(u_sorted)) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(u_sorted)]])
    for s, e in zip(starts, ends):
        n = e - s
        n_train = int(np.floor(n * ratios[0]))
        n_valid = int(np.floor(n * (ratios[0] + ratios[1]))) - n_train
        idx = order[s:e]
        labels[idx[n_train : n_train + n_valid]] = 1
        labels[idx[n_train + n_valid :]] = 2
    return labels


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("inter")
    ap.add_argument("--ratios", nargs=3, type=float, default=[0.8, 0.1, 0.1])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    df = pd.read_csv(args.inter, sep="\t")
    labels = ratio_split_labels(
        df["userID"].to_numpy(), df["timestamp"].to_numpy(), args.ratios
    )
    df["x_label"] = labels
    out = args.out or args.inter
    df.to_csv(out, sep="\t", index=False)
    dist = np.bincount(labels, minlength=3)
    print(f"wrote {out}: train/valid/test = {dist[0]}/{dist[1]}/{dist[2]}")


if __name__ == "__main__":
    main()
