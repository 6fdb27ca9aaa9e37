"""Sanity stage 5: merge per-modality feature files into one block.

Script counterpart of the reference's `preprocessing/5test.ipynb` (loads
`text_feat*.npy` + `image_feat*.npy`, concatenates along the feature axis,
saves `all_feat*.npy`, prints the shape as the sanity check).

Usage:
    python preprocessing/concat_features.py ./data/baby \
        --image image_feat.npy --text text_feat.npy --out all_feat.npy
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> str:
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("--image", default="image_feat.npy")
    ap.add_argument("--text", default="text_feat.npy")
    ap.add_argument("--out", default="all_feat.npy")
    args = ap.parse_args(argv)

    img = np.load(os.path.join(args.data_dir, args.image))
    txt = np.load(os.path.join(args.data_dir, args.text))
    if img.shape[0] != txt.shape[0]:
        raise SystemExit(
            f"row mismatch: image {img.shape} vs text {txt.shape} — "
            "features must be aligned on item ids (run reindex first)"
        )
    both = np.concatenate((txt, img), axis=1)
    out = os.path.join(args.data_dir, args.out)
    np.save(out, both)
    print(f"{args.text} {txt.shape} + {args.image} {img.shape} "
          f"-> {args.out} {both.shape}")
    return out


if __name__ == "__main__":
    main()
