"""Encode item text/images into feature matrices.

Script counterpart of the reference's encoder notebooks
(`3feat-encoder.ipynb`, `3CLIP-encoder1.ipynb`, `4CLIP-encoder2.ipynb`,
`2.5text-converge.ipynb`): produces item-aligned ``text_feat.npy`` /
``image_feat.npy``.  Uses HuggingFace `transformers` (present in this image)
when model weights are locally available; this environment has no network
egress, so absent weights produce a clear error rather than a download.

Usage:
    python preprocessing/encode_features.py text meta.csv --text-col title \
        --out data/<ds>/text_feat.npy [--model sentence-transformers/all-MiniLM-L6-v2]
"""

from __future__ import annotations

import argparse

import numpy as np


def encode_text(texts, model_name: str, batch_size: int = 64) -> np.ndarray:
    import torch
    from transformers import AutoModel, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_name, local_files_only=True)
    model = AutoModel.from_pretrained(model_name, local_files_only=True).eval()
    outs = []
    with torch.no_grad():
        for s in range(0, len(texts), batch_size):
            batch = tok(
                list(texts[s : s + batch_size]), padding=True, truncation=True,
                max_length=64, return_tensors="pt",
            )
            h = model(**batch).last_hidden_state
            mask = batch["attention_mask"].unsqueeze(-1)
            outs.append(((h * mask).sum(1) / mask.sum(1)).numpy())
    return np.concatenate(outs).astype(np.float32)


def encode_images(paths, model_name: str, batch_size: int = 32) -> np.ndarray:
    import torch
    from PIL import Image
    from transformers import AutoImageProcessor, AutoModel

    proc = AutoImageProcessor.from_pretrained(model_name, local_files_only=True)
    model = AutoModel.from_pretrained(model_name, local_files_only=True).eval()
    outs = []
    with torch.no_grad():
        for s in range(0, len(paths), batch_size):
            imgs = [Image.open(p).convert("RGB") for p in paths[s : s + batch_size]]
            batch = proc(images=imgs, return_tensors="pt")
            h = model(**batch)
            pooled = getattr(h, "pooler_output", None)
            if pooled is None:
                pooled = h.last_hidden_state.mean(1)
            outs.append(pooled.numpy())
    return np.concatenate(outs).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["text", "image"])
    ap.add_argument("meta", help="CSV with one row per item (item-id order)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--text-col", default="title")
    ap.add_argument("--path-col", default="image_path")
    ap.add_argument(
        "--model",
        default="sentence-transformers/all-MiniLM-L6-v2",
        help="HF model id or local path (must be cached locally; no egress)",
    )
    args = ap.parse_args()

    import pandas as pd

    df = pd.read_csv(args.meta)
    if args.mode == "text":
        feats = encode_text(df[args.text_col].fillna("").tolist(), args.model)
    else:
        feats = encode_images(df[args.path_col].tolist(), args.model)
    np.save(args.out, feats)
    print(f"wrote {args.out}: {feats.shape}")


if __name__ == "__main__":
    main()
