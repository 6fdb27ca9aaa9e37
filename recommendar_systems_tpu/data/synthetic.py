"""Synthetic implicit-feedback dataset generator.

The reference ships no data (its `data/README.md` points at a Google Drive
folder), so tests and benchmarks here run on synthetic datasets with the same
on-disk format and matching statistics (power-law item popularity, per-user
ratio split with ``x_label``, item-aligned feature matrices).  A planted
block structure (user/item communities) gives learnable signal so end-to-end
training tests can assert recall improves over random.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from recommendar_systems_tpu.data.dataset import RecDataset, build_rec_dataset


def generate_synthetic(
    n_users: int = 200,
    n_items: int = 100,
    n_inter: int = 3000,
    n_communities: int = 5,
    in_community_p: float = 0.8,
    popularity_alpha: float = 1.0,
    v_dim: int = 64,
    t_dim: int = 32,
    split_ratio=(0.8, 0.1, 0.1),
    seed: int = 0,
    name: str = "synthetic",
    with_features: bool = True,
) -> RecDataset:
    """Generate a RecDataset with community structure + power-law popularity.

    Users and items are assigned to ``n_communities`` groups; with probability
    ``in_community_p`` a user interacts inside their community, and item
    choice within the candidate pool is Zipf-weighted (``popularity_alpha``).
    Features are community centroids + noise, so modality-aware models can
    exploit them.  The split mimics the reference's per-user ratio split
    (`/root/reference/preprocessing/1splitting.ipynb` writes x_label 0/1/2).
    """
    rng = np.random.default_rng(seed)
    user_comm = rng.integers(0, n_communities, size=n_users)
    item_comm = rng.integers(0, n_communities, size=n_items)

    pop = 1.0 / np.power(np.arange(1, n_items + 1), popularity_alpha)
    item_rank = rng.permutation(n_items)
    item_weight = pop[item_rank]

    comm_items = [np.where(item_comm == c)[0] for c in range(n_communities)]

    users_l, items_l = [], []
    seen = set()
    # per-user interaction counts ~ power law, min 5 (5-core-like)
    raw = rng.pareto(1.5, size=n_users) + 1.0
    counts = np.maximum(5, (raw / raw.sum() * n_inter).astype(int))
    for u in range(n_users):
        c = user_comm[u]
        pool_in = comm_items[c]
        for _ in range(counts[u]):
            for _try in range(20):
                if len(pool_in) > 0 and rng.random() < in_community_p:
                    w = item_weight[pool_in]
                    i = int(rng.choice(pool_in, p=w / w.sum()))
                else:
                    i = int(rng.choice(n_items, p=item_weight / item_weight.sum()))
                if (u, i) not in seen:
                    seen.add((u, i))
                    users_l.append(u)
                    items_l.append(i)
                    break

    users = np.asarray(users_l, dtype=np.int64)
    items = np.asarray(items_l, dtype=np.int64)

    # per-user ratio split into x_label 0/1/2
    labels = np.zeros(len(users), dtype=np.int64)
    order = rng.permutation(len(users))
    by_user = {}
    for idx in order:
        by_user.setdefault(users[idx], []).append(idx)
    for u, idxs in by_user.items():
        n = len(idxs)
        n_val = max(1, int(round(n * split_ratio[1]))) if n >= 5 else 0
        n_test = max(1, int(round(n * split_ratio[2]))) if n >= 5 else 0
        for j in idxs[:n_val]:
            labels[j] = 1
        for j in idxs[n_val : n_val + n_test]:
            labels[j] = 2

    v_feat = t_feat = None
    if with_features:
        v_centroids = rng.normal(size=(n_communities, v_dim)).astype(np.float32)
        t_centroids = rng.normal(size=(n_communities, t_dim)).astype(np.float32)
        v_feat = (
            v_centroids[item_comm] + 0.3 * rng.normal(size=(n_items, v_dim))
        ).astype(np.float32)
        t_feat = (
            t_centroids[item_comm] + 0.3 * rng.normal(size=(n_items, t_dim))
        ).astype(np.float32)

    return build_rec_dataset(
        users, items, labels, v_feat=v_feat, t_feat=t_feat, name=name
    )


def generate_synthetic_fast(
    n_users: int,
    n_items: int,
    n_inter: int,
    popularity_alpha: float = 0.8,
    user_alpha: float = 0.7,
    v_dim: int = 4096,
    t_dim: int = 384,
    seed: int = 0,
    name: str = "synthetic-large",
    with_features: bool = True,
) -> RecDataset:
    """Vectorized generator for benchmark-scale datasets (e.g. baby-scale:
    19,445 users / 7,050 items / 160,792 interactions with CLIP-sized
    features).  Power-law user activity and item popularity via inverse-CDF
    sampling; interactions deduplicated; 8:1:1 random split."""
    rng = np.random.default_rng(seed)

    w_u = np.power(np.arange(1, n_users + 1, dtype=np.float64), -user_alpha)
    rng.shuffle(w_u)
    counts = np.maximum(5, (w_u / w_u.sum() * n_inter).astype(np.int64))
    users = np.repeat(np.arange(n_users, dtype=np.int64), counts)

    pop = np.power(np.arange(1, n_items + 1, dtype=np.float64), -popularity_alpha)
    rng.shuffle(pop)
    cdf = np.cumsum(pop) / pop.sum()
    items = np.searchsorted(cdf, rng.random(len(users))).astype(np.int64)
    items = np.minimum(items, n_items - 1)

    pairs = np.unique(np.stack([users, items], 1), axis=0)
    users, items = pairs[:, 0], pairs[:, 1]
    # ensure every item id appears at least once so max-id counts match
    missing = np.setdiff1d(np.arange(n_items), items)
    if len(missing):
        users = np.concatenate([users, rng.integers(0, n_users, len(missing))])
        items = np.concatenate([items, missing])

    labels = rng.choice([0, 1, 2], size=len(users), p=[0.8, 0.1, 0.1])
    # every user keeps at least one train interaction: force first occurrence
    first_idx = np.unique(users, return_index=True)[1]
    labels[first_idx] = 0

    v_feat = t_feat = None
    if with_features:
        # unit-normalized like real CLIP/sentence embeddings — raw N(0,1)
        # features at 512+ dims give O(sqrt(d)) dot products that underflow
        # log-sigmoid losses (in the reference too)
        v_feat = rng.normal(size=(n_items, v_dim)).astype(np.float32)
        t_feat = rng.normal(size=(n_items, t_dim)).astype(np.float32)
        v_feat /= np.linalg.norm(v_feat, axis=1, keepdims=True) + 1e-12
        t_feat /= np.linalg.norm(t_feat, axis=1, keepdims=True) + 1e-12

    return build_rec_dataset(
        users, items, labels, v_feat=v_feat, t_feat=t_feat, name=name
    )


def write_dataset_files(ds: RecDataset, out_dir: str) -> None:
    """Write a RecDataset in the reference on-disk format (.inter + .npy)."""
    os.makedirs(out_dir, exist_ok=True)
    name = ds.dataset_name or "synthetic"
    rows = []
    for label, split in ((0, "train"), (1, "valid"), (2, "test")):
        u = ds.splits[split]["users"]
        i = ds.splits[split]["items"]
        for k in range(len(u)):
            rows.append((u[k], i[k], 0, label))
    with open(os.path.join(out_dir, f"{name}.inter"), "w", encoding="utf-8") as f:
        f.write("userID\titemID\ttimestamp\tx_label\n")
        for u, i, ts, lab in rows:
            f.write(f"{u}\t{i}\t{ts}\t{lab}\n")
    if ds.v_feat is not None:
        np.save(os.path.join(out_dir, "image_feat.npy"), ds.v_feat)
    if ds.t_feat is not None:
        np.save(os.path.join(out_dir, "text_feat.npy"), ds.t_feat)
