"""Interaction dataset: `.inter` TSV loading and split handling.

Replaces the reference's pandas-DataFrame dataset
(`/root/reference/src/utils/dataset.py`): the on-disk format is identical
(TSV with ``userID``, ``itemID`` and an ``x_label`` split column where
0=train / 1=valid / 2=test, plus item-aligned ``*.npy`` modality feature
files), but interactions are held as flat numpy arrays — the natural feed
for static-shape device buffers.

Counts come from max id + 1 (reference `dataset.py:47-48`); cold-start
users absent from train are dropped from valid/test when
``filter_out_cod_start_users`` is set (reference `dataset.py:64-70`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np


@dataclass
class RecDataset:
    """Loaded interaction data, split into train/valid/test id arrays."""

    n_users: int
    n_items: int
    # per-split arrays of equal length: user ids and item ids (int64 host side)
    splits: Dict[str, Dict[str, np.ndarray]] = field(default_factory=dict)
    # frozen modality features, item-aligned; None when absent
    v_feat: Optional[np.ndarray] = None
    t_feat: Optional[np.ndarray] = None
    dataset_name: str = ""

    @property
    def train(self):
        return self.splits["train"]

    @property
    def valid(self):
        return self.splits["valid"]

    @property
    def test(self):
        return self.splits["test"]

    @property
    def inter_num(self) -> int:
        return sum(len(s["users"]) for s in self.splits.values())

    def __str__(self) -> str:
        sparsity = 1 - self.inter_num / max(self.n_users * self.n_items, 1)
        return (
            f"{self.dataset_name}: {self.n_users} users, {self.n_items} items, "
            f"{self.inter_num} interactions "
            f"(train {len(self.train['users'])} / valid {len(self.valid['users'])} "
            f"/ test {len(self.test['users'])}), sparsity {sparsity * 100:.4f}%"
        )


def load_dataset(config) -> RecDataset:
    """Load ``<data_path>/<dataset>/<inter_file_name>`` + feature .npy files."""
    name = config["dataset"]
    ds_dir = os.path.abspath(os.path.join(config["data_path"], name))
    inter_path = os.path.join(ds_dir, config["inter_file_name"] or f"{name}.inter")
    if not os.path.isfile(inter_path):
        raise FileNotFoundError(f"interaction file not found: {inter_path}")

    uid_field = config["USER_ID_FIELD"] or "userID"
    iid_field = config["ITEM_ID_FIELD"] or "itemID"
    label_field = config["inter_splitting_label"] or "x_label"
    sep = config["field_separator"] or "\t"

    users = items = labels = None
    if sep == "\t":
        # fast native TSV parser (native/recsys_native.cpp) when available
        parsed = _native_parse(inter_path, uid_field, iid_field, label_field)
        if parsed is not None:
            users, items, labels = parsed
    if users is None:
        import pandas as pd

        df = pd.read_csv(
            inter_path, usecols=[uid_field, iid_field, label_field], sep=sep
        )
        users = df[uid_field].to_numpy(dtype=np.int64)
        items = df[iid_field].to_numpy(dtype=np.int64)
        labels = df[label_field].to_numpy(dtype=np.int64)

    v_feat = t_feat = None
    vf = config["vision_feature_file"]
    tf = config["text_feature_file"]
    if config.get("is_multimodal_model", True):
        if vf and os.path.isfile(os.path.join(ds_dir, vf)):
            v_feat = np.load(os.path.join(ds_dir, vf), allow_pickle=True).astype(np.float32)
        if tf and os.path.isfile(os.path.join(ds_dir, tf)):
            t_feat = np.load(os.path.join(ds_dir, tf), allow_pickle=True).astype(np.float32)

    return build_rec_dataset(
        users,
        items,
        labels,
        v_feat=v_feat,
        t_feat=t_feat,
        name=name,
        filter_cold_start=bool(config.get("filter_out_cod_start_users", True)),
    )


def _native_parse(inter_path, uid_field, iid_field, label_field):
    try:
        import native
    except ImportError:
        return None
    if not native.available():
        return None
    with open(inter_path, "r", encoding="utf-8") as f:
        header = f.readline().rstrip("\n").split("\t")
    try:
        cols = (
            header.index(uid_field),
            header.index(iid_field),
            header.index(label_field),
        )
    except ValueError:
        return None
    return native.parse_inter(inter_path, *cols)


def build_rec_dataset(
    users: np.ndarray,
    items: np.ndarray,
    labels: np.ndarray,
    v_feat: Optional[np.ndarray] = None,
    t_feat: Optional[np.ndarray] = None,
    name: str = "",
    filter_cold_start: bool = True,
) -> RecDataset:
    """Assemble a RecDataset from raw (user, item, x_label) arrays."""
    n_users = int(users.max()) + 1
    n_items = int(items.max()) + 1

    splits: Dict[str, Dict[str, np.ndarray]] = {}
    train_mask = labels == 0
    train_users = set(np.unique(users[train_mask]).tolist())
    for idx, split in enumerate(("train", "valid", "test")):
        m = labels == idx
        u, i = users[m], items[m]
        if idx > 0 and filter_cold_start:
            keep = np.isin(u, list(train_users))
            u, i = u[keep], i[keep]
        splits[split] = {
            "users": u.astype(np.int64),
            "items": i.astype(np.int64),
        }
    return RecDataset(
        n_users=n_users,
        n_items=n_items,
        splits=splits,
        v_feat=v_feat,
        t_feat=t_feat,
        dataset_name=name,
    )
