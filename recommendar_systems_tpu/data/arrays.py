"""Static-shape device buffers for training and evaluation.

This replaces the reference's pandas pointer-batching dataloaders
(`/root/reference/src/utils/dataloader.py:105-416`) with padded, fixed-shape
arrays that live on device and feed jitted training/eval loops:

- train interactions as flat (user, item) arrays, padded to a whole number of
  batches with zero-weight entries (the reference instead emits one smaller
  final batch — weighted means make the two equivalent);
- per-user positive sets as a row-sorted CSR (indptr + sorted item ids),
  used for on-device negative-sampling membership tests via fixed-depth
  binary search (replacing the Python rejection loop at
  `dataloader.py:267-275`);
- per-split evaluation bundles: fixed user batches plus a COO positive-mask
  index padded to one global shape (replacing `dataloader.py:370-391`), so
  a single compiled eval step serves every batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from recommendar_systems_tpu.data.dataset import RecDataset


@dataclass
class EvalBundle:
    """Fixed-shape evaluation batches for one split."""

    users: jnp.ndarray      # [n_batches, B] int32, padded by repeating last user
    n_valid: np.ndarray     # [n_batches] number of real users per batch (host)
    mask_rows: jnp.ndarray  # [n_batches, M] int32 local row of train-positive
    mask_items: jnp.ndarray  # [n_batches, M] int32 item id (pad = n_items)
    gt_list: List[np.ndarray]  # per-eval-user ground-truth item ids (host)
    gt_len: np.ndarray      # [n_eval]
    n_eval: int

    @property
    def n_batches(self) -> int:
        return int(self.users.shape[0])


@dataclass
class DataBundle:
    """All device-resident data a model/trainer needs."""

    n_users: int
    n_items: int
    # training interactions (device)
    train_users: jnp.ndarray  # [n_train] int32
    train_items: jnp.ndarray  # [n_train] int32
    # per-user train-positive CSR (device, row-sorted)
    pos_indptr: jnp.ndarray   # [n_users + 1] int32
    pos_items: jnp.ndarray    # [nnz] int32, sorted within each row
    max_pos_len: int
    # frozen modality features (device) or None
    v_feat: Optional[jnp.ndarray]
    t_feat: Optional[jnp.ndarray]
    # eval bundles
    valid_eval: EvalBundle
    test_eval: EvalBundle
    # host copies for graph construction
    train_users_np: np.ndarray
    train_items_np: np.ndarray

    @property
    def n_train(self) -> int:
        return int(self.train_users.shape[0])


def _build_pos_csr(users: np.ndarray, items: np.ndarray, n_users: int):
    """Row-sorted, duplicate-free CSR of per-user positive items.

    Strictly-increasing rows are required by the exact complement sampler in
    `data/sampling.py` (duplicates would skew its rank arithmetic).
    """
    pairs = np.unique(
        np.stack([users.astype(np.int64), items.astype(np.int64)], axis=1), axis=0
    )
    u_sorted = pairs[:, 0]
    i_sorted = pairs[:, 1]
    counts = np.bincount(u_sorted, minlength=n_users)
    indptr = np.zeros(n_users + 1, dtype=np.int32)
    np.cumsum(counts, out=indptr[1:])
    return indptr, i_sorted.astype(np.int32), int(counts.max()) if len(counts) else 0


def _build_eval_bundle(
    split, train_indptr, train_items_sorted, n_items: int, batch_size: int
) -> EvalBundle:
    """Build fixed-shape eval batches for one split.

    Mirrors the reference EvalDataLoader (`dataloader.py:330-416`): the eval
    users are the unique users of the split (first-appearance order), the
    ground truth is their split items, and the mask is their train positives
    with batch-local row ids (`dataloader.py:398-406` uses the same
    ``row - pr`` rebasing).
    """
    users = split["users"]
    items = split["items"]
    eval_u, first_idx = np.unique(users, return_index=True)
    # keep first-appearance order like pandas .unique()
    eval_u = users[np.sort(first_idx)]
    n_eval = len(eval_u)

    gt_list: List[np.ndarray] = []
    gt_len = np.zeros(n_eval, dtype=np.int64)
    # group split items per user
    order = np.argsort(users, kind="stable")
    su, si = users[order], items[order]
    starts = np.searchsorted(su, eval_u, side="left")
    ends = np.searchsorted(su, eval_u, side="right")
    for k in range(n_eval):
        gt = si[starts[k] : ends[k]]
        gt_list.append(gt)
        gt_len[k] = len(gt)

    n_batches = max(1, -(-n_eval // batch_size))
    users_pad = np.empty((n_batches, batch_size), dtype=np.int32)
    n_valid = np.zeros(n_batches, dtype=np.int32)

    rows_b: List[np.ndarray] = []
    items_b: List[np.ndarray] = []
    for b in range(n_batches):
        lo = b * batch_size
        hi = min(lo + batch_size, n_eval)
        bu = eval_u[lo:hi]
        n_valid[b] = hi - lo
        pad = np.full(batch_size - len(bu), bu[-1] if len(bu) else 0, dtype=np.int32)
        users_pad[b] = np.concatenate([bu.astype(np.int32), pad])
        # train positives of this batch's users, with local row ids
        r_l, i_l = [], []
        for local, u in enumerate(bu):
            s, e = train_indptr[u], train_indptr[u + 1]
            pos = train_items_sorted[s:e]
            r_l.append(np.full(len(pos), local, dtype=np.int32))
            i_l.append(pos)
        rows_b.append(np.concatenate(r_l) if r_l else np.zeros(0, np.int32))
        items_b.append(np.concatenate(i_l) if i_l else np.zeros(0, np.int32))

    M = max(1, max(len(r) for r in rows_b))
    mask_rows = np.zeros((n_batches, M), dtype=np.int32)
    mask_items = np.full((n_batches, M), n_items, dtype=np.int32)  # pad col
    for b in range(n_batches):
        mask_rows[b, : len(rows_b[b])] = rows_b[b]
        mask_items[b, : len(items_b[b])] = items_b[b]

    return EvalBundle(
        users=jnp.asarray(users_pad),
        n_valid=n_valid,
        mask_rows=jnp.asarray(mask_rows),
        mask_items=jnp.asarray(mask_items),
        gt_list=gt_list,
        gt_len=gt_len,
        n_eval=n_eval,
    )


def build_data_bundle(ds: RecDataset, config) -> DataBundle:
    """Host preprocessing: RecDataset -> device-resident DataBundle."""
    tr_u = ds.train["users"].astype(np.int32)
    tr_i = ds.train["items"].astype(np.int32)
    indptr, pos_sorted, max_pos = _build_pos_csr(tr_u, tr_i, ds.n_users)

    eval_bs = int(config.get("eval_batch_size", 4096))
    valid_eval = _build_eval_bundle(ds.valid, indptr, pos_sorted, ds.n_items, eval_bs)
    test_eval = _build_eval_bundle(ds.test, indptr, pos_sorted, ds.n_items, eval_bs)

    return DataBundle(
        n_users=ds.n_users,
        n_items=ds.n_items,
        train_users=jnp.asarray(tr_u),
        train_items=jnp.asarray(tr_i),
        pos_indptr=jnp.asarray(indptr),
        pos_items=jnp.asarray(pos_sorted),
        max_pos_len=max_pos,
        v_feat=jnp.asarray(ds.v_feat) if ds.v_feat is not None else None,
        t_feat=jnp.asarray(ds.t_feat) if ds.t_feat is not None else None,
        valid_eval=valid_eval,
        test_eval=test_eval,
        train_users_np=tr_u,
        train_items_np=tr_i,
    )
