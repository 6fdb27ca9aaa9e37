"""Top-k evaluator (reference `/root/reference/src/utils/topk_evaluator.py`).

Consumes the concatenated per-batch top-k index matrix produced by the
jitted eval step, turns it into the boolean hit matrix against the split's
ground truth (the reference does this with a per-user Python set loop at
`topk_evaluator.py:88-93`; here it is a vectorized padded comparison), and
applies the metric functions at every configured cutoff, rounding to 4
decimals like `topk_evaluator.py:96-101`.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from recommendar_systems_tpu.utils.metrics import metrics_dict
from recommendar_systems_tpu.utils.misc import get_local_time


class TopKEvaluator:
    def __init__(self, config):
        self.config = config
        metrics = config["metrics"]
        if isinstance(metrics, str):
            metrics = [metrics]
        self.metrics = [m.lower() for m in metrics]
        for m in self.metrics:
            if m not in metrics_dict:
                raise ValueError(f"unknown metric {m!r}")
        topk = config["topk"]
        self.topk = [topk] if isinstance(topk, int) else list(topk)
        if any(k <= 0 for k in self.topk):
            raise ValueError("topk must be positive")
        self.save_recom_result = bool(config.get("save_recommended_topk", False))

    def hit_matrix(self, topk_index: np.ndarray, gt_list: List[np.ndarray]) -> np.ndarray:
        """Boolean [n_users, max_k]: ranked item in the user's ground truth.

        Membership via (row, item) keys against the sorted flat ground
        truth — O((nnz + n*k) log nnz).  The earlier padded broadcast
        compare was O(n*k*max_gt), which blows up on heavy-tailed splits
        (at elec shape, 83k users x 20 x a 10^3 max gt length is gigaops
        of host time per eval pass)."""
        n, k = topk_index.shape
        lens = np.fromiter((len(g) for g in gt_list), dtype=np.int64, count=n)
        total = int(lens.sum())
        if total == 0:
            return np.zeros((n, k), dtype=bool)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        gt_flat = np.concatenate(
            [np.asarray(g).ravel() for g in gt_list if len(g)]
        ).astype(np.int64)
        tk = topk_index.astype(np.int64)
        M = int(max(tk.max(initial=0), gt_flat.max(initial=0))) + 1
        gt_keys = np.sort(rows * M + gt_flat)
        keys = (np.arange(n, dtype=np.int64)[:, None] * M + tk).ravel()
        pos = np.minimum(np.searchsorted(gt_keys, keys), len(gt_keys) - 1)
        return (gt_keys[pos] == keys).reshape(n, k)

    def evaluate(
        self,
        topk_index: np.ndarray,
        gt_list: List[np.ndarray],
        gt_len: np.ndarray,
        is_test: bool = False,
        idx: int = 0,
        eval_users: np.ndarray | None = None,
    ) -> Dict[str, float]:
        assert len(gt_list) == len(topk_index)
        if self.save_recom_result and is_test and eval_users is not None:
            self._save_topk(topk_index, eval_users, idx)
        pos_index = self.hit_matrix(topk_index, gt_list)
        pos_len = np.asarray(gt_len)
        result = {}
        for metric in self.metrics:
            value = metrics_dict[metric](pos_index, pos_len)
            for k in self.topk:
                result[f"{metric}@{k}"] = round(float(value[k - 1]), 4)
        return result

    def _save_topk(self, topk_index: np.ndarray, eval_users: np.ndarray, idx: int):
        """Dump top-k recommendations to CSV (`topk_evaluator.py:74-87`)."""
        dir_name = os.path.abspath(self.config.get("recommend_topk", "recommend_topk/"))
        os.makedirs(dir_name, exist_ok=True)
        max_k = max(self.topk)
        path = os.path.join(
            dir_name,
            f"{self.config['model']}-{self.config['dataset']}-idx{idx}"
            f"-top{max_k}-{get_local_time()}.csv",
        )
        header = "id\t" + "\t".join(f"top_{i}" for i in range(max_k))
        out = np.concatenate(
            [np.asarray(eval_users).reshape(-1, 1), topk_index[:, :max_k]], axis=1
        ).astype(np.int64)
        np.savetxt(path, out, fmt="%d", delimiter="\t", header=header, comments="")

    def __str__(self):
        return (
            "TopK Evaluator: metrics=["
            + ", ".join(self.metrics)
            + "], topk=["
            + ", ".join(map(str, self.topk))
            + "]"
        )
