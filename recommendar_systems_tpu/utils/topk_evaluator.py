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
        """Boolean [n_users, max_k]: ranked item in the user's ground truth."""
        n, k = topk_index.shape
        max_gt = max((len(g) for g in gt_list), default=1) or 1
        gt_pad = np.full((n, max_gt), -1, dtype=np.int64)
        for r, g in enumerate(gt_list):
            gt_pad[r, : len(g)] = g
        return (topk_index[:, :, None] == gt_pad[:, None, :]).any(axis=2)

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
