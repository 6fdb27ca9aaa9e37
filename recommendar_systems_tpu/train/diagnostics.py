"""Training observability: scalar writer + diagnostics plumbing.

The reference uses optional TensorBoard (`/root/reference/src/common/
trainer.py:111-123, 399-467`) for loss parts, learning rate, per-group
gradient norms, parameter norms and model-provided diagnostics.  Scalars go
to a JSONL event file that `tools/plot_metrics.py` renders (same tags and
grouping as the reference, so dashboards translate one-to-one), and — when
``tb_events: true`` — ALSO to real TensorBoard event files via
``tf.summary`` (drop-in for the reference's `tb_compare_*` workflow).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

# grad-norm grouping prefixes (reference `trainer.py:168-178`)
GRAD_GROUP_PREFIXES = [
    "image_trs", "text_trs", "query_v", "query_t", "gate_v", "gate_t",
    "gate_f", "gate_image_prefer", "gate_text_prefer", "gate_fusion_prefer",
    "user_embedding", "item_id_embedding", "image_embedding", "text_embedding",
    "image_complex_weight", "text_complex_weight", "fusion_complex_weight",
]


def group_name(param_path: str) -> str:
    for p in GRAD_GROUP_PREFIXES:
        if param_path.startswith(p):
            return p
    return param_path.split("/")[0].split(".")[0]


class ScalarWriter:
    """Append-only JSONL scalar log (one event per line); optionally mirrors
    every scalar into a real TensorBoard event file (``tb_events=True``,
    drop-in surface for the reference `trainer.py:111-123`)."""

    def __init__(self, log_dir: str, run_name: str, tb_events: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}.jsonl")
        self._f = open(self.path, "a", encoding="utf-8")
        self._tb = None
        if tb_events:
            try:
                from tensorflow import summary as tf_summary

                self._tb = tf_summary.create_file_writer(
                    os.path.join(log_dir, run_name)
                )
            except ImportError:
                pass  # JSONL alone; this image normally ships tensorflow

    def add_scalar(self, tag: str, value, step: int) -> None:
        try:
            value = float(value)
        except (TypeError, ValueError):
            return
        self._f.write(
            json.dumps({"tag": tag, "value": value, "step": step, "ts": time.time()})
            + "\n"
        )

    def add_scalars(self, scalars: Dict[str, Any], step: int) -> None:
        for tag, v in scalars.items():
            self.add_scalar(tag, v, step)
        self._f.flush()
        if self._tb is not None:
            from tensorflow import summary as tf_summary

            with self._tb.as_default():
                for tag, v in scalars.items():
                    try:
                        tf_summary.scalar(tag, float(v), step=step)
                    except (TypeError, ValueError):
                        continue
            self._tb.flush()

    def close(self) -> None:
        self._f.close()


def param_norms(params) -> Dict[str, float]:
    """Top-level parameter norms (reference `trainer.py:447-451`)."""
    out: Dict[str, float] = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        top = str(path[0].key if hasattr(path[0], "key") else path[0])
        key = f"param_norm/{top}"
        sq = float(np.asarray(jax.device_get((leaf ** 2).sum())))
        out[key] = out.get(key, 0.0) + sq
    return {k: float(np.sqrt(v)) for k, v in out.items()}


def grad_group_norms(grads) -> Dict[str, float]:
    """Per-module-group gradient norms (reference `trainer.py:228-234`)."""
    acc: Dict[str, float] = {}
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, leaf in flat:
        top = str(path[0].key if hasattr(path[0], "key") else path[0])
        g = group_name(top)
        acc[f"grad_norm/{g}"] = acc.get(f"grad_norm/{g}", 0.0) + float(
            np.asarray(jax.device_get((leaf ** 2).sum()))
        )
    return {k: float(np.sqrt(v)) for k, v in acc.items()}
