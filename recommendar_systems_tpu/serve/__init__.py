"""Serving / inference subsystem (TPU-native capability upgrade).

The reference framework trains and evaluates but has no deployment path at
all — its closest artifact is the optional top-k CSV dump
(`/root/reference/src/utils/topk_evaluator.py:74-87`).  This package turns a
fitted model into a standalone low-latency recommender:

- `export_artifact(trainer, out_dir)` snapshots the model's final scoring
  state (the `eval_embeddings` contract that 25/27 models implement; a
  precomputed top-k table for the two non-dot-product models) plus the
  seen-item CSR needed for exclusion, into one portable `.npz` + `meta.json`.
- `ServingEngine.load(out_dir)` serves masked top-k queries from that
  artifact with a single jitted dispatch per request batch, optional int8
  item-table quantization, cold-start fold-in for unseen users, and
  mesh-sharded scoring with two-stage distributed top-k for catalogs wider
  than one chip.
"""

from recommendar_systems_tpu.serve.export import export_artifact
from recommendar_systems_tpu.serve.engine import ServingEngine

__all__ = ["export_artifact", "ServingEngine"]
