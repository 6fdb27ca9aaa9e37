"""quick_start grid-sweep integration test (reference `quick_start.py:54-95`)."""

import os

import numpy as np


def test_quick_start_sweep(tmp_path, monkeypatch):
    from recommendar_systems_tpu.quick_start import quick_start

    monkeypatch.chdir(tmp_path)
    result = quick_start(
        "BPR",
        "synthetic",
        config_dict={
            "device": "cpu",
            "epochs": 2,
            "train_batch_size": 256,
            "eval_batch_size": 128,
            "stopping_step": 3,
            "topk": [5, 10, 20],
            "reg_weight": [0.01, 0.001],
            "hyper_parameters": ["reg_weight"],
            "seed": [7],
            "synthetic_users": 150,
            "synthetic_items": 80,
            "synthetic_inters": 2500,
            "data_path": str(tmp_path) + "/data/",
            "log_dir": str(tmp_path) + "/log/",
            "checkpoint_dir": str(tmp_path) + "/saved/",
        },
        save_model=True,
    )
    # 2 combos swept (reg_weight) x 1 seed
    assert len(result["all_results"]) == 2
    assert np.isfinite(result["best_valid_score"])
    assert "recall@20" in result["best_valid_result"]
    # dataset was generated on disk in the reference format
    assert os.path.isfile(tmp_path / "data" / "synthetic" / "synthetic.inter")
    # best checkpoint saved
    assert os.path.isfile(tmp_path / "saved" / "BPR-synthetic-best.msgpack")


def test_chunked_epoch_dispatch(tmp_path, monkeypatch):
    """steps_per_dispatch splits the epoch scan into bounded dispatches
    (large-scale tunnel robustness); training still learns."""
    from recommendar_systems_tpu.quick_start import quick_start

    monkeypatch.chdir(tmp_path)
    result = quick_start(
        "LightGCN",
        "synthetic",
        config_dict={
            "device": "cpu",
            "epochs": 3,
            "train_batch_size": 256,
            "eval_batch_size": 128,
            "stopping_step": 3,
            "topk": [5, 20],
            "n_layers": 2,
            "reg_weight": [0.01],
            "seed": [7],
            "steps_per_dispatch": 2,
            "synthetic_users": 150,
            "synthetic_items": 80,
            "synthetic_inters": 2500,
            "data_path": str(tmp_path) + "/data/",
            "log_dir": str(tmp_path) + "/log/",
            "checkpoint_dir": str(tmp_path) + "/saved/",
        },
        save_model=False,
    )
    import numpy as np

    assert np.isfinite(result["best_valid_score"])
    # well above random on the planted-structure synthetic
    assert result["best_valid_result"]["recall@20"] > 0.1
