"""Smoke tests: per-epoch diagnostics export + over-epochs plotter, and the
preprocessing sanity scripts (reference `5test.ipynb` / `UMAP.ipynb`)."""

import glob
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recommendar_systems_tpu.data.arrays import build_data_bundle
from recommendar_systems_tpu.data.synthetic import generate_synthetic
from recommendar_systems_tpu.models import get_model
from recommendar_systems_tpu.train.trainer import Trainer

from conftest import make_config


def test_diag_export_and_over_epochs_plot(tmp_path):
    ds = generate_synthetic(
        n_users=60, n_items=40, n_inter=900, v_dim=16, t_dim=12, seed=3
    )
    diag_dir = str(tmp_path / "diag")
    cfg = make_config(
        "SMOREMG", epochs=2, reg_weight=1e-4, cl_loss=0.01,
        n_ui_layers=1, n_layers=1, knn_k=5, diag_export_dir=diag_dir,
    )
    for ax in cfg["hyper_parameters"]:
        v = cfg[ax]
        if isinstance(v, list) and v:
            cfg[ax] = v[0]
    data = build_data_bundle(ds, cfg)
    cls = get_model("SMOREMG")
    model = cls.from_config(cfg, data)
    tr = Trainer(cfg, model, cls.build_ctx(cfg, data), data)
    tr.init_state(5)
    tr.fit(saved=False, verbose=False)

    files = sorted(glob.glob(f"{diag_dir}/*.npz"))
    assert len(files) == 2, files
    z = np.load(files[0])
    assert "image_band_energy" in z and "text_band_energy" in z

    from analysis.plot_smore_diagnostics_over_epochs import main as plot_main

    out = str(tmp_path / "evo.png")
    plot_main([diag_dir, "--out", out])
    assert os.path.getsize(out) > 1000


def test_tb_event_files_written(tmp_path):
    """tb_events=true mirrors scalars into REAL TensorBoard event files
    (drop-in surface for the reference trainer.py:111-123)."""
    pytest.importorskip("tensorflow")
    ds = generate_synthetic(
        n_users=50, n_items=30, n_inter=600, v_dim=8, t_dim=8, seed=4
    )
    log_dir = str(tmp_path / "tb")
    cfg = make_config("BPR", epochs=2, reg_weight=0.01, tensorboard=True,
                      tb_events=True, tb_log_dir=log_dir)
    for ax in cfg["hyper_parameters"]:
        v = cfg[ax]
        if isinstance(v, list) and v:
            cfg[ax] = v[0]
    data = build_data_bundle(ds, cfg)
    cls = get_model("BPR")
    tr = Trainer(cfg, cls.from_config(cfg, data), cls.build_ctx(cfg, data),
                 data)
    tr.init_state(5)
    tr.fit(saved=False, verbose=False)

    ev_files = glob.glob(f"{log_dir}/**/events.out.tfevents.*", recursive=True)
    assert ev_files, os.listdir(log_dir)
    # events are real TB records: read tags back
    from tensorflow.python.summary.summary_iterator import summary_iterator

    tags = set()
    for f in ev_files:
        for ev in summary_iterator(f):
            for v in ev.summary.value:
                tags.add(v.tag)
    assert "loss/total" in tags, tags


def test_preprocessing_sanity_scripts(tmp_path):
    rng = np.random.default_rng(0)
    np.save(tmp_path / "image_feat.npy",
            rng.normal(size=(50, 8)).astype(np.float32))
    np.save(tmp_path / "text_feat.npy",
            rng.normal(size=(50, 6)).astype(np.float32))

    from preprocessing.concat_features import main as concat_main
    from preprocessing.plot_feature_space import main as plot_main

    out = concat_main([str(tmp_path)])
    assert np.load(out).shape == (50, 14)

    png = str(tmp_path / "feats.png")
    plot_main([str(tmp_path), "--out", png, "--max-items", "30"])
    assert os.path.getsize(png) > 1000


def test_concat_features_row_mismatch_fails(tmp_path):
    np.save(tmp_path / "image_feat.npy", np.zeros((5, 4), np.float32))
    np.save(tmp_path / "text_feat.npy", np.zeros((6, 4), np.float32))
    from preprocessing.concat_features import main as concat_main

    with pytest.raises(SystemExit):
        concat_main([str(tmp_path)])
