"""Config layering, LR schedule, evaluator CSV dump, logger."""

import os

import numpy as np

from recommendar_systems_tpu.train.state import lr_schedule
from recommendar_systems_tpu.utils.configurator import Config
from recommendar_systems_tpu.utils.topk_evaluator import TopKEvaluator


def test_config_layering_precedence():
    # model yaml overrides overall; config_dict overrides both
    cfg = Config("LightGCN", "synthetic")
    assert cfg["is_multimodal_model"] is False  # from LightGCN.yaml
    cfg2 = Config("LightGCN", "synthetic", config_dict={"embedding_size": 128})
    assert cfg2["embedding_size"] == 128


def test_config_float_resolver():
    cfg = Config("LightGCN", "synthetic")
    # 1e-02 in YAML without a dot must parse as float (reference
    # configurator.py:92-104)
    assert isinstance(cfg["reg_weight"][0], float)


def test_seed_always_a_sweep_axis():
    cfg = Config("BPR", "synthetic")
    assert cfg["hyper_parameters"][0] == "seed"
    assert isinstance(cfg["seed"], list)


def test_valid_metric_bigger():
    cfg = Config("BPR", "synthetic", config_dict={"valid_metric": "RMSE@10"})
    assert cfg["valid_metric_bigger"] is False
    cfg = Config("BPR", "synthetic")
    assert cfg["valid_metric_bigger"] is True


def test_lr_schedule_reference_semantics():
    # lr(epoch) = lr0 * s0 ** (epoch / s1)  (reference trainer.py:96-99)
    fn = lr_schedule({"learning_rate": 0.01, "learning_rate_scheduler": [0.96, 50]})
    assert fn(0) == 0.01
    assert abs(fn(50) - 0.01 * 0.96) < 1e-12
    assert abs(fn(100) - 0.01 * 0.96 ** 2) < 1e-12


def _dictish(**kw):
    class D(dict):
        def get(self, k, default=None):
            return super().get(k, default)

    d = D()
    d.update(kw)
    return d


def test_topk_csv_dump(tmp_path):
    cfg = _dictish(
        metrics=["Recall"], topk=[3], save_recommended_topk=True,
        recommend_topk=str(tmp_path), model="BPR", dataset="synthetic",
    )
    ev = TopKEvaluator(cfg)
    topk = np.array([[1, 2, 3], [4, 5, 6]])
    gt = [np.array([2]), np.array([9])]
    res = ev.evaluate(topk, gt, np.array([1, 1]), is_test=True,
                      eval_users=np.array([10, 11]))
    assert res["recall@3"] == 0.5
    files = os.listdir(tmp_path)
    assert len(files) == 1 and files[0].endswith(".csv")
    lines = open(tmp_path / files[0]).read().strip().splitlines()
    assert lines[0].split("\t") == ["id", "top_0", "top_1", "top_2"]
    assert lines[1].split("\t") == ["10", "1", "2", "3"]


def test_recall2_metric_available():
    cfg = _dictish(metrics=["Recall2"], topk=[2], save_recommended_topk=False)
    ev = TopKEvaluator(cfg)
    topk = np.array([[1, 2], [3, 4]])
    gt = [np.array([1, 7]), np.array([4])]
    res = ev.evaluate(topk, gt, np.array([2, 1]))
    # hits: u0 has 1@rank1, u1 has 4@rank2 => cum@2 = 2 hits / 3 positives
    assert abs(res["recall2@2"] - 2 / 3) < 1e-4  # results round to 4 decimals


def test_profiler_trace_epoch(tmp_path):
    """`profile_epoch` wraps one epoch in a JAX profiler trace (SURVEY §5)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from recommendar_systems_tpu.data.arrays import build_data_bundle
    from recommendar_systems_tpu.data.synthetic import generate_synthetic
    from recommendar_systems_tpu.models import get_model
    from recommendar_systems_tpu.train.trainer import Trainer
    from conftest import make_config

    ds = generate_synthetic(n_users=60, n_items=40, n_inter=900, v_dim=8,
                            t_dim=8, seed=1)
    cfg = make_config("BPR", epochs=2, reg_weight=0.001,
                      profile_epoch=1, profile_dir=str(tmp_path / "prof"))
    data = build_data_bundle(ds, cfg)
    cls = get_model("BPR")
    trainer = Trainer(cfg, cls.from_config(cfg, data), {}, data)
    trainer.init_state(0)
    trainer.fit(saved=False, verbose=False)
    import glob
    traces = glob.glob(str(tmp_path / "prof" / "**" / "*.trace.json*"),
                       recursive=True) + glob.glob(
        str(tmp_path / "prof" / "**" / "*.xplane.pb"), recursive=True)
    assert traces, "no profiler trace artifacts written"


def test_plot_train_loss_and_grad_groups(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from recommendar_systems_tpu.data.arrays import build_data_bundle
    from recommendar_systems_tpu.data.synthetic import generate_synthetic
    from recommendar_systems_tpu.models import get_model
    from recommendar_systems_tpu.train.trainer import Trainer
    from conftest import make_config

    ds = generate_synthetic(n_users=60, n_items=40, n_inter=900, v_dim=8,
                            t_dim=8, seed=1)
    cfg = make_config("BPR", epochs=2, reg_weight=0.001)
    data = build_data_bundle(ds, cfg)
    cls = get_model("BPR")
    trainer = Trainer(cfg, cls.from_config(cfg, data), {}, data)
    trainer.init_state(0)
    trainer.fit(saved=False, verbose=False)
    out = trainer.plot_train_loss(save_path=str(tmp_path / "loss.png"))
    import os
    assert os.path.isfile(out)
    norms = trainer.grad_group_norms()
    assert any(k.startswith("grad_norm/") for k in norms)
    assert all(np.isfinite(v) for v in norms.values())
