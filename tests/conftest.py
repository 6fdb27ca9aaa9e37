"""Test environment: force an 8-device virtual CPU mesh before JAX imports.

Multi-chip sharding tests run against these virtual devices
(`--xla_force_host_platform_device_count=8`), per the multi-host test
strategy in SURVEY.md §4.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon TPU plugin in this image ignores JAX_PLATFORMS; the config flag
# is honored, so force CPU through it as well
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from recommendar_systems_tpu.data.arrays import build_data_bundle
from recommendar_systems_tpu.data.synthetic import generate_synthetic
from recommendar_systems_tpu.utils.configurator import Config


@pytest.fixture(scope="session")
def small_ds():
    return generate_synthetic(
        n_users=60, n_items=40, n_inter=900, v_dim=24, t_dim=16, seed=7
    )


@pytest.fixture(scope="session")
def base_config():
    cfg = Config("BPR", "synthetic", config_dict={
        "epochs": 3,
        "train_batch_size": 128,
        "eval_batch_size": 64,
        "stopping_step": 5,
        "topk": [5, 10, 20],
        "metrics": ["Recall", "NDCG", "Precision", "MAP"],
        "reg_weight": 0.001,
    })
    return cfg


@pytest.fixture(scope="session")
def small_bundle(small_ds, base_config):
    return build_data_bundle(small_ds, base_config)


def make_config(model: str, **overrides):
    base = {
        "epochs": 2,
        "train_batch_size": 128,
        "eval_batch_size": 64,
        "stopping_step": 5,
        "topk": [5, 10, 20],
        "seed": [1],
    }
    base.update(overrides)
    return Config(model, "synthetic", config_dict=base)
