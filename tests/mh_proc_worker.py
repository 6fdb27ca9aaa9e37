"""Worker for the REAL multi-process test (tests/test_multihost.py).

Runs in its own subprocess: initializes `jax.distributed` against a
localhost coordinator, joins the global ('data','model') mesh spanning both
processes (4 virtual CPU devices each), and trains + evaluates LightGCN
end to end through the normal Trainer path with `multihost=true`.

Usage: python mh_proc_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

# MUST be set before jax import; each process gets 4 virtual devices
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=n, process_id=pid
)

import numpy as np

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from recommendar_systems_tpu.data.arrays import build_data_bundle
from recommendar_systems_tpu.data.synthetic import generate_synthetic
from recommendar_systems_tpu.models import get_model
from recommendar_systems_tpu.train.trainer import Trainer
from recommendar_systems_tpu.utils.configurator import Config

assert jax.process_count() == n, jax.process_count()
assert len(jax.devices()) == 4 * n, len(jax.devices())

cfg = Config("LightGCN", "synthetic", config_dict={
    "epochs": 2, "train_batch_size": 128, "eval_batch_size": 64,
    "stopping_step": 5, "topk": [5, 10, 20], "seed": [1],
    "multihost": True, "mesh_shape": [4, 2], "shard_embedding_tables": True,
    "n_layers": 2, "reg_weight": 0.001,
})
for ax in cfg["hyper_parameters"]:
    v = cfg[ax]
    if isinstance(v, list) and v:
        cfg[ax] = v[0]

# every host builds the same bundle deterministically (docs/multihost.md)
ds = generate_synthetic(
    n_users=80, n_items=48, n_inter=1200, v_dim=16, t_dim=16, seed=3
)
data = build_data_bundle(ds, cfg)
cls = get_model("LightGCN")
model = cls.from_config(cfg, data)
ctx = cls.build_ctx(cfg, data)
tr = Trainer(cfg, model, ctx, data, mg=False)

# the mesh must span both processes with 'model' intra-process
grid = tr.mesh.devices
assert {d.process_index for d in grid.ravel()} == set(range(n))
for row in grid:
    assert len({d.process_index for d in row}) == 1

tr.init_state(3)
score, valid, test = tr.fit(saved=False, verbose=False)
assert np.isfinite(score), valid
print(f"MHOK {pid} {score:.6f}", flush=True)
