"""Worker for the REAL multi-process test (tests/test_multihost.py).

Runs in its own subprocess: initializes `jax.distributed` against a
localhost coordinator, joins the global ('data','model') mesh spanning both
processes (4 virtual CPU devices each), and trains + evaluates LightGCN
end to end through the normal Trainer path with `multihost=true`.

Usage: python mh_proc_worker.py <process_id> <num_processes> <port> \
           [mode=fit|ckpt] [ckpt_dir]

``mode=fit`` trains + evaluates end to end (prints ``MHOK <pid> <score>``).
``mode=ckpt`` pins Orbax save/exact-resume with PROCESS-SPANNING sharded
state: one epoch, a distributed-array checkpoint, restore into the live
shardings, then a second epoch replayed from both the live and the restored
state must agree exactly (prints ``MHCK <pid> <restore_diff> <replay_diff>``).
"""

import os
import sys

# MUST be set before jax import; each process gets 4 virtual devices
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "fit"
ckpt_dir = sys.argv[5] if len(sys.argv) > 5 else None
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

if mode == "fit":
    score, valid, test = tr.fit(saved=False, verbose=False)
    assert np.isfinite(score), valid
    print(f"MHOK {pid} {score:.6f}", flush=True)
elif mode == "ckpt":
    # ---- Orbax checkpoint/exact-resume across the process-spanning mesh
    # (VERDICT r3 item 7: distributed arrays are where Orbax surprises live)
    import jax.numpy as jnp

    from recommendar_systems_tpu.train.checkpoint import CheckpointManager

    assert ckpt_dir, "ckpt mode needs a shared checkpoint dir argument"

    def tree_max_abs_diff(a, b):
        """Replicated scalar max|a-b| over two (possibly sharded) pytrees."""
        leaves = [
            jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
        ]
        return float(jax.jit(lambda ls: jnp.max(jnp.stack(ls)))(leaves))

    key = jax.random.key(42)
    k1, k2 = jax.random.split(key)
    arrays = tr._data_arrays()
    out1 = tr._train_epoch_jit(
        tr.params, tr.opt_state, tr.net_state, tr.ctx, arrays, k1
    )
    p1, o1, s1 = out1[0], out1[1], out1[2]
    jax.block_until_ready(p1)

    cm = CheckpointManager(ckpt_dir, max_to_keep=2)
    cm.save(1, p1, o1, s1, extra={"epoch": np.zeros((), np.int32) + 1})
    cm.wait()

    # restore into the LIVE shardings (the template's NamedShardings span
    # both processes); diff BEFORE the epoch fns donate the input buffers
    restored = cm.restore(
        1,
        template={"params": p1, "opt_state": o1, "net_state": s1,
                  "extra": {"epoch": np.zeros((), np.int32)}},
    )
    assert int(restored["extra"]["epoch"]) == 1
    d_restore = tree_max_abs_diff(restored["params"], p1)

    # continuous second epoch from the live state, then the same epoch
    # replayed from the restored state (same key, same data)
    out2 = tr._train_epoch_jit(p1, o1, s1, tr.ctx, arrays, k2)
    p2 = out2[0]
    out2b = tr._train_epoch_jit(
        restored["params"], restored["opt_state"], restored["net_state"],
        tr.ctx, arrays, k2,
    )
    d_replay = tree_max_abs_diff(out2b[0], p2)
    cm.close()
    print(f"MHCK {pid} {d_restore:.9f} {d_replay:.9f}", flush=True)
else:
    raise SystemExit(f"unknown mode {mode!r}")
