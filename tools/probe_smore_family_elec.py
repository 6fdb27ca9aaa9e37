"""Warm 4-step single-chunk device probe for SMORE-family models at elec
shape — the measurement behind PARITY.md's round-5 elec attribution
(device-clean s/step, optional one-chunk profiler trace).

Usage: [GRAFT_BIT_ADJ=false] [GRAFT_SKIP_TRACE=1] \
       python tools/probe_smore_family_elec.py [SMORE|SMOREDiff|...]
"""

import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax

from recommendar_systems_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from recommendar_systems_tpu.data.arrays import build_data_bundle
from recommendar_systems_tpu.data.synthetic import generate_synthetic_fast
from recommendar_systems_tpu.models import get_model
from recommendar_systems_tpu.train.trainer import Trainer
from recommendar_systems_tpu.utils.configurator import Config

name = sys.argv[1] if len(sys.argv) > 1 else "SMORE"
import os
if os.environ.get("GRAFT_BIT_ADJ"):
    from recommendar_systems_tpu.graph.sparse import set_bit_adj
    v = os.environ["GRAFT_BIT_ADJ"]
    set_bit_adj(v if v == "auto" else v == "true")
    print(f"# bit_adj={v}", flush=True)
cfg = Config(name, "synthetic", config_dict={
    "epochs": 1, "train_batch_size": 8192, "eval_batch_size": 4096,
    "topk": [10, 20], "seed": [0], "steps_per_dispatch": 4,
    **({"use_edge_nce": False} if name.startswith("SMOREDiff") else {}),
})
for ax in cfg["hyper_parameters"]:
    v = cfg[ax]
    if isinstance(v, list) and v:
        cfg[ax] = v[0]
ds = generate_synthetic_fast(n_users=192403, n_items=63001, n_inter=1689188, seed=0)
data = build_data_bundle(ds, cfg)
cls = get_model(name)
model = cls.from_config(cfg, data)
ctx = cls.build_ctx(cfg, data)
tr = Trainer(cfg, model, ctx, data)
tr.init_state(0)
key = jax.random.key(0)
k_perm, k_scan = jax.random.split(key)
perm, weight, sids = tr._epoch_xs(k_perm)
sl = slice(0, 4)
args = (tr.params, tr.opt_state, tr.net_state, tr.ctx, tr._data_arrays(),
        (perm[sl], weight[sl], sids[sl]), k_scan)
out = tr._train_chunk_jit(*args)
params, opt_state, net_state = out[0], out[1], out[2]
float(np.asarray(out[3]).sum())  # warm (donated argnums: thread state forward)
print("# warm done", flush=True)
t0 = time.time()
out = tr._train_chunk_jit(params, opt_state, net_state, tr.ctx,
                          tr._data_arrays(), (perm[sl], weight[sl], sids[sl]), k_scan)
params, opt_state, net_state = out[0], out[1], out[2]
float(np.asarray(out[3]).sum())
print(f"# 4 steps in {time.time()-t0:.2f}s", flush=True)
import os as _os
if _os.environ.get("GRAFT_SKIP_TRACE"):
    print("# trace skipped", flush=True); sys.exit(0)
jax.profiler.start_trace(f"/tmp/{name.lower()}_elec_trace")
out = tr._train_chunk_jit(params, opt_state, net_state, tr.ctx,
                          tr._data_arrays(), (perm[sl], weight[sl], sids[sl]), k_scan)
float(np.asarray(out[3]).sum())
jax.profiler.stop_trace()
print("# trace written", flush=True)
