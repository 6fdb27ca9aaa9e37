"""Multi-host (multi-process) execution runtime.

SURVEY §2.3 / BASELINE.md name "N>=2 hosts: tables sharded, towers
replicated" as the scaling point past one chip's HBM.  The layout (see
docs/multihost.md) keeps the 'model' axis — embedding-table row shards,
whose lookups all-gather touched rows every step — inside one host's ICI
domain, and spans hosts over the 'data' axis, whose gradient all-reduce
crosses DCN once per step.

Everything else in the engine is process-count agnostic: the trainer jits
one global program under the mesh and GSPMD inserts the collectives, so the
only multi-host-specific machinery is (a) runtime initialization
(`jax.distributed.initialize`), (b) a mesh construction that maps the
'model' axis over intra-process devices, and (c) per-process placement of
batch data (`jax.make_array_from_process_local_data`).  All three live here
and are unit-tested as far as a single process allows
(tests/test_multihost.py); the hardware in this environment exposes one
chip, so N>=2 processes cannot be executed, only constructed.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def initialize_from_config(config) -> bool:
    """`jax.distributed.initialize()` from config/env; returns True if a
    multi-process runtime was started.

    Config keys (each falls back to the standard JAX env vars, then to
    cluster auto-detection — on Cloud TPU pods `initialize()` discovers the
    coordinator from the metadata server with zero arguments):

    - ``multihost``            : master switch (default off)
    - ``coordinator_address``  : "host:port" of process 0
    - ``num_processes``        : world size
    - ``process_id``           : this process' rank
    """
    if not bool(config.get("multihost")):
        return False
    import jax

    kw = {}
    for cfg_key, env_key, arg in (
        ("coordinator_address", "JAX_COORDINATOR_ADDRESS", "coordinator_address"),
        ("num_processes", "JAX_NUM_PROCESSES", "num_processes"),
        ("process_id", "JAX_PROCESS_ID", "process_id"),
    ):
        v = config.get(cfg_key)
        if v is None:
            v = os.environ.get(env_key)
        if v is not None:
            kw[arg] = int(v) if arg != "coordinator_address" else str(v)
    jax.distributed.initialize(**kw)
    return True


def process_device_grid(
    devices: Sequence, n_data: int, n_model: int
) -> np.ndarray:
    """Arrange ``devices`` into an [n_data, n_model] grid whose 'model'
    rows stay within one process (one host's ICI domain).

    Devices are grouped by ``process_index``; each process' local devices
    are split into contiguous blocks of ``n_model`` and the blocks laid out
    along 'data'.  This guarantees every mesh row's 'model' neighbours are
    intra-host, so table-lookup all-gathers ride ICI and only the 'data'
    gradient all-reduce crosses DCN (docs/multihost.md layout).  Pure
    function of the device list — unit-testable with stub devices.
    """
    devices = list(devices)
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices"
        )
    by_proc: dict = {}
    for d in devices:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    rows = []
    for pid in sorted(by_proc):
        local = by_proc[pid]
        if len(local) % n_model != 0:
            raise ValueError(
                f"process {pid} has {len(local)} devices, not divisible by "
                f"model axis {n_model}; the 'model' axis must fit within "
                "one host's devices (docs/multihost.md)"
            )
        for off in range(0, len(local), n_model):
            rows.append(local[off : off + n_model])
    return np.asarray(rows, dtype=object).reshape(n_data, n_model)


def make_multihost_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
):
    """('data','model') mesh over ALL processes' devices, 'model' intra-host.

    ``mesh_shape=None`` -> (n_global_devices, 1): pure DP across the slice.
    """
    import jax
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1)
    n_data, n_model = (int(mesh_shape[0]), int(mesh_shape[1]))
    grid = process_device_grid(devices, n_data, n_model)
    return Mesh(grid, tuple(axis_names))


def put_process_local_batch(local_np: np.ndarray, mesh, spec):
    """Assemble a GLOBAL sharded array from this process' local shard.

    ``local_np``'s leading dim is the per-process slice of the global batch
    (global_batch = local * process_count along every mesh axis the spec
    shards over processes).  Single-process (tests, this environment) this
    degenerates to a plain sharded device_put of the full array.
    """
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_np)


def local_slice(global_len: int, *, process_index: Optional[int] = None,
                process_count: Optional[int] = None) -> slice:
    """This process' contiguous row range of a len-``global_len`` batch
    axis (the data loader keeps only its slice before
    ``put_process_local_batch``).

    ``jax.make_array_from_process_local_data`` requires per-process shards
    that evenly tile the global axis, so a non-divisible ``global_len`` is
    rejected here (pad the global batch first — the trainer's zero-weight
    batch padding already produces process-divisible epochs when
    ``train_batch_size`` is a multiple of the process count)."""
    import jax

    pc = process_count if process_count is not None else jax.process_count()
    pi = process_index if process_index is not None else jax.process_index()
    if global_len % pc:
        raise ValueError(
            f"global batch axis ({global_len}) must divide evenly over "
            f"{pc} processes; pad the global batch to a multiple first"
        )
    per = global_len // pc
    start = pi * per
    return slice(start, start + per)
