"""Device mesh + sharding rules (no counterpart in the single-GPU reference).

Axes:
- ``data``: batch dimension of training/eval batches (data parallel);
  gradients are combined by XLA-inserted all-reduces over this axis.
- ``model``: row dimension of the user/item embedding tables (the catalog
  axis SURVEY.md §2.3 identifies as this workload's scaling axis); lookups
  become XLA-inserted collectives over ICI.

Everything rides GSPMD: parameters are placed with `NamedSharding` and the
jitted train step simply computes — XLA partitions the SpMM, the table
gathers, the U x I eval matmul and the top-k, inserting psum/all-gather
where the shardings demand.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# The process-wide mesh the training session runs under (None = single
# device).  Kernel dispatchers (graph/sparse.py, ops/fused_bip.py,
# ops/masked_attn.py) consult this to wrap their Pallas calls in shard_map —
# a pallas_call is an opaque custom call GSPMD cannot partition, so without
# the wrapper a sharded operand would be all-gathered at the kernel boundary.
_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def model_axis_size(mesh: Optional[Mesh] = None) -> int:
    mesh = mesh if mesh is not None else _ACTIVE_MESH
    return int(mesh.shape.get("model", 1)) if mesh is not None else 1


def collect_table_dims(tree, base_dims: Sequence[int]) -> list:
    """Base node counts plus the PADDED storage row counts of any dense /
    bit-packed adjacency blocks in ``tree`` (tile-padded fused layouts store
    [Up, Ip] with Up != n_users, which the plain dim match would miss)."""
    dims = set(int(d) for d in base_dims)
    try:
        from recommendar_systems_tpu.graph.sparse import BitBip, DenseBip
    except ImportError:  # pragma: no cover
        return sorted(dims)
    for node in jax.tree_util.tree_leaves(
        tree, is_leaf=lambda n: isinstance(n, (DenseBip, BitBip))
    ):
        if isinstance(node, DenseBip):
            dims.add(int(node.ur.shape[0]))
        elif isinstance(node, BitBip):
            dims.add(int(node.bits.shape[0]))
    return sorted(dims)


def make_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a 2D ('data', 'model') mesh over the available devices.

    ``mesh_shape=None`` puts every device on the 'data' axis (pure DP),
    which is the right default for one host.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1)
    mesh_shape = tuple(int(x) for x in mesh_shape)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh_shape {mesh_shape} != {n} devices")
    arr = np.asarray(devices).reshape(mesh_shape)
    return Mesh(arr, tuple(axis_names)[: arr.ndim])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Row-sharded embedding table over the 'model' axis."""
    return NamedSharding(mesh, P("model", None))


def shard_params(params, mesh: Mesh, table_dims: Sequence[int], shard_tables: bool = True):
    """Place parameters on the mesh: 2D tables whose leading dim matches a
    user/item/node count are row-sharded over 'model'; when the row count
    does not divide the axis (real catalogs rarely do) the table falls back
    to column (embedding-dim) sharding — the memory win is the same and
    GSPMD turns the U x I eval matmul into a contraction-dim psum.
    Everything else is replicated."""
    table_dims = set(int(d) for d in table_dims)
    model_size = mesh.shape.get("model", 1)

    def place(leaf):
        if (
            shard_tables
            and model_size > 1
            and hasattr(leaf, "ndim")
            and leaf.ndim == 2
            and leaf.shape[0] in table_dims
        ):
            if leaf.shape[0] % model_size == 0:
                return jax.device_put(leaf, table_sharding(mesh))
            if leaf.shape[1] % model_size == 0:
                return jax.device_put(leaf, NamedSharding(mesh, P(None, "model")))
        return jax.device_put(leaf, replicated(mesh))

    return jax.tree_util.tree_map(place, params)
