"""Device-mesh construction and sharding helpers.

TPU-native replacement for the reference's four communication planes
(SURVEY.md §5 "Distributed communication backend"): torch-DDP NCCL/Gloo
process groups, GLT torch-RPC mesh, Spark shuffle, and GCS hand-off collapse
into ONE plane here — XLA collectives over a `jax.sharding.Mesh` (ICI within
a slice, DCN across slices), with jax.distributed for multi-host bring-up
(ref rendezvous: common/utils/vertex_ai_context.py:79-126 leader-file
polling → `jax.distributed.initialize`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Tuple[str, ...] = (DATA_AXIS,),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a logical mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up. Replaces the reference's leader-file rendezvous
    (vertex_ai_context.py:79-126) with jax.distributed."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def put_replicated(tree, mesh: Mesh):
    """Replicate every array leaf of a pytree across the mesh.

    Multi-process safe: when the mesh spans processes, committed
    single-device leaves are pulled to host first (device_put across a
    real process boundary accepts numpy / fully-replicated inputs only;
    every process holds the same locally-initialized values)."""
    sh = replicated(mesh)
    multiproc = jax.process_count() > 1

    def put(x):
        if not hasattr(x, "shape"):
            return x
        if multiproc and isinstance(x, jax.Array) and not x.is_fully_replicated:
            x = np.asarray(x)
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, tree)


def put_data_sharded(tree, mesh: Mesh, axis: str = DATA_AXIS):
    """Shard leading axis of every array leaf over the data axis."""
    sh = data_sharded(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "shape") else x, tree)
