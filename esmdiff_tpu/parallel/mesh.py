"""Device mesh + sharding rules.

TPU-native replacement for the reference's distributed story (SURVEY.md §2b):
Lightning DDP / DeepSpeed ZeRO-2 over NCCL becomes SPMD over a JAX mesh —
parameters replicated, batches sharded on ``data``, optimizer state sharded on
``data`` (the ZeRO-2 analogue).  XLA emits the all-reduces / reduce-scatters /
all-gathers from these annotations; there is no explicit collective code.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_data_mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """Mesh over the most devices that evenly divide the global batch —
    the TPU analogue of the reference's world-size batch division
    (protein_datamodule.py:234-240)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis on ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    if jax.process_count() > 1:
        # every host materializes the same (seeded) global batch; each
        # contributes its addressable shard
        return {
            k: jax.make_array_from_process_local_data(
                data_sharding(mesh, np.ndim(v)), np.asarray(v),
                global_shape=np.shape(v))
            for k, v in batch.items()
        }
    return {
        k: jax.device_put(v, data_sharding(mesh, np.ndim(v)))
        for k, v in batch.items()
    }


def zero_sharding_for(leaf, mesh: Mesh) -> NamedSharding:
    """ZeRO-style sharding for an optimizer-state leaf: split the first axis
    divisible by the mesh size; replicate small/indivisible leaves."""
    n = mesh.devices.size
    shape = np.shape(leaf)
    for axis, dim in enumerate(shape):
        if dim % n == 0 and dim >= n:
            spec = [None] * len(shape)
            spec[axis] = DATA_AXIS
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def zero_shardings(tree, mesh: Mesh):
    return jax.tree.map(lambda x: zero_sharding_for(x, mesh), tree)


def replicated_shardings(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: rep, tree)
