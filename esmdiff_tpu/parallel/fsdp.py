"""FSDP (ZeRO-3) shardings: params + grads + moments fully sharded on ``data``.

The reference's most aggressive memory strategy is DeepSpeed ZeRO-2
(configs/trainer/deepspeed.yaml:6 — optimizer moments sharded, parameters and
gradients replicated).  On HBM-constrained TPU slices that is not enough to
*fine-tune* the 1.4B trunk (fp32 params + 2 fp32 moments ≈ 17 GB replicated),
so this module provides the ZeRO-3/FSDP extension the TPU-native way: each
parameter leaf is sharded on its largest evenly-divisible axis over the same
``data`` mesh axis the batch is sharded on.  XLA all-gathers a layer's
weights just before use and reduce-scatters its gradients — the collectives
ride ICI and are emitted entirely from these annotations; there is no
hand-written collective code.

Composes with the scanned 48-layer trunk: stacked leaves (n_layers, ...,
d_in, d_out) shard a trailing feature axis, never the leading layer axis, so
each `lax.scan` iteration gathers exactly one layer's shard.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

# leaves smaller than this stay replicated: gathering a few-KB norm scale
# costs more in collective latency than the memory it saves
MIN_SHARD_SIZE = 2**14


def fsdp_sharding_for(leaf, mesh: Mesh,
                      min_size: int = MIN_SHARD_SIZE,
                      stacked: bool | None = None) -> NamedSharding:
    """Shard the largest axis evenly divisible by the mesh size; prefer the
    trailing axis on ties (keeps scan-stacked leaves sharded within a layer,
    not across layers).

    ``stacked`` marks leaves whose axis 0 is a ``lax.scan`` layer stack —
    that axis is never sharded (each scan iteration would gather one layer's
    slice from every device).  ``None`` infers it from rank (>=3), the
    pre-round-3 heuristic; ``fsdp_shardings`` passes the exact answer from
    the tree path, covering rank-2 stacked leaves like (n_layers, d) LN
    scales (ADVICE round 2)."""
    n = mesh.devices.size
    shape = tuple(np.shape(leaf))
    if n <= 1 or int(np.prod(shape, dtype=np.int64)) < min_size:
        return NamedSharding(mesh, P())
    best = None  # (dim, axis)
    if stacked is None:
        stacked = len(shape) >= 3
    start = 1 if (stacked and len(shape) >= 2) else 0
    for axis in range(start, len(shape)):
        dim = shape[axis]
        if dim % n == 0 and dim >= n and (best is None or dim >= best[0]):
            best = (dim, axis)
    if best is None:
        return NamedSharding(mesh, P())
    spec = [None] * len(shape)
    spec[best[1]] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


# Module names whose subtrees are lax.scan layer stacks (axis 0 = layer).
STACKED_MODULE_KEYS = ("blocks",)


def _is_stacked_path(path) -> bool:
    for k in path:
        name = getattr(k, "key", getattr(k, "name", None))
        if name in STACKED_MODULE_KEYS:
            return True
    return False


def fsdp_shardings(tree, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """Sharding pytree for params — and for optimizer state: moments share
    their param's shape so the same rule shards them identically, while
    scalar counts/schedules fall through to replicated.  Stacked-layer
    leaves are identified by tree position (under a scanned ``blocks``
    module), not rank, so rank-2 (n_layers, d) leaves never shard the layer
    axis either."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: fsdp_sharding_for(
            x, mesh, min_size=min_size, stacked=_is_stacked_path(p)), tree)
