"""Tensor parallelism for the trunk: 2-D (data, model) mesh shardings.

Megatron-style column/row parallel linears expressed purely as GSPMD sharding
annotations — no collective code.  XLA inserts the all-reduce after the
attention-out and FFN-down projections from these param shardings:

  qkv / ffn-up / geom proj kernels : output features sharded on "model"
  out / ffn-down / geom out kernels: input features sharded on "model"
  embeddings, norms, heads, scalars: replicated

The reference has no TP (SURVEY.md §2b: DDP + ZeRO-2 only); this is the
optional scale-out path for HBM-constrained fine-tuning of the 1.4B trunk.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# (path-suffix, axis-from-the-right to shard): -1 = output features (column
# parallel), -2 = input features (row parallel).
_TP_RULES: list[tuple[tuple[str, ...], int]] = [
    (("attn", "qkv", "kernel"), -1),
    (("attn", "out", "kernel"), -2),
    (("ffn", "up", "kernel"), -1),
    (("ffn", "down", "kernel"), -2),
    (("geom_attn", "proj", "kernel"), -1),
    (("geom_attn", "out", "kernel"), -2),
]


def make_2d_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(devices)}")
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _spec_for(path: tuple[str, ...], ndim: int,
              shape: tuple[int, ...], n_model: int) -> P:
    for suffix, axis in _TP_RULES:
        if path[-len(suffix):] == suffix:
            ax = ndim + axis
            if shape[ax] % n_model != 0:
                return P()
            spec = [None] * ndim
            spec[ax] = MODEL_AXIS
            return P(*spec)
    return P()


def trunk_param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a trunk param pytree (scan-stacked layers get
    the same rule applied to their trailing dims)."""
    import flax

    n_model = mesh.shape[MODEL_AXIS]
    flat = flax.traverse_util.flatten_dict(params)
    out = {
        path: NamedSharding(
            mesh,
            _spec_for(tuple(path), np.ndim(leaf), np.shape(leaf), n_model),
        )
        for path, leaf in flat.items()
    }
    return flax.traverse_util.unflatten_dict(out)


def mdlm_param_shardings(params, mesh: Mesh):
    """Shardings for the MDLM param dict {"net", "sigma_embedder"}."""
    rep = NamedSharding(mesh, P())
    return {
        "net": trunk_param_shardings(params["net"], mesh),
        "sigma_embedder": jax.tree.map(
            lambda _: rep, params["sigma_embedder"]),
    }


def _path_names(path) -> tuple[str, ...]:
    out = []
    for k in path:
        name = getattr(k, "key", getattr(k, "name", None))
        if name is not None:
            out.append(str(name))
    return tuple(out)


def tp_shardings_for_tree(tree, mesh: Mesh, zero_data: bool = False):
    """TP shardings for ANY pytree containing trunk-shaped subtrees (params
    or optimizer moments — optax moments mirror the param tree, so the same
    path-suffix rules shard them identically).  Leaves with no TP rule are
    replicated, or ZeRO-sharded on ``data`` when ``zero_data`` (the ZeRO-2 x
    TP composition used by ``trainer.strategy=dpNxtpM`` for optimizer
    state)."""
    from .mesh import zero_sharding_for

    n_model = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        names = _path_names(path)
        spec = _spec_for(names, np.ndim(leaf), np.shape(leaf), n_model)
        if spec == P() and zero_data:
            return zero_sharding_for(leaf, mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, tree)


def parse_tp_strategy(strategy: str):
    """'dp{N}xtp{M}' or 'tp{M}' -> (n_data, n_model); None otherwise."""
    import re

    m = re.fullmatch(r"dp(\d+)xtp(\d+)", strategy)
    if m:
        return int(m.group(1)), int(m.group(2))
    m = re.fullmatch(r"tp(\d+)", strategy)
    if m:
        return 1, int(m.group(1))
    return None


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch_2d(batch: dict, mesh: Mesh) -> dict:
    return {
        k: jax.device_put(v, batch_sharding(mesh, np.ndim(v)))
        for k, v in batch.items()
    }
