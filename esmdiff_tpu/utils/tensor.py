"""Tensor helpers (JAX): masked mean, batched gather, chunked apply, distogram.

Parity with the OpenFold-derived helpers the reference vendors
(slm/utils/tensor_utils.py:24-283).  ``chunk_apply`` is the jax equivalent of
chunk_layer (:173): map a function over leading-axis chunks to bound peak
memory (lax.map over reshaped chunks keeps it one compiled program).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def masked_mean(mask, value, axis=None, eps: float = 1e-4):
    mask = mask.astype(value.dtype)
    return (mask * value).sum(axis=axis) / (
        mask.sum(axis=axis) + eps)


def batched_gather(data, inds, axis: int = 0):
    """Gather along ``axis`` with per-batch indices (leading dims shared)."""
    return jnp.take_along_axis(data, inds, axis=axis)


def chunk_apply(fn: Callable, x, chunk_size: int):
    """Apply ``fn`` over leading-axis chunks of x (pytree-compatible),
    trading parallelism for peak memory."""
    leaves = jax.tree.leaves(x)
    n = leaves[0].shape[0]
    if n <= chunk_size:
        return fn(x)
    n_full = (n // chunk_size) * chunk_size

    def reshape(a):
        return a[:n_full].reshape(n_full // chunk_size, chunk_size,
                                  *a.shape[1:])

    chunked = jax.tree.map(reshape, x)
    out = jax.lax.map(fn, chunked)
    out = jax.tree.map(
        lambda a: a.reshape(n_full, *a.shape[2:]), out)
    if n_full < n:
        rest = fn(jax.tree.map(lambda a: a[n_full:], x))
        out = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), out, rest)
    return out


def distogram(ca_coords, min_bin: float = 2.3125, max_bin: float = 21.6875,
              n_bins: int = 64):
    """(..., L, 3) -> (..., L, L) int32 distance-bin indices."""
    d = jnp.sqrt(jnp.sum(
        (ca_coords[..., :, None, :] - ca_coords[..., None, :, :]) ** 2,
        axis=-1) + 1e-12)
    edges = jnp.linspace(min_bin, max_bin, n_bins - 1)
    return jnp.sum(d[..., None] > edges, axis=-1).astype(jnp.int32)


def pseudo_beta(atom37_positions, aatype, gly_index: int = 7):
    """CB coordinates with CA fallback for glycine (atom37 layout)."""
    ca = atom37_positions[..., 1, :]
    cb = atom37_positions[..., 3, :]
    is_gly = (aatype == gly_index)[..., None]
    return jnp.where(is_gly, ca, cb)
