"""Rotary position embeddings (GPT-NeoX style, non-interleaved halves).

TPU-native equivalent of the rotary embedding used inside ESM3's attention
(consumed by the reference via esm.layers; see SURVEY.md §2a).  cos/sin tables
are computed once per forward and broadcast into every (scanned) layer instead
of being rebuilt per layer.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotary_tables(length: int, head_dim: int, base: float = 10000.0,
                  dtype=jnp.float32, positions=None):
    """Return (cos, sin), each (length, head_dim) — or (B, length, head_dim)
    for batched positions.

    positions: optional override of the default 0..length-1 absolute
    positions — used by sequence-packed execution, where k short rows share
    one device row and positions restart at each segment boundary (see
    nn/attention.py masking contract).  Shape (length,) when every row packs
    the same layout (the sampler's same-length packing), or (B, length) for
    ragged per-row layouts (packed training batches).
    """
    half = head_dim // 2
    inv_freq = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    if positions is None:
        pos = jnp.arange(length, dtype=jnp.float32)
    else:
        pos = positions.astype(jnp.float32)
    freqs = pos[..., :, None] * inv_freq  # (..., L, half)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (..., L, head_dim)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x):
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(x, cos, sin):
    """x: (B, L, H, Dh); cos/sin: (L, Dh) or (B, L, Dh) -> same shape as x."""
    if cos.ndim == 2:
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    else:  # batched per-row positions (packed training)
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    return (x * cos + _rotate_half(x) * sin).astype(x.dtype)
