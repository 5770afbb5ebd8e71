"""Sequence-parallel exact attention: a K/V ring over a mesh axis.

The reference bounds sequence length instead of scaling it (random crop to
512 in training, curation cap at 1000 residues; SURVEY.md §5 long-context
stance) and ships no sequence parallelism.  This module is the idiomatic TPU
extension for chains beyond one chip's attention memory: Q/K/V are sharded on
the length axis over ``axis_name``, each device holds an L/N slice, and K/V
blocks rotate around the ring via ``jax.lax.ppermute`` (neighbor exchange
over ICI) while softmax is accumulated online (flash-style m/l carry).  The
result is *exact* — parity with ``nn.attention.dot_product_attention`` is
pinned in tests/test_parallel.py.

Masking contract matches the flash kernel (ops/flash_attention.py): prefix
``lengths`` only — padding in this framework is always a contiguous suffix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

SEQ_AXIS = "seq"


def _local_ring(q, k, v, lengths, *, axis_name: str, n_shards: int,
                scale: float):
    """Per-device body: q/k/v (B, Lc, H, Dh) local shards, lengths (B,)
    replicated.  n_shards ppermute rounds; block provenance tracked by
    (my_index - round) mod n so key-position masking stays global."""
    my = jax.lax.axis_index(axis_name)
    B, Lc, H, Dh = q.shape
    perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]

    m0 = jnp.full((B, H, Lc, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, Lc, 1), jnp.float32)
    acc0 = jnp.zeros((B, H, Lc, Dh), jnp.float32)

    def body(carry, i):
        k_c, v_c, m, l, acc = carry
        src = jax.lax.rem(my - i + n_shards, n_shards)
        kpos = src * Lc + jnp.arange(Lc, dtype=jnp.int32)
        s = jnp.einsum("blhd,bmhd->bhlm", q, k_c,
                       preferred_element_type=jnp.float32) * scale
        valid = kpos[None, :] < lengths[:, None]            # (B, Lc)
        s = jnp.where(valid[:, None, None, :], s, -1e9)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum(
            "bhlm,bmhd->bhld", p, v_c.astype(jnp.float32))
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        return (k_c, v_c, m_new, l_new, acc_new), None

    (_, _, _, l, acc), _ = jax.lax.scan(
        body, (k, v, m0, l0, acc0), jnp.arange(n_shards, dtype=jnp.int32))
    o = acc / l                                             # (B, H, Lc, Dh)
    return jnp.transpose(o, (0, 2, 1, 3)).astype(q.dtype)   # (B, Lc, H, Dh)


def ring_attention(q, k, v, lengths=None, *, mesh: Mesh,
                   axis_name: str = SEQ_AXIS):
    """Exact attention with the length axis sharded over ``axis_name``.

    q, k, v: (B, L, H, Dh) global views sharded P(None, axis_name, None,
    None); L must divide evenly by the axis size.  lengths: (B,) int32
    valid-prefix lengths (replicated), or None for fully-valid rows.
    """
    n = mesh.shape[axis_name]
    B, L = q.shape[0], q.shape[1]
    if L % n != 0:
        raise ValueError(f"L={L} not divisible by {axis_name} axis size {n}")
    if lengths is None:
        lengths = jnp.full((B,), L, jnp.int32)
    scale = 1.0 / float(q.shape[-1]) ** 0.5
    spec = P(None, axis_name, None, None)
    fn = jax.shard_map(
        functools.partial(_local_ring, axis_name=axis_name, n_shards=n,
                          scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None)),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v, lengths)
