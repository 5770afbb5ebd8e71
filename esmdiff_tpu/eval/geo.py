"""Rigid alignment + RMSD (JAX, batched).

TPU-native equivalent of the reference's Kabsch stack
(slm/utils/geo_utils.py:58-231).  All functions are jit/vmap-safe; the batched
path replaces the reference's scatter/sparse implementation with a plain
leading batch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def kabsch(P, Q):
    """Optimal rotation/translation aligning P onto Q (both (N, 3)).

    Returns (R (3, 3), t (3,)) with ``P @ R.T + t ~= Q``.
    """
    cp = P.mean(axis=0)
    cq = Q.mean(axis=0)
    H = (P - cp).T @ (Q - cq)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) * jnp.stack(
        [jnp.asarray(1.0), jnp.asarray(1.0), d]))
    R = Vt.T @ D @ U.T
    t = cq - R @ cp
    return R, t


def align(P, Q):
    """Align P onto Q; returns transformed P."""
    R, t = kabsch(P, Q)
    return P @ R.T + t


def rmsd(P, Q, align_first: bool = True):
    """Root-mean-square deviation between (N, 3) point sets."""
    if align_first:
        P = align(P, Q)
    return jnp.sqrt(jnp.mean(jnp.sum((P - Q) ** 2, axis=-1)))


# batched versions: (B, N, 3) vs (N, 3) or (B, N, 3)
align_batched = jax.vmap(align, in_axes=(0, None))
rmsd_batched = jax.vmap(rmsd, in_axes=(0, None))
rmsd_pairwise_batched = jax.vmap(rmsd, in_axes=(0, 0))


def pairwise_rmsd_matrix(X):
    """(M, N, 3) ensemble -> (M, M) aligned-RMSD matrix."""
    M = X.shape[0]

    def row(i):
        return jax.vmap(lambda j: rmsd(X[i], X[j]))(jnp.arange(M))

    return jax.vmap(row)(jnp.arange(M))


def radius_of_gyration(X):
    """(..., N, 3) -> (...,) Rg (reference eval_utils.py:105)."""
    center = X.mean(axis=-2, keepdims=True)
    return jnp.sqrt(jnp.mean(jnp.sum((X - center) ** 2, axis=-1), axis=-1))


def pairwise_distances(X):
    """(..., N, 3) -> (..., N*(N-1)/2) condensed pairwise CA distances."""
    N = X.shape[-2]
    d = jnp.sqrt(
        jnp.sum((X[..., :, None, :] - X[..., None, :, :]) ** 2, axis=-1)
        + 1e-12
    )
    iu = np.triu_indices(N, k=1)
    return d[..., iu[0], iu[1]]


def rmsf(X):
    """(M, N, 3) aligned ensemble -> (N,) per-residue fluctuation."""
    mean = X.mean(axis=0, keepdims=True)
    return jnp.sqrt(jnp.mean(jnp.sum((X - mean) ** 2, axis=-1), axis=0))
