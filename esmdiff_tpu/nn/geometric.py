"""Backbone frames (Affine3D) and geometric attention.

TPU-native reimplementation of the frame-aware machinery the reference uses
from the esm package: ``build_affine3d_from_coordinates`` (slm/models/net.py:16,441)
and the geometric attention in transformer block 0 (SURVEY.md §2a).  Frames are
plain (rot, trans) array pairs; everything is vectorized JAX — the geometric
block runs once per forward so a Pallas kernel is not warranted.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm


class Affine3D(NamedTuple):
    rot: jnp.ndarray    # (..., 3, 3) row-major rotation matrices
    trans: jnp.ndarray  # (..., 3)

    def apply(self, points):
        """Rotate+translate local points (..., 3) into the global frame."""
        return jnp.einsum("...ij,...j->...i", self.rot, points) + self.trans

    def rotate(self, vecs):
        return jnp.einsum("...ij,...j->...i", self.rot, vecs)

    def rotate_inv(self, vecs):
        return jnp.einsum("...ji,...j->...i", self.rot, vecs)

    def compose_rotation(self, other_rot):
        return Affine3D(
            rot=jnp.einsum("...ij,...jk->...ik", self.rot, other_rot),
            trans=self.trans,
        )


def gram_schmidt_frames(n, ca, c, eps: float = 1e-8) -> jnp.ndarray:
    """Build rotation matrices from N/CA/C positions (x axis toward C,
    N in the xy plane).  Returns (..., 3, 3) with *columns* e1,e2,e3 so that
    R @ local + CA = global."""
    v1 = c - ca
    v2 = n - ca
    e1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), eps)
    u2 = v2 - e1 * jnp.sum(e1 * v2, axis=-1, keepdims=True)
    e2 = u2 / jnp.maximum(jnp.linalg.norm(u2, axis=-1, keepdims=True), eps)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], axis=-1)


def build_affine3d_from_coordinates(coords):
    """coords: (B, L, 3, 3) N/CA/C positions, NaN/Inf where unknown.

    Returns (Affine3D with (B, L, 3, 3)/(B, L, 3), affine_mask (B, L) bool).
    Frameless residues get identity rotation with translation at the mean of
    valid CA positions (so distance terms stay finite), and mask=False —
    mirroring the reference's all-NaN-coords path (slm/models/net.py:433-441).
    """
    coords = coords.astype(jnp.float32)
    finite = jnp.isfinite(coords).all(axis=(-1, -2))  # (B, L)
    safe = jnp.where(finite[..., None, None], coords, 0.0)
    n, ca, c = safe[..., 0, :], safe[..., 1, :], safe[..., 2, :]
    rot = gram_schmidt_frames(n, ca, c)

    denom = jnp.maximum(finite.sum(axis=-1, keepdims=True), 1)
    mean_ca = (ca * finite[..., None]).sum(axis=-2, keepdims=True) / denom[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rot.dtype), rot.shape)
    rot = jnp.where(finite[..., None, None], rot, eye)
    trans = jnp.where(finite[..., None], ca, mean_ca)
    return Affine3D(rot=rot, trans=trans), finite


class GeometricAttention(nn.Module):
    """Frame-aware attention over Affine3D backbone frames (ESM3 block 0).

    Per head: query/key rotation vectors (direction agreement term), a value
    vector message, and query/key distance points (proximity term):
      logit[h,i,j] = softplus(w_rot[h]) * <qr_i, kr_j>/sqrt(3)
                   - softplus(w_dist[h]) * ||qd_i - kd_j||
    Values are exchanged in the global frame and rotated back into the local
    frame of the receiving residue.
    """

    d_model: int
    v_heads: int
    num_vector_messages: int = 1
    mask_and_zero_frameless: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s, affine: Affine3D, affine_mask, sequence_id=None,
                 chain_id=None):
        B, L, _ = s.shape
        H, M = self.v_heads, self.num_vector_messages
        ns = LayerNorm(name="ln")(s)
        # per-head channels: qr(3) kr(3) value(3*M) qd(3) kd(3)
        proj = nn.Dense(
            H * (12 + 3 * M), use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="proj",
        )(ns).astype(jnp.float32)
        proj = proj.reshape(B, L, H, 12 + 3 * M)
        qr, kr, qd, kd, val = jnp.split(proj, [3, 6, 9, 12], axis=-1)

        rot = affine.rot[:, :, None]      # (B, L, 1, 3, 3)
        trans = affine.trans[:, :, None]  # (B, L, 1, 3)

        def _rot(v):  # rotate local->global, v: (B, L, H, 3[*M])
            v3 = v.reshape(B, L, H, -1, 3)
            out = jnp.einsum("blhij,blhmj->blhmi", rot, v3)
            return out.reshape(v.shape)

        qr_g = _rot(qr)
        kr_g = _rot(kr)
        val_g = _rot(val)
        qd_g = _rot(qd) + trans
        kd_g = _rot(kd) + trans

        rot_scale = jax.nn.softplus(
            self.param("rotation_scale", nn.initializers.zeros, (H,),
                       self.param_dtype)
        )
        dist_scale = jax.nn.softplus(
            self.param("distance_scale", nn.initializers.zeros, (H,),
                       self.param_dtype)
        )
        rot_term = jnp.einsum("blhc,bmhc->bhlm", qr_g, kr_g) / jnp.sqrt(3.0)
        # ||qd_i - kd_j|| via the Gram expansion — avoids materializing the
        # (B, L, L, H, 3) difference tensor and keeps the L x L work on the MXU.
        qq = jnp.sum(qd_g * qd_g, axis=-1)  # (B, L, H)
        kk = jnp.sum(kd_g * kd_g, axis=-1)  # (B, L, H)
        qk = jnp.einsum("blhc,bmhc->bhlm", qd_g, kd_g)
        dist2 = (
            jnp.transpose(qq, (0, 2, 1))[:, :, :, None]
            + jnp.transpose(kk, (0, 2, 1))[:, :, None, :]
            - 2.0 * qk
        )
        dist_term = jnp.sqrt(jnp.maximum(dist2, 1e-8))
        logits = (
            rot_term * rot_scale[None, :, None, None]
            - dist_term * dist_scale[None, :, None, None]
        )

        allow = affine_mask[:, None, None, :]  # key must have a frame
        if sequence_id is not None:
            allow = allow & (
                sequence_id[:, None, :, None] == sequence_id[:, None, None, :]
            )
        if chain_id is not None:
            allow = allow & (
                chain_id[:, None, :, None] == chain_id[:, None, None, :]
            )
        logits = jnp.where(allow, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1)

        o_g = jnp.einsum("bhlm,bmhc->blhc", probs, val_g)  # global frame
        o3 = o_g.reshape(B, L, H, M, 3)
        o_local = jnp.einsum("blhji,blhmj->blhmi", rot, o3).reshape(B, L, H * M * 3)
        out = nn.Dense(
            self.d_model, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="out",
        )(o_local.astype(self.dtype))
        if self.mask_and_zero_frameless:
            out = jnp.where(affine_mask[..., None], out, 0.0)
        return out
