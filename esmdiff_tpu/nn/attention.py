"""Attention dispatch: reference XLA path and Pallas flash-attention path.

The XLA path is a straightforward einsum formulation that the TPU compiler
fuses well for moderate L (proteins are <=1k residues).  The Pallas path
(ops/flash_attention.py) tiles Q/K/V through VMEM for long sequences and large
sample batches; select via ``backend``.
"""

from __future__ import annotations

import jax.numpy as jnp

_FLASH_MIN_LEN = 256  # below this, XLA's fused softmax wins on v5e


def dot_product_attention(
    q, k, v, bias=None, mask=None, backend: str = "auto"
):
    """q,k,v: (B, L, H, Dh).  mask: (B, 1|H, L, L) bool, True = attend.

    Softmax is accumulated in fp32 regardless of the io dtype (bf16-safe).
    """
    if backend == "auto":
        backend = "flash" if (q.shape[1] >= _FLASH_MIN_LEN and bias is None) else "xla"
    if backend == "flash":
        from esmdiff_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, mask=mask)
    return _xla_attention(q, k, v, bias=bias, mask=mask)


def _xla_attention(q, k, v, bias=None, mask=None):
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, dtype=jnp.float32))
    logits = jnp.einsum(
        "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.asarray(-1e9, logits.dtype))
    probs = jnp.exp(
        logits - jnp.max(logits, axis=-1, keepdims=True)
    )
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", probs, v)


def sequence_id_mask(sequence_id):
    """(B, L) int ids -> (B, 1, L, L) bool attention mask (same-id attends)."""
    if sequence_id is None:
        return None
    m = sequence_id[:, None, :] == sequence_id[:, :, None]
    return m[:, None, :, :]
