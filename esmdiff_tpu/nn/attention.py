"""Attention dispatch: reference XLA path and Pallas flash-attention path.

The XLA path is a straightforward einsum formulation that the TPU compiler
fuses well for moderate L (proteins are <=1k residues).  The Pallas path
(ops/flash_attention.py) tiles Q/K/V through VMEM for long sequences and large
sample batches; select via ``backend``.

Masking contract:
  - ``lengths`` (B,) int32 — contiguous-prefix valid lengths (bucketed
    padding).  Supported by BOTH paths; the only masking form the flash
    kernel accepts.
  - ``mask`` (B, 1|H, L, L) bool — arbitrary masks (packed multi-chain
    ``sequence_id`` blocks, ...).  XLA path ONLY: the flash kernel would
    silently mis-attend on non-prefix masks, so requesting ``backend="flash"``
    with a mask raises at trace time instead.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

# In-scan measurements on v5e: the round-5 GROUPED Pallas kernel (G
# batch*head slices per program, ops/flash_attention._pick_group) moved the
# crossover down to 512 — in-trunk full-size sweeps (scripts/attn_sweep.py)
# measure flash 195.9 vs XLA 202.7 ms/step at L=512 B=16 and pure-op wins of
# 1.8x at L=512 / 2.0x at L=1024 (scripts/attn_kernel_bench.py).  At L=256
# XLA still wins in-trunk (360.8 vs 385.2): the op-level win (1.54 vs 1.96
# ms) is smaller than the 4 layout copies the pallas_call forces around
# itself — (B,L,H,Dh)->(B*H,L,Dh) transposes XLA fuses away on its own path
# but must materialize for the kernel (PERF.md round-5 kernel table).
# ESMDIFF_FLASH_MIN_LEN overrides for experiments.
_FLASH_MIN_LEN = int(os.environ.get("ESMDIFF_FLASH_MIN_LEN", "512"))


def dot_product_attention(
    q, k, v, bias=None, mask=None, lengths=None, backend: str = "auto"
):
    """q,k,v: (B, L, H, Dh).  mask: (B, 1|H, L, L) bool, True = attend.
    lengths: (B,) int32 valid-prefix lengths (mutually exclusive with mask).

    Softmax is accumulated in fp32 regardless of the io dtype (bf16-safe).
    """
    if mask is not None and lengths is not None:
        raise ValueError("pass either `mask` or `lengths`, not both")
    if backend == "auto":
        backend = (
            "flash"
            if (q.shape[1] >= _FLASH_MIN_LEN and bias is None and mask is None)
            else "xla"
        )
    if backend == "flash":
        if mask is not None:
            raise ValueError(
                "the flash path accepts only `lengths` (prefix padding); "
                "arbitrary masks must use the XLA path (backend='xla'/'auto')"
            )
        from esmdiff_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, lengths=lengths)
    if lengths is not None:
        L = q.shape[1]
        key_ok = jnp.arange(L)[None, :] < lengths[:, None]
        mask = key_ok[:, None, None, :]
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
