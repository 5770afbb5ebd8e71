"""Output heads for the ESM3 trunk.

Mirrors the reference's swappable-head design: the stock multi-track
``OutputHeads`` and the fine-tune ``StructureOutputHeads`` replacement
(slm/models/net.py:298-320,346,363-366).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import linen as nn

from esmdiff_tpu.core import constants as C
from .layers import RegressionHead


class ESMOutput(NamedTuple):
    sequence_logits: jnp.ndarray
    structure_logits: jnp.ndarray
    secondary_structure_logits: jnp.ndarray
    sasa_logits: jnp.ndarray
    function_logits: jnp.ndarray
    residue_logits: jnp.ndarray
    embeddings: jnp.ndarray


class OutputHeads(nn.Module):
    """Stock ESM3 per-track regression heads (structure head is 4096-way)."""

    d_model: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, embed) -> ESMOutput:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        B, L, _ = x.shape
        fn_logits = RegressionHead(
            C.FUNCTION_VOCAB_SIZE * C.FUNCTION_TOKEN_DEPTH,
            name="function_head", **kw,
        )(x).reshape(B, L, C.FUNCTION_TOKEN_DEPTH, C.FUNCTION_VOCAB_SIZE)
        return ESMOutput(
            sequence_logits=RegressionHead(
                C.SEQUENCE_EMBED_SIZE, name="sequence_head", **kw)(x),
            structure_logits=RegressionHead(
                C.VQVAE_CODEBOOK_SIZE, name="structure_head", **kw)(x),
            secondary_structure_logits=RegressionHead(
                C.SS8_VOCAB_SIZE, name="ss8_head", **kw)(x),
            sasa_logits=RegressionHead(
                C.SASA_VOCAB_SIZE, name="sasa_head", **kw)(x),
            function_logits=fn_logits,
            residue_logits=RegressionHead(
                C.RESIDUE_ANNOTATION_VOCAB_SIZE, name="residue_head", **kw)(x),
            embeddings=embed,
        )


class StructureOutputHeads(nn.Module):
    """Fine-tune replacement: 4101-way structure head (+ optional sequence
    head), dummy zeros elsewhere — reference slm/models/net.py:298-320."""

    d_model: int
    n_structure_heads: int = C.STRUCTURE_VOCAB_SIZE
    n_sequence_heads: int = 0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, embed) -> ESMOutput:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        structure_logits = RegressionHead(
            self.n_structure_heads, name="structure_head", **kw)(x)
        dummy = jnp.zeros_like(structure_logits)
        if self.n_sequence_heads:
            sequence_logits = RegressionHead(
                self.n_sequence_heads, name="sequence_head", **kw)(x)
        else:
            sequence_logits = dummy
        return ESMOutput(
            sequence_logits=sequence_logits,
            structure_logits=structure_logits,
            secondary_structure_logits=dummy,
            sasa_logits=dummy,
            function_logits=dummy,
            residue_logits=dummy,
            embeddings=embed,
        )
