"""Input-track embedding sum (ESM3 ``EncodeInputs`` equivalent).

The reference feeds 8 token tracks through per-track embeddings and sums them
(slm/models/net.py:455-464).  All tables live here so the checkpoint converter
has a single mapping site.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from esmdiff_tpu.core import constants as C


def rbf(values, v_min: float, v_max: float, n_bins: int):
    """Radial basis encoding of a scalar track, (...,) -> (..., n_bins)."""
    centers = jnp.linspace(v_min, v_max, n_bins, dtype=jnp.float32)
    std = (v_max - v_min) / n_bins
    z = (values.astype(jnp.float32)[..., None] - centers) / std
    return jnp.exp(-z * z)


class EncodeInputs(nn.Module):
    d_model: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sequence_tokens,            # (B, L) int
        structure_tokens,           # (B, L) int
        average_plddt,              # (B, L) float in [0, 1]
        per_res_plddt,              # (B, L) float in [0, 1]
        ss8_tokens,                 # (B, L) int
        sasa_tokens,                # (B, L) int
        function_tokens,            # (B, L, 8) int
        residue_annotation_tokens,  # (B, L, 16) int
    ):
        emb = nn.Embed(
            C.SEQUENCE_EMBED_SIZE, self.d_model, dtype=self.dtype,
            param_dtype=self.param_dtype, name="sequence_embed",
        )(sequence_tokens)
        emb += nn.Embed(
            C.STRUCTURE_VOCAB_SIZE, self.d_model, dtype=self.dtype,
            param_dtype=self.param_dtype, name="structure_tokens_embed",
        )(structure_tokens)
        emb += nn.Dense(
            self.d_model, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="average_plddt_proj",
        )(rbf(average_plddt, 0.0, 1.0, 16).astype(self.dtype))
        emb += nn.Dense(
            self.d_model, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="per_res_plddt_proj",
        )(rbf(per_res_plddt, 0.0, 1.0, 16).astype(self.dtype))
        emb += nn.Embed(
            C.SS8_VOCAB_SIZE, self.d_model, dtype=self.dtype,
            param_dtype=self.param_dtype, name="ss8_embed",
        )(ss8_tokens)
        emb += nn.Embed(
            C.SASA_VOCAB_SIZE, self.d_model, dtype=self.dtype,
            param_dtype=self.param_dtype, name="sasa_embed",
        )(sasa_tokens)
        # function: depth-8 token stack, each depth embeds to d_model/8 and the
        # slices are concatenated.
        fn = nn.Embed(
            C.FUNCTION_VOCAB_SIZE * C.FUNCTION_TOKEN_DEPTH,
            self.d_model // C.FUNCTION_TOKEN_DEPTH,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="function_embed",
        )(
            function_tokens
            + jnp.arange(C.FUNCTION_TOKEN_DEPTH, dtype=function_tokens.dtype)
            * C.FUNCTION_VOCAB_SIZE
        )
        emb += fn.reshape(*fn.shape[:-2], self.d_model)
        # residue annotations: bag-of-annotations sum, pad rows excluded.
        ra = nn.Embed(
            C.RESIDUE_ANNOTATION_VOCAB_SIZE, self.d_model, dtype=self.dtype,
            param_dtype=self.param_dtype, name="residue_embed",
        )(residue_annotation_tokens)
        not_pad = (residue_annotation_tokens != C.RESIDUE_PAD_TOKEN)
        emb += jnp.sum(ra * not_pad[..., None].astype(ra.dtype), axis=-2)
        return emb
