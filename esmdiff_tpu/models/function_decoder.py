"""Function-token decoder (ESM3 ``ESM3_function_decoder_v0`` slot).

The reference imports the function decoder (slm/models/net.py:27,350) but the
conformation-generation task never invokes it; this implementation fills the
capability slot TPU-natively: a residue's depth-8 function-token group is
embedded (with per-depth vocabulary offsets), contextualized by a small
transformer over the depth positions, mean-pooled, and projected to InterPro
classification and keyword (TF-IDF) logits.

Geometry is fully configurable — head sizes in real ESM3 checkpoints should
be taken from the state-dict shapes at conversion time (this module has no
in-repo pretrained source; see ROUND1_NOTES.md).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.nn.layers import LayerNorm, RegressionHead
from .esm3 import ESM3Config, TransformerStack


@dataclasses.dataclass(frozen=True)
class FunctionDecoderConfig:
    d_model: int = 1024
    n_heads: int = 8
    n_layers: int = 3
    function_token_depth: int = C.FUNCTION_TOKEN_DEPTH   # 8
    function_token_vocab: int = C.FUNCTION_VOCAB_SIZE    # 260
    interpro_classes: int = 29026
    keyword_vocab: int = 58641
    dtype: str = "float32"

    def stack_config(self) -> ESM3Config:
        return ESM3Config(
            d_model=self.d_model, n_heads=self.n_heads, v_heads=0,
            n_layers=self.n_layers, n_layers_geom=0, dtype=self.dtype,
            scan_layers=False, remat=False,
        )


class FunctionTokenDecoder(nn.Module):
    cfg: FunctionDecoderConfig = FunctionDecoderConfig()

    @nn.compact
    def __call__(self, function_tokens):
        """function_tokens: (B, depth) int — one residue group per row.

        Returns dict(interpro_logits (B, interpro_classes),
        keyword_logits (B, keyword_vocab)).
        """
        cfg = self.cfg
        assert function_tokens.shape[-1] == cfg.function_token_depth
        offsets = jnp.arange(cfg.function_token_depth,
                             dtype=function_tokens.dtype) \
            * cfg.function_token_vocab
        x = nn.Embed(
            cfg.function_token_depth * cfg.function_token_vocab,
            cfg.d_model, dtype=jnp.dtype(cfg.dtype),
            param_dtype=jnp.float32, name="embed",
        )(function_tokens + offsets)
        x, _ = TransformerStack(cfg.stack_config(), name="decoder")(x)
        pooled = x.mean(axis=-2)
        kw = dict(dtype=jnp.dtype(cfg.dtype))
        return {
            "interpro_logits": RegressionHead(
                cfg.interpro_classes, name="interpro_head", **kw)(pooled),
            "keyword_logits": RegressionHead(
                cfg.keyword_vocab, name="keyword_head", **kw)(pooled),
        }
