"""Core transformer building blocks of the ESM3 trunk, in flax.linen.

TPU-first reimplementation of the layer semantics the reference pulls from the
``esm`` package (TransformerStack blocks: pre-norm attention with QK-layernorm
+ rotary, SwiGLU FFN, 1/sqrt(n_layers/36) residual scaling; RegressionHead).
See SURVEY.md §2a for the parity table.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .attention import dot_product_attention
from .rotary import apply_rotary


class LayerNorm(nn.Module):
    """LayerNorm computed in fp32, no bias (ESM3 convention).

    use_scale=False owns NO scale param and skips the gamma multiply — used
    by the int8 path, where quantize_trunk_params folds gamma into the
    following projection's quantized weights (exact reassociation; kills
    the per-layer f32[d] gamma slice copies the round-3 profile measured
    at ~6 ms/step in the 25-step scan)."""

    use_bias: bool = False
    use_scale: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + 1e-5))
        if self.use_scale:
            scale = self.param(
                "scale", nn.initializers.ones, (x.shape[-1],),
                self.param_dtype
            )
            y = y * scale
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (x.shape[-1],), self.param_dtype
            )
            y = y + bias
        return y.astype(orig_dtype)


class _ScaleParam(nn.Module):
    """Param container matching LayerNorm's {scale} tree — lets the fused
    QKV path own the identical checkpoint entries without running the op."""

    dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        return self.param("scale", nn.initializers.ones, (self.dim,),
                          self.param_dtype)


class _KernelParam(nn.Module):
    """Param container matching nn.Dense(use_bias=False)'s {kernel} tree."""

    shape: tuple
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, self.param_dtype)


class MultiHeadAttention(nn.Module):
    """ESM3 attention: fused LN+QKV projection, per-track QK layernorm over the
    full model dim, rotary applied per head, no biases.

    qkv_backend: "xla" = LN/Dense/LN as separate XLA ops; "fused" = one
    Pallas VMEM pass (ops/fused_qkv.py) — identical params and numerics.
    """

    d_model: int
    n_heads: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"
    qkv_backend: str = "xla"
    quant: str = "none"  # "int8" = W8A8 projections (ops/quant.py)

    @nn.compact
    def __call__(self, x, rot_cos, rot_sin, mask=None, lengths=None):
        B, L, D = x.shape
        dh = self.d_model // self.n_heads
        if self.quant == "int8":
            if self.qkv_backend == "fused":
                raise ValueError("quant='int8' is incompatible with "
                                 "qkv_backend='fused'")
            from esmdiff_tpu.ops.quant import QuantDense

            # gamma is folded into the quantized qkv kernel (ops/quant.py)
            h = LayerNorm(name="ln", use_scale=False)(x)
            qkv = QuantDense(3 * self.d_model, dtype=self.dtype,
                             name="qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = LayerNorm(name="q_ln")(q)
            k = LayerNorm(name="k_ln")(k)
        elif self.qkv_backend == "fused":
            from esmdiff_tpu.ops.fused_qkv import fused_ln_qkv

            ln_s = _ScaleParam(D, self.param_dtype, name="ln")()
            w = _KernelParam((D, 3 * self.d_model), self.param_dtype,
                             name="qkv")()
            q_s = _ScaleParam(self.d_model, self.param_dtype, name="q_ln")()
            k_s = _ScaleParam(self.d_model, self.param_dtype, name="k_ln")()
            qkv = fused_ln_qkv(x, ln_s, w.astype(self.dtype), q_s, k_s)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            h = LayerNorm(name="ln")(x)
            qkv = nn.Dense(
                3 * self.d_model, use_bias=False, dtype=self.dtype,
                param_dtype=self.param_dtype, name="qkv",
            )(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = LayerNorm(name="q_ln")(q)
            k = LayerNorm(name="k_ln")(k)
        q = q.reshape(B, L, self.n_heads, dh)
        k = k.reshape(B, L, self.n_heads, dh)
        v = v.reshape(B, L, self.n_heads, dh)
        if self.attn_backend == "small" and mask is None:
            # OPT-IN fused short-L path: rotary + scores + softmax + P*V in
            # one VMEM pass (ops/small_attention.py).  Measured round 3
            # (PERF.md): in-scan it LOSES to XLA at every protein length
            # (L=64: 95.9 vs 93.9 ms/step; L=128: 210.9 vs 167.9) — XLA's
            # fused attention + cross-op scheduling is the frontier here, so
            # "auto" never selects this kernel.
            from esmdiff_tpu.ops.small_attention import small_attention

            o = small_attention(q, k, v, rot_cos, rot_sin, lengths)
        else:
            q = apply_rotary(q, rot_cos, rot_sin)
            k = apply_rotary(k, rot_cos, rot_sin)
            o = dot_product_attention(q, k, v, mask=mask, lengths=lengths,
                                      backend=self.attn_backend)
        o = o.reshape(B, L, self.d_model)
        if self.quant == "int8":
            from esmdiff_tpu.ops.quant import QuantDense

            return QuantDense(self.d_model, dtype=self.dtype, name="out")(o)
        return nn.Dense(
            self.d_model, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="out",
        )(o)


class SwiGLUFFN(nn.Module):
    """Pre-norm SwiGLU MLP: LN -> Dense(d, 2h) -> silu(a)*b -> Dense(h, d)."""

    d_model: int
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        if self.quant == "int8":
            from esmdiff_tpu.ops.quant import QuantDense

            # gamma folded into the quantized up-projection (ops/quant.py)
            h = LayerNorm(name="ln", use_scale=False)(x)
            up = QuantDense(2 * self.hidden, dtype=self.dtype, name="up")(h)
            a, b = jnp.split(up, 2, axis=-1)
            return QuantDense(self.d_model, dtype=self.dtype,
                              name="down")(nn.silu(a) * b)
        h = LayerNorm(name="ln")(x)
        up = nn.Dense(
            2 * self.hidden, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="up",
        )(h)
        a, b = jnp.split(up, 2, axis=-1)
        h = nn.silu(a) * b
        return nn.Dense(
            self.d_model, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="down",
        )(h)


def swiglu_hidden_dim(d_model: int, expansion_ratio: float = 8 / 3) -> int:
    """SwiGLU hidden width rounded up to a multiple of 256 (MXU-friendly and
    matches ESM3: d_model=1536 -> 4096)."""
    return int(((expansion_ratio * d_model) + 255) // 256 * 256)


class RegressionHead(nn.Module):
    """Dense -> GELU -> LayerNorm -> Dense projection head (reference
    slm/models/net.py:301-303 uses esm's RegressionHead)."""

    output_dim: int
    hidden_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = self.hidden_dim or x.shape[-1]
        h = nn.Dense(
            hidden, dtype=self.dtype, param_dtype=self.param_dtype, name="dense",
        )(x)
        # exact (erf) GELU — torch nn.GELU()'s default, which the reference's
        # RegressionHead uses; flax's default tanh approximation diverges at
        # the 1e-4 level (caught by convert/verify.py)
        h = nn.gelu(h, approximate=False)
        h = LayerNorm(use_bias=True, name="ln")(h)
        out = nn.Dense(
            self.output_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="out",
        )(h)
        return out.astype(jnp.float32)


class TimestepEmbedder(nn.Module):
    """Sinusoidal frequency embedding + 2-layer SiLU MLP (reference
    slm/models/net.py:486-522)."""

    hidden_size: int
    frequency_embedding_size: int = 256
    max_period: float = 10000.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        half = self.frequency_embedding_size // 2
        freqs = jnp.exp(
            -jnp.log(self.max_period)
            * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = t.astype(jnp.float32)[:, None] * freqs[None]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        h = nn.Dense(
            self.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype,
            name="fc1",
        )(emb.astype(self.dtype))
        h = nn.silu(h)
        return nn.Dense(
            self.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype,
            name="fc2",
        )(h)
