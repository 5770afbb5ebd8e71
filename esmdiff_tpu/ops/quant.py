"""W8A8 int8 quantized matmuls for the inference path.

The v5e MXU executes s8 x s8 -> s32 dot products at 394 TOPS — 2x the
bf16 rate (197 TFLOPs) — and int8 weights quarter the per-step weight HBM
traffic vs the fp32 checkpoints the samplers feed through jit today.  This
module provides:

  - ``quantize_weight``: symmetric per-output-channel absmax quantization
    of a Dense kernel (supports scan-stacked rank-3 kernels);
  - ``int8_dot``: dynamic per-token activation quantization + int8
    dot_general with int32 accumulation and an fp32 dequant epilogue;
  - ``QuantDense``: drop-in replacement for ``nn.Dense(use_bias=False)``
    that owns pre-quantized params (``kernel_q`` int8 + ``scale`` fp32);
  - ``quantize_trunk_params``: converts a trained fp32 trunk tree to the
    QuantDense layout, folding the pre-projection LayerNorm gammas into
    the qkv/up kernels (exact reassociation — see ``_FOLD_LN``).

Quantization recipe (standard W8A8 dynamic): weights are quantized once,
offline, per output channel; activations are quantized per token (row)
inside the step with a dynamically computed absmax scale, which keeps the
method calibration-free.  Everything accumulates in int32 on the MXU and
dequantizes in fp32.  Opt-in via ``ESM3Config(quant="int8")`` — the
reference has no analogue (CUDA/torch fp32/bf16 only, slm/models/net.py);
this is a TPU-native serving optimization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def quantize_weight(w, contract_axis: int = -2):
    """Symmetric per-output-channel int8 quantization of a Dense kernel.

    w: (..., D, F) fp32/bf16 kernel (contraction dim second-to-last, output
    features last — nn.Dense layout; a leading layer-stack axis is fine).
    Returns (q: int8 same shape, scale: fp32 with the contraction axis
    reduced away) such that ``q * scale ~= w``.
    """
    w32 = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=contract_axis, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(s, axis=contract_axis)


def int8_dot(x, kernel_q, scale, out_dtype=jnp.bfloat16):
    """Dynamically quantize activations per token and contract on the MXU
    in int8.

    x: (..., D) activations (any float dtype); kernel_q: (D, F) int8;
    scale: (F,) fp32 per-output-channel weight scales.
    """
    x32 = jnp.asarray(x, jnp.float32)
    sa = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    sa = jnp.maximum(sa, 1e-12)
    xq = jnp.clip(jnp.round(x32 / sa), -127, 127).astype(jnp.int8)
    o = jax.lax.dot_general(
        xq, kernel_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (o.astype(jnp.float32) * sa * scale).astype(out_dtype)


class QuantDense(nn.Module):
    """``nn.Dense(features)`` with pre-quantized int8 weights.  Owns
    ``kernel_q`` (int8, (D, F)) and ``scale`` (fp32, (F,)); with
    ``use_bias`` additionally ``bias`` (fp32, (F,)) added after dequant.

    Initialized params are placeholders (zeros/ones) — real values come
    from ``quantize_trunk_params``/``quantize_named_denses`` over a trained
    fp32 tree.  Module names mirror the fp32 model so the two param trees
    align path-for-path.
    """

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        kernel_q = self.param(
            "kernel_q",
            lambda key, shape: jnp.zeros(shape, jnp.int8),
            (d, self.features),
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        out = int8_dot(x, kernel_q, scale, out_dtype=self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            out = out + bias.astype(self.dtype)
        return out


# The exact Dense leaves ESM3Config(quant="int8") swaps to QuantDense:
# the attention qkv/out and SwiGLU up/down projections (geometric attention,
# embeddings and output heads stay bf16 — heads run once per step and
# geom-attn is statically skipped on the sampling path).
_QUANT_SITES = {"attn": ("qkv", "out"), "ffn": ("up", "down")}

# Pre-projection LayerNorm gamma is folded into these kernels before
# quantization: LN_noscale(x) @ (diag(gamma) @ W) == LN(x) @ W — an exact
# reassociation, done offline, so the int8 step never touches the per-layer
# f32[d] gamma vectors (the round-3 profile measured their scan slice
# copies at ~6 ms/step).  The QK layernorms canNOT be folded — rotary mixes
# channel pairs between gamma and the attention dot.
_FOLD_LN = {"attn": "qkv", "ffn": "up"}


def quantize_trunk_params(tree):
    """Convert a trained fp32 trunk param tree to the layout the
    ``quant="int8"`` trunk expects: every attention/FFN projection kernel
    becomes ``{kernel_q, scale}``; the pre-projection LN gamma is folded
    into the qkv/up kernels and dropped from the tree (the int8 modules
    run those LayerNorms with ``use_scale=False``); everything else is
    untouched.  Works on both per-layer blocks (``block0``) and the
    scan-stacked ``blocks`` subtree (rank-3 kernels quantize per layer per
    output channel; gamma is then (n_layers, d)).
    """
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        if k in _QUANT_SITES and isinstance(v, dict):
            sub = dict(v)
            gamma = None
            ln = sub.get("ln")
            if isinstance(ln, dict) and set(ln.keys()) == {"scale"}:
                gamma = jnp.asarray(ln["scale"], jnp.float32)
            folded = False
            for name in _QUANT_SITES[k]:
                if name in sub and set(sub[name].keys()) == {"kernel"}:
                    w = sub[name]["kernel"]
                    if name == _FOLD_LN[k] and gamma is not None:
                        w = jnp.asarray(w, jnp.float32) * gamma[..., :, None]
                        folded = True
                    q, s = quantize_weight(w)
                    sub[name] = {"kernel_q": q, "scale": s}
            if folded:
                del sub["ln"]
            out[k] = {kk: quantize_trunk_params(vv) for kk, vv in sub.items()}
        else:
            out[k] = quantize_trunk_params(v)
    return out


def quantize_named_denses(tree, names):
    """Generic converter for the AR nets (CLM/JLM): any subtree whose key is
    in ``names`` and whose params are a Dense leaf ``{kernel[, bias]}``
    becomes the QuantDense layout ``{kernel_q, scale[, bias]}`` (bias kept
    fp32).  Everything else is untouched."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        if (k in names and isinstance(v, dict)
                and set(v.keys()) <= {"kernel", "bias"} and "kernel" in v):
            q, s = quantize_weight(v["kernel"])
            leaf = {"kernel_q": q, "scale": s}
            if "bias" in v:
                leaf["bias"] = v["bias"]
            out[k] = leaf
        else:
            out[k] = quantize_named_denses(v, names)
    return out
