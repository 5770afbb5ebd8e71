"""Fused pre-norm SwiGLU FFN Pallas kernel.

Computes  Y = (silu(a) * b) @ W2,  [a | b] = LN(x; scale) @ W1
in ONE kernel: the layernormed activations, both up-projections, the SwiGLU
gate, and the down-projection accumulate entirely in VMEM — the (M, 2H)
up-projection and (M, H) gated hidden (the FFN's dominant HBM traffic,
~200 MB/layer/step at B=128 L=64) never touch HBM.

Grid = (M tiles, H tiles); the H axis iterates fastest and accumulates the
down-projection into an fp32 VMEM scratch; LN(x) is computed once per M tile
on the first H step and cached in VMEM.

The FFN is ~2/3 of the trunk's FLOPs (2 x M x D x 2H up + 2 x M x H x D
down per layer), so this is the hot op of the whole framework.

Status: measured 91 TF/s standalone on v5e at trunk shapes (M=8192, D=1536,
H=4096, bf16) — correct, but NOT yet faster than XLA's in-context FFN
scheduling (~115 TF/s effective inside the 48-layer scan), so the trunk does
not use it by default.  Kept as the tuning base for block-size /
double-buffering work; isolated-op comparisons on this runtime are misleading
(see bench.py notes), always measure inside the full sampler scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scale_ref, x_ref, wa_ref, wb_ref, w2_ref, o_ref,
            xn_ref, acc_ref):
    h = pl.program_id(1)
    n_h = pl.num_programs(1)

    @pl.when(h == 0)
    def _():
        x = x_ref[...].astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) * (x - mean), axis=-1, keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        xn = xn * scale_ref[0].astype(jnp.float32)
        xn_ref[...] = xn.astype(xn_ref.dtype)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xn = xn_ref[...]
    a = jax.lax.dot_general(
        xn, wa_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    b = jax.lax.dot_general(
        xn, wb_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    hid = (jax.nn.silu(a) * b).astype(xn.dtype)
    acc_ref[...] += jax.lax.dot_general(
        hid, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(h == n_h - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_m", "block_h", "interpret"))
def fused_swiglu_ffn(x, ln_scale, w_up, w_down, block_m: int = 256,
                     block_h: int = 512, interpret: bool | None = None):
    """x: (M, D); ln_scale: (D,); w_up: (D, 2H) as [a | b]; w_down: (H, D).

    Returns (M, D) in x.dtype.  M must not be huge-prime-odd: it is padded to
    a block_m multiple; D and H must divide by the hardware-friendly 128.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, D = x.shape
    H2 = w_up.shape[1]
    H = H2 // 2
    block_m = min(block_m, M)
    block_h = min(block_h, H)
    if M % block_m != 0:
        pad = block_m - M % block_m
        out = fused_swiglu_ffn(
            jnp.pad(x, ((0, pad), (0, 0))), ln_scale, w_up, w_down,
            block_m=block_m, block_h=block_h, interpret=interpret)
        return out[:M]
    assert H % block_h == 0, (H, block_h)

    grid = (M // block_m, H // block_h)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, D), lambda i, h: (0, 0)),            # ln scale
            pl.BlockSpec((block_m, D), lambda i, h: (i, 0)),      # x
            pl.BlockSpec((D, block_h), lambda i, h: (0, h)),      # W1[:, :H]
            pl.BlockSpec((D, block_h),
                         lambda i, h, _nh=H // block_h: (0, h + _nh)),  # W1[:, H:]
            pl.BlockSpec((block_h, D), lambda i, h: (h, 0)),      # W2
        ],
        out_specs=pl.BlockSpec((block_m, D), lambda i, h: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, D), x.dtype),       # cached LN(x)
            pltpu.VMEM((block_m, D), jnp.float32),   # down-proj accumulator
        ],
        interpret=interpret,
    )(ln_scale[None, :], x, w_up, w_up, w_down)
    return out
