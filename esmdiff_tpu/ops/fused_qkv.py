"""Fused LN -> QKV projection -> QK-layernorm Pallas kernel.

The attention-path projections are the trunk's low-utilization half
(PERF.md ablations: FFN GEMMs run at ~95% of bf16 peak inside the scan, the
qkv/out projections + their LayerNorm chain at ~40%).  XLA executes the
pre-LN, the (T, D)x(D, 3D) projection, and the two post-split QK layernorms
as separate HBM-round-trip stages with fp32 intermediates; this kernel does
all four in one VMEM pass per tile:

  grid = (3, T/bm)  — j in {q, k, v} outer so each (D, D) weight block stays
  resident in VMEM across all token tiles (Pallas skips the DMA when the
  block index does not change between consecutive programs);
  per program: x tile (bm, D) -> fp32 LN -> bf16 MXU matmul with W_j
  (fp32 accumulate) -> fp32 QK-layernorm (q/k only, branchless select)
  -> bf16 out tile.

Numerics mirror nn/layers.py exactly (fp32 LN statistics, eps 1e-5,
reciprocal-sqrt).  Backward runs through the XLA composition via custom_vjp
(same pattern as ops/flash_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_M = 256
_EPS = 1e-5


def _ln_f32(x, scale):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jnp.reciprocal(jnp.sqrt(var + _EPS)) * scale


def _kernel(x_ref, ln_ref, w_ref, post_ref, o_ref):
    j = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)                       # (bm, D)
    xn = _ln_f32(x, ln_ref[0].astype(jnp.float32))
    y = jax.lax.dot_general(
        xn.astype(w_ref.dtype), w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (bm, D) fp32
    post = post_ref[pl.ds(j, 1), :].astype(jnp.float32)    # (1, D): q/k/v row
    y_ln = _ln_f32(y, post[0])
    out = jnp.where(j < 2, y_ln, y)                        # q/k get QK-LN
    o_ref[:] = out.astype(o_ref.dtype)


def _reference_ln_qkv(x, ln_scale, w_qkv, q_ln_scale, k_ln_scale):
    """XLA composition (identical math; used for the backward pass and as
    the numerical oracle in tests)."""
    xn = _ln_f32(x.astype(jnp.float32), ln_scale).astype(x.dtype)
    y = (xn @ w_qkv.astype(x.dtype)).astype(jnp.float32)
    D = x.shape[-1]
    q, k, v = y[..., :D], y[..., D:2 * D], y[..., 2 * D:]
    q = _ln_f32(q, q_ln_scale)
    k = _ln_f32(k, k_ln_scale)
    return jnp.concatenate([q, k, v], axis=-1).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_core(x, ln_scale, w_qkv, q_ln_scale, k_ln_scale, block_m,
                interpret):
    return _fused_impl(x, ln_scale, w_qkv, q_ln_scale, k_ln_scale, block_m,
                       interpret)


def _fused_fwd(x, ln_scale, w_qkv, q_ln_scale, k_ln_scale, block_m,
               interpret):
    out = _fused_impl(x, ln_scale, w_qkv, q_ln_scale, k_ln_scale, block_m,
                      interpret)
    return out, (x, ln_scale, w_qkv, q_ln_scale, k_ln_scale)


def _fused_bwd(block_m, interpret, res, g):
    x, ln_scale, w_qkv, q_ln_scale, k_ln_scale = res
    _, vjp = jax.vjp(_reference_ln_qkv, x, ln_scale, w_qkv, q_ln_scale,
                     k_ln_scale)
    return vjp(g)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def _fused_impl(x, ln_scale, w_qkv, q_ln_scale, k_ln_scale, block_m,
                interpret):
    B, L, D = x.shape
    T = B * L
    x2 = x.reshape(T, D)
    bm = min(block_m, T)
    pad = (-T) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    Tp = x2.shape[0]
    post = jnp.stack([
        q_ln_scale.astype(jnp.float32),
        k_ln_scale.astype(jnp.float32),
        jnp.ones_like(q_ln_scale, dtype=jnp.float32),
    ])                                                     # (3, D)
    grid_spec = pl.GridSpec(
        grid=(3, Tp // bm),
        in_specs=[
            pl.BlockSpec((bm, D), lambda j, i: (i, 0)),
            pl.BlockSpec((1, D), lambda j, i: (0, 0)),
            pl.BlockSpec((D, D), lambda j, i: (0, j)),
            # full (3, D) table resident; row selected by program_id in-kernel
            # (a (1, D) block of a (3, D) array violates the sublane rule)
            pl.BlockSpec((3, D), lambda j, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, D), lambda j, i: (i, j)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, 3 * D), x.dtype),
        interpret=interpret,
    )(x2, ln_scale.reshape(1, D), w_qkv, post)
    if pad:
        out = out[:T]
    return out.reshape(B, L, 3 * D)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def fused_ln_qkv(x, ln_scale, w_qkv, q_ln_scale, k_ln_scale,
                 block_m: int = DEFAULT_BLOCK_M,
                 interpret: bool | None = None):
    """x: (B, L, D); w_qkv: (D, 3D) flax kernel layout.
    Returns (B, L, 3D) = concat(QK-LN(LN(x)Wq), QK-LN(LN(x)Wk), LN(x)Wv).
    Differentiable (backward recomputes through the XLA composition)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_core(x, ln_scale, w_qkv, q_ln_scale, k_ln_scale,
                       block_m, interpret)
