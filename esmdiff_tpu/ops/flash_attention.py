"""Pallas TPU attention kernel.

Design (sized for the protein workload: L <= ~1k residues, head_dim 64):
  - grid = (batch, heads, Q blocks); each program holds its Q tile plus the
    FULL K/V for one (batch, head) in VMEM (L=1024, Dh=64, bf16 -> 256 KB,
    well under the ~16 MB VMEM budget), so no K-streaming inner loop or
    online-softmax state is needed — one MXU matmul produces the (BQ, L)
    logit tile, softmax runs in fp32 on the VPU, and a second matmul forms
    the output tile;
  - padded batches are handled via a per-row valid-length vector delivered
    through scalar prefetch (padding in this framework is always a contiguous
    suffix — see api/generation.bucket_length), masked to -inf before the
    softmax;
  - fp32 softmax accumulation regardless of io dtype.

For sequences far beyond VMEM capacity a K-streaming flash variant would be
needed; protein chains are bounded (<=1k residues, SURVEY.md §5 long-context
notes) so this shape is the fast path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tuning knob (scripts/attn_sweep.py, in-scan on v5e): block_q=512 measured
# best at L=512 (209 vs 216 ms/step @256, 230 @128) and L=1024 (107.5 vs
# 108.4 @256); capped to L at dispatch
DEFAULT_BLOCK_Q = int(os.environ.get("ESMDIFF_FLASH_BLOCK_Q", "512"))


def _attn_kernel(lengths_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 block_q: int):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    # keep q/k in their native (bf16) dtype with fp32 accumulation via
    # preferred_element_type (upcasting the inputs to fp32 buys no accuracy
    # the XLA path has, and measured step-time neutral at L=1024 — the
    # kernel is softmax/VPU-bound, not MXU-bound, at protein lengths)
    q = q_ref[0, 0]                               # (BQ, Dh)
    k = k_ref[0, 0]                               # (L, Dh)
    v = v_ref[0, 0]                               # (L, Dh)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                     # (BQ, L) fp32
    L = logits.shape[1]
    valid = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) \
        < lengths_ref[b]
    logits = jnp.where(valid, logits, -1e9)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    # fold the 1/denom normalization into the (BQ, Dh) output instead of a
    # (BQ, L) division pass — the kernel is VPU-bound at protein lengths
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o * (1.0 / denom)).astype(o_ref.dtype)


def _xla_attention_with_lengths(q, k, v, lengths):
    """Reference attention with prefix-length masking (used by the custom
    VJP backward — gradients recompute through the XLA formulation)."""
    from esmdiff_tpu.nn.attention import _xla_attention

    L = q.shape[1]
    key_ok = jnp.arange(L)[None, :] < lengths[:, None]
    mask = key_ok[:, None, None, :]
    return _xla_attention(q, k, v, mask=mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention_core(q, k, v, lengths, block_q, interpret):
    return _flash_attention_impl(q, k, v, lengths, block_q, interpret)


def _flash_core_fwd(q, k, v, lengths, block_q, interpret):
    out = _flash_attention_impl(q, k, v, lengths, block_q, interpret)
    return out, (q, k, v, lengths)


def _flash_core_bwd(block_q, interpret, res, g):
    q, k, v, lengths = res
    _, vjp = jax.vjp(_xla_attention_with_lengths, q, k, v, lengths)
    dq, dk, dv, _ = vjp(g)
    return dq, dk, dv, None


_flash_attention_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention(q, k, v, lengths=None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    interpret: bool | None = None):
    """q,k,v: (B, L, H, Dh) -> (B, L, H, Dh).

    lengths: optional (B,) int32 valid prefix lengths (padding suffix is
    masked out).  This is the ONLY masking form the kernel supports —
    arbitrary masks (packed multi-chain blocks, ...) must go through the XLA
    path; ``nn.attention.dot_product_attention`` enforces that at dispatch.
    """
    if interpret is None:
        # Mosaic kernels only compile for TPU; interpret elsewhere (tests,
        # CPU dev) so call sites stay backend-agnostic.
        interpret = jax.default_backend() != "tpu"
    B, L, H, Dh = q.shape
    if lengths is None:
        lengths = jnp.full((B,), L, jnp.int32)
    return _flash_attention_core(q, k, v, lengths, min(block_q, L),
                                 interpret)


def _flash_attention_impl(q, k, v, lengths, block_q, interpret):
    B, L, H, Dh = q.shape
    if L % block_q != 0:
        pad = block_q - L % block_q
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        out = _flash_attention_impl(qp, k, v, lengths, block_q, interpret)
        return out[:, :L]

    # (B, H, L, Dh) layout for clean tiling
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    Lq = qt.shape[2]
    scale = 1.0 / (Dh ** 0.5)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, Lq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, Dh),
                         lambda b, h, qi, lens: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, kt.shape[2], Dh),
                         lambda b, h, qi, lens: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, vt.shape[2], Dh),
                         lambda b, h, qi, lens: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, Dh),
                               lambda b, h, qi, lens: (b, h, qi, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, block_q=block_q),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        # all grid dims are independent -> let Mosaic pipeline DMA across
        # programs instead of treating the grid as sequential
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(lengths, qt, kt, vt)
    return jnp.transpose(out, (0, 2, 1, 3))
