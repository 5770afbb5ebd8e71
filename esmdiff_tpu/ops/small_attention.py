"""Pallas TPU fused attention for SHORT sequences (the protein hot path).

At L=64 (the BPTI/benchmark regime) XLA's attention is ~1000x off the MXU
roofline: the per-(batch, head) einsums are tiny, and the f32 score tensor
(B, H, L, L), the softmax passes, and the rotary slice/negate fusions all
round-trip HBM.  The round-3 profile (scripts/profile_step.py) measured
~19 ms/step of the 48-layer trunk in these ops at B=64/L=64.

This kernel fuses, per batch row, entirely in VMEM:
  rotary(q), rotary(k)  ->  per-head scores  ->  masked fp32 softmax  ->  P*V

MEASURED RESULT (round 3, in-scan on v5e — PERF.md): the kernel LOSES to
XLA at every protein length (L=64: 95.9 vs 93.9 ms/step once the
(B,L,H,Dh)->(B,H,L,Dh) transposes were eliminated — the first version with
XLA-side transposes lost by 10 ms; L=128: 210.9 vs 167.9).  Together with
the round-2 fused-LN+QKV result this is the third data point that XLA's
fused attention + cross-op overlap is the practical frontier for this
model at L<=512, so the kernel is OPT-IN (``attn_backend="small"``) and
never auto-selected; it stays as the tuning base for future hardware.

Layout: one grid program per batch row in the model's native (L, H, Dh)
tile layout; the heads are batched dot_generals after an in-VMEM swap
(Mosaic requires batch dims at position 0).  VMEM footprint per program:
3 x (L, H, Dh) bf16 in + out + an (H, L, L) f32 score scratch = ~1 MB at
L=64.

Rotary is the GPT-NeoX half-rotation (nn/rotary.py): applying it inside the
kernel removes the slice/negate/concat HBM passes XLA emits for
``rotate_half``.  Masking: contiguous-prefix ``lengths`` only (same contract
as ops/flash_attention.py).  Backward = recompute through the XLA
formulation (custom_vjp), like the flash kernel.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# auto-dispatch ceiling: measured on v5e (PERF.md round 3) — the fused
# kernel wins at short L where XLA's attention is overhead-bound; flash
# takes over at >=1024 and XLA holds the middle.
SMALL_ATTN_MAX_LEN = int(os.environ.get("ESMDIFF_SMALL_ATTN_MAX_LEN", "128"))


# single source of truth for the half-rotation: the kernel forward and its
# XLA-reference backward must always share the rotary convention
from esmdiff_tpu.nn.rotary import _rotate_half as _rot_half  # noqa: E402


def _kernel(lengths_ref, q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *,
            scale: float, n_heads: int):
    # tiles keep the model's native (L, H, Dh) layout — no XLA-side
    # (B,L,H,Dh)->(B,H,L,Dh) transpose copies (measured +10 ms/step when the
    # first kernel version forced them)
    b = pl.program_id(0)
    cos = cos_ref[...]                      # (L, Dh) f32
    sin = sin_ref[...]
    L = cos.shape[0]
    q = q_ref[0].astype(jnp.float32)        # (L, H, Dh)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    qr = (q * cos[:, None, :] + _rot_half(q) * sin[:, None, :]).astype(v.dtype)
    kr = (k * cos[:, None, :] + _rot_half(k) * sin[:, None, :]).astype(v.dtype)
    # batched over the head dim in ONE dot_general each; Mosaic requires
    # batch dims at position 0, so swap (L, H, ...) -> (H, L, ...) in VMEM
    logits = jax.lax.dot_general(
        jnp.swapaxes(qr, 0, 1), jnp.swapaxes(kr, 0, 1),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                # (H, L, L) f32
    valid = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2) \
        < lengths_ref[b]
    logits = jnp.where(valid, logits, -1e9)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), jnp.swapaxes(v, 0, 1),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                        # (H, L, Dh)
    o_ref[0] = jnp.swapaxes(o * (1.0 / denom), 0, 1).astype(o_ref.dtype)


def _xla_reference(q, k, v, cos, sin, lengths):
    """Rotary + attention through the stock XLA formulation (backward pass
    and CPU/interpret parity)."""
    from esmdiff_tpu.nn.attention import dot_product_attention
    from esmdiff_tpu.nn.rotary import apply_rotary

    qr = apply_rotary(q, cos, sin)
    kr = apply_rotary(k, cos, sin)
    return dot_product_attention(qr, kr, v, lengths=lengths, backend="xla")


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _small_attention_core(q, k, v, cos, sin, lengths, interpret):
    return _small_attention_impl(q, k, v, cos, sin, lengths, interpret)


def _small_fwd(q, k, v, cos, sin, lengths, interpret):
    out = _small_attention_impl(q, k, v, cos, sin, lengths, interpret)
    return out, (q, k, v, cos, sin, lengths)


def _small_bwd(interpret, res, g):
    q, k, v, cos, sin, lengths = res
    _, vjp = jax.vjp(_xla_reference, q, k, v, cos, sin, lengths)
    dq, dk, dv, dcos, dsin, _ = vjp(g)
    return dq, dk, dv, dcos, dsin, None


_small_attention_core.defvjp(_small_fwd, _small_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def small_attention(q, k, v, cos, sin, lengths=None,
                    interpret: bool | None = None):
    """q,k,v: (B, L, H, Dh) PRE-rotary; cos/sin: (L, Dh) -> (B, L, H, Dh).

    Applies rotary to q/k and computes masked attention in one fused pass.
    ``lengths``: optional (B,) int32 valid-prefix lengths.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, L, H, Dh = q.shape
    if lengths is None:
        lengths = jnp.full((B,), L, jnp.int32)
    return _small_attention_core(q, k, v, cos.astype(jnp.float32),
                                 sin.astype(jnp.float32),
                                 lengths.astype(jnp.int32), interpret)


def _small_attention_impl(q, k, v, cos, sin, lengths, interpret):
    B, L, H, Dh = q.shape
    scale = 1.0 / (Dh ** 0.5)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, H, Dh), lambda b, lens: (b, 0, 0, 0)),
            pl.BlockSpec((1, L, H, Dh), lambda b, lens: (b, 0, 0, 0)),
            pl.BlockSpec((1, L, H, Dh), lambda b, lens: (b, 0, 0, 0)),
            pl.BlockSpec((L, Dh), lambda b, lens: (0, 0)),
            pl.BlockSpec((L, Dh), lambda b, lens: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, H, Dh), lambda b, lens: (b, 0, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_heads=H),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(lengths, q, k, v, cos, sin)
