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
                 group: int):
    gi = pl.program_id(0)
    # per-row valid lengths for this program's G flattened (batch*head) rows
    row0 = gi * group
    # keep q/k in their native (bf16) dtype with fp32 accumulation via
    # preferred_element_type (upcasting the inputs to fp32 buys no accuracy
    # the XLA path has, and measured step-time neutral at L=1024 — the
    # kernel is softmax/VPU-bound, not MXU-bound, at protein lengths).
    # G rows are unrolled so Mosaic overlaps their MXU passes with the
    # softmax VPU work of neighbours — one program amortizes DMA/setup
    # over G (batch*head) slices, which is what makes the kernel
    # competitive at L=256-512 (one-slice programs lose to XLA there).
    for i in range(group):
        q = q_ref[i]                              # (BQ, Dh)
        k = k_ref[i]                              # (L, Dh)
        v = v_ref[i]                              # (L, Dh)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                 # (BQ, L) fp32
        valid = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) \
            < lengths_ref[row0 + i]
        logits = jnp.where(valid, logits, -1e9)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        # fold the 1/denom normalization into the (BQ, Dh) output instead
        # of a (BQ, L) division pass — the kernel is VPU-bound at protein
        # lengths
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[i] = (o * (1.0 / denom)).astype(o_ref.dtype)


def _xla_attention_with_lengths(q, k, v, lengths):
    """Reference attention with prefix-length masking (used by the custom
    VJP backward — gradients recompute through the XLA formulation)."""
    from esmdiff_tpu.nn.attention import _xla_attention

    L = q.shape[1]
    key_ok = jnp.arange(L)[None, :] < lengths[:, None]
    mask = key_ok[:, None, None, :]
    return _xla_attention(q, k, v, mask=mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_attention_core(q, k, v, lengths, block_q, group, interpret):
    return _flash_attention_impl(q, k, v, lengths, block_q, group, interpret)


def _flash_core_fwd(q, k, v, lengths, block_q, group, interpret):
    out = _flash_attention_impl(q, k, v, lengths, block_q, group, interpret)
    return out, (q, k, v, lengths)


def _flash_core_bwd(block_q, group, interpret, res, g):
    q, k, v, lengths = res
    _, vjp = jax.vjp(_xla_attention_with_lengths, q, k, v, lengths)
    dq, dk, dv, _ = vjp(g)
    return dq, dk, dv, None


_flash_attention_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "group", "interpret"))
def flash_attention(q, k, v, lengths=None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    group: int | None = None,
                    interpret: bool | None = None):
    """q,k,v: (B, L, H, Dh) -> (B, L, H, Dh).

    lengths: optional (B,) int32 valid prefix lengths (padding suffix is
    masked out).  This is the ONLY masking form the kernel supports —
    arbitrary masks (packed multi-chain blocks, ...) must go through the XLA
    path; ``nn.attention.dot_product_attention`` enforces that at dispatch.

    group: (batch*head) slices per program; None = ESMDIFF_FLASH_GROUP env
    override or the VMEM-budget auto rule (_pick_group).

    Layout note (round-5 negative result, PERF.md): blocking the model's
    (B, L, H, Dh) arrays directly — so the DMA engine would do the head
    gather instead of the XLA-side transposes — is NOT viable: Mosaic
    tiles the minor-most two dims (H, Dh), so a per-head slice crosses
    tiles ("unsupported shape cast" / block-shape divisibility errors),
    and doing a per-block in-kernel relayout instead measured SLOWER than
    the XLA transposes it saves (2.79 vs 1.87 ms/op at L=256 g=8).
    """
    if interpret is None:
        # Mosaic kernels only compile for TPU; interpret elsewhere (tests,
        # CPU dev) so call sites stay backend-agnostic.
        interpret = jax.default_backend() != "tpu"
    B, L, H, Dh = q.shape
    if lengths is None:
        lengths = jnp.full((B,), L, jnp.int32)
    bq = min(block_q, L)
    if group is None:
        group = _pick_group(bq, L, B * H)
    return _flash_attention_core(q, k, v, lengths, bq, group, interpret)


def _pick_group(block_q: int, L: int, bh: int) -> int:
    """(batch*head) slices per program.  An ~8 MB fp32 logit-tile budget
    (VMEM is ~16 MB scoped; the q/k/v input blocks + softmax temporaries
    ride on top, measured OOM at a 16 MB tile) capped at 24, preferring a
    divisor of bh so no pad rows are spent.  Measured winners on v5e
    (scripts/attn_kernel_bench.py, PERF.md round-5): L=256 -> 24
    (1.54 vs 1.96 ms XLA), L=512 -> 8 (0.98 vs 1.79), L=1024 -> 4
    (0.85 vs 1.71).  Override with ESMDIFF_FLASH_GROUP."""
    env = os.environ.get("ESMDIFF_FLASH_GROUP", "")
    if env:
        return max(1, int(env))
    cap = max(1, min(24, (8 << 20) // (block_q * L * 4)))
    for g in (24, 16, 12, 8, 6, 4, 3, 2):
        if g <= cap and bh % g == 0:
            return g
    # no divisor fits: largest power of two <= cap (pads rows)
    return 1 << (min(cap, 16).bit_length() - 1)


def _flash_attention_impl(q, k, v, lengths, block_q, group, interpret):
    B, L, H, Dh = q.shape
    if L % block_q != 0:
        pad = block_q - L % block_q
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        out = _flash_attention_impl(qp, k, v, lengths, block_q, group,
                                    interpret)
        return out[:, :L]

    # flatten (B, H) -> rows so one program can cover G slices: at protein
    # lengths (256-512) single-slice programs are dominated by DMA/setup
    # and lose to XLA; grouping amortizes that (PERF.md round-5 table)
    qt = jnp.transpose(q, (0, 2, 1, 3)).reshape(B * H, L, Dh)
    kt = jnp.transpose(k, (0, 2, 1, 3)).reshape(B * H, k.shape[1], Dh)
    vt = jnp.transpose(v, (0, 2, 1, 3)).reshape(B * H, v.shape[1], Dh)
    row_lengths = jnp.repeat(lengths, H)          # (B*H,)
    Lq = qt.shape[1]
    scale = 1.0 / (Dh ** 0.5)

    BH = B * H
    if BH % group != 0:
        padr = group - BH % group
        qt = jnp.pad(qt, ((0, padr), (0, 0), (0, 0)))
        kt = jnp.pad(kt, ((0, padr), (0, 0), (0, 0)))
        vt = jnp.pad(vt, ((0, padr), (0, 0), (0, 0)))
        # all-masked pad rows are harmless: max=-1e9 -> uniform softmax
        # over zero V rows -> finite zeros, then discarded below
        row_lengths = jnp.pad(row_lengths, (0, padr))
        BH += padr

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH // group, Lq // block_q),
        in_specs=[
            pl.BlockSpec((group, block_q, Dh),
                         lambda g, qi, lens: (g, qi, 0)),
            pl.BlockSpec((group, kt.shape[1], Dh),
                         lambda g, qi, lens: (g, 0, 0)),
            pl.BlockSpec((group, vt.shape[1], Dh),
                         lambda g, qi, lens: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, block_q, Dh),
                               lambda g, qi, lens: (g, qi, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        # all grid dims are independent -> let Mosaic pipeline DMA across
        # programs instead of treating the grid as sequential
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(row_lengths, qt, kt, vt)
    out = out[:B * H].reshape(B, H, L, Dh)
    return jnp.transpose(out, (0, 2, 1, 3))


