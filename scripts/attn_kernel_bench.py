"""Microbench: pure attention op (XLA vs Pallas flash variants) on chip.

Times ONLY the attention op inside a lax.scan (sampling-style reuse of the
same executable), at the bench-matrix shapes (B from plan_batches, H=24,
Dh=64, bf16) — so kernel variants can be compared in seconds instead of
full-trunk sweeps (90-230 s compile each).

Usage: python scripts/attn_kernel_bench.py [L ...] -- [variant ...]
  variants: xla, flash (auto group), flash:g<G>, flash:g<G>:bq<BQ>
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from esmdiff_tpu.utils.compilation_cache import enable

enable()

SHAPES = {64: 128, 128: 128, 256: 64, 512: 16, 1024: 4}  # L -> matrix B
H, DH = 24, 64
STEPS = 50

argv = sys.argv[1:]
if "--" in argv:
    i = argv.index("--")
    Ls = [int(x) for x in argv[:i]] or [256, 512]
    variants = argv[i + 1:] or ["xla", "flash"]
else:
    Ls = [int(x) for x in argv] or [256, 512]
    variants = ["xla", "flash"]


def time_variant(L, B, variant):
    from esmdiff_tpu.nn.attention import _xla_attention
    from esmdiff_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, L, H, DH), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, L, H, DH), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, L, H, DH), jnp.bfloat16)
    lengths = jnp.full((B,), L - 2, jnp.int32)

    kw = {}
    if variant == "xla":
        def op(q, k, v):
            key_ok = jnp.arange(L)[None, :] < lengths[:, None]
            return _xla_attention(q, k, v, mask=key_ok[:, None, None, :])
    else:
        parts = variant.split(":")
        for p in parts[1:]:
            if p.startswith("g"):
                kw["group"] = int(p[1:])
            elif p.startswith("bq"):
                kw["block_q"] = int(p[2:])

        def op(q, k, v):
            return flash_attention(q, k, v, lengths=lengths, **kw)

    @jax.jit
    def run(q, k, v):
        def step(c, _):
            o = op(c, k, v)
            return (o * jnp.bfloat16(0.1) + q).astype(jnp.bfloat16), None
        c, _ = jax.lax.scan(step, q, None, length=STEPS)
        return c

    t0 = time.time()
    jax.block_until_ready(run(q, k, v))
    first = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(run(q, k, v))
        times.append(time.time() - t0)
    ms = min(times) / STEPS * 1e3
    print(f"B={B} L={L} {variant:<16} {ms:8.3f} ms/op  (compile {first:.0f}s)",
          flush=True)


for L in Ls:
    for v in variants:
        time_variant(L, SHAPES[L], v)
