"""In-scan comparison of qkv_backend and attn_backend choices on the real
chip (PERF.md round-2 experiments).  Usage: python scripts/qkv_bench.py"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from esmdiff_tpu.utils.compilation_cache import enable

enable()

from esmdiff_tpu.models.esm3 import ESM3, ESM3Config

STEPS = 25


def build(cfg):
    net = ESM3(cfg)
    seq = jnp.zeros((1, 16), jnp.int32)
    coords = jnp.zeros((1, 16, 3, 3), jnp.float32)
    params = jax.jit(lambda k: net.init(
        k, sequence_tokens=seq, structure_coords=coords))(
        jax.random.PRNGKey(0))["params"]
    return net, params


def timed(cfg, B, L, tag):
    net, params = build(cfg)
    # random tokens: constant inputs short-circuit on this runtime
    # (fantasy ~5 ms/step vs the real ~95 — see PERF.md gotchas)
    import numpy as _np
    _rng = _np.random.RandomState(0)
    seq = jnp.asarray(_rng.randint(4, 24, (B, L)), jnp.int32)
    lengths = jnp.full((B,), L - 2, jnp.int32)

    @jax.jit
    def run(params, toks0):
        def step(toks, _):
            out = net.apply({"params": params}, structure_tokens=toks,
                            sequence_tokens=seq, lengths=lengths)
            return jnp.argmax(out.structure_logits, -1).astype(jnp.int32), None
        toks, _ = jax.lax.scan(step, toks0, None, length=STEPS)
        return toks

    toks0 = jnp.asarray(_rng.randint(0, 4096, (B, L)), jnp.int32)
    t0 = time.time()
    jax.block_until_ready(run(params, toks0))
    first = time.time() - t0
    times = []
    for i in range(3):
        t0 = time.time()
        jax.block_until_ready(run(params, toks0 + i + 1))
        times.append(time.time() - t0)
    ms = min(times) / STEPS * 1e3
    print(f"B={B:4d} L={L:5d} {tag:<28} {ms:9.2f} ms/step (compile {first:.0f}s)",
          flush=True)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--shapes", type=str, default="64x64,64x128",
                   help="Comma-separated BxL pairs.")
    p.add_argument("--qkv", type=str, default="xla,fused",
                   help="qkv_backend values to compare.")
    p.add_argument("--attn", type=str, default=None,
                   help="Optional attn_backend override (xla|flash).")
    args = p.parse_args(argv)

    for pair in args.shapes.split(","):
        B, L = (int(x) for x in pair.split("x"))
        for qkv in args.qkv.split(","):
            kw = dict(head_type="structure", param_dtype="bfloat16",
                      remat=False, qkv_backend=qkv)
            if args.attn:
                kw["attn_backend"] = args.attn
            timed(ESM3Config(**kw), B, L,
                  f"qkv={qkv}" + (f" attn={args.attn}" if args.attn else ""))


if __name__ == "__main__":
    main()
