"""Sequence-packed attention experiment (round 3).

The int8 op-level profile (PERF.md) shows the L=64 attention core runs
1536 MXU-underfed 64x64 matmuls per step (~17 ms/step incl. layout ops,
<1% MXU efficiency).  Packing k same-length rows into one device row of
length k*L with a block-diagonal segment mask turns those into
MXU-shaped (k*L)^2 matmuls — per-token math (LN/FFN/rotary/heads) is
shape-invariant, rotary positions restart per segment, and the masked
key sets are identical, so the forward is EXACT up to fp reduction
order.

Run on the chip:  python scripts/pack_experiment.py [B] [L] [quant]
Measures the 25-step argmax scan at pack factors k = 1,2,4,8,16.
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
L = int(sys.argv[2]) if len(sys.argv) > 2 else 64
QUANT = sys.argv[3] if len(sys.argv) > 3 else "int8"
STEPS = 25


def main():
    import dataclasses

    from esmdiff_tpu.models.esm3 import ESM3, ESM3Config

    cfg = ESM3Config(head_type="structure", param_dtype="bfloat16",
                     remat=False)
    net = ESM3(cfg)
    seq0 = jnp.zeros((1, 16), jnp.int32)
    coords0 = jnp.zeros((1, 16, 3, 3), jnp.float32)
    params = jax.jit(lambda k: net.init(
        k, sequence_tokens=seq0, structure_coords=coords0))(
        jax.random.PRNGKey(0))["params"]
    if QUANT == "int8":
        from esmdiff_tpu.ops.quant import quantize_trunk_params

        net = ESM3(dataclasses.replace(cfg, quant="int8"))
        params = jax.jit(quantize_trunk_params)(params)

    rng = np.random.RandomState(0)
    seq = jnp.asarray(rng.randint(4, 24, (B, L)), jnp.int32)
    toks0 = jnp.asarray(rng.randint(0, 4096, (B, L)), jnp.int32)
    ell = L - 2  # valid prefix length per row (bucketed padding)

    results = {}
    for k in (1, 2, 4, 8, 16):
        if B % k or k * L > 2048:
            continue
        Bp, Lp = B // k, k * L
        if k == 1:
            lengths = jnp.full((B,), ell, jnp.int32)
            seg_ids = None
            positions = None
        else:
            lengths = None
            row = np.full((k, L), -1, np.int64)
            for s in range(k):
                row[s, :ell] = s
            seg_ids = jnp.asarray(
                np.tile(row.reshape(1, Lp), (Bp, 1)), jnp.int32)
            positions = jnp.asarray(np.tile(np.arange(L), k), jnp.int32)

        @jax.jit
        def run(params, toks0, seq):
            def step(toks, _):
                out = net.apply(
                    {"params": params}, structure_tokens=toks,
                    sequence_tokens=seq, lengths=lengths,
                    sequence_id=seg_ids, positions=positions)
                nxt = jnp.argmax(out.structure_logits, -1).astype(jnp.int32)
                return nxt, None
            toks, _ = jax.lax.scan(step, toks0, None, length=STEPS)
            return toks

        t = toks0.reshape(Bp, Lp)
        s = seq.reshape(Bp, Lp)
        t0 = time.time()
        np.asarray(run(params, t, s))
        print(f"k={k:2d} (B'={Bp}, L'={Lp}) compile/settle "
              f"{time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        np.asarray(run(params, t + 1, s))
        wall = time.time() - t0
        results[k] = wall / STEPS * 1e3
        print(f"k={k:2d}  {results[k]:7.2f} ms/step   "
              f"({B / (STEPS * wall / STEPS):.1f} tok-rows/s)", flush=True)

    base = results.get(1)
    print("\npack  ms/step   speedup")
    for k, ms in results.items():
        print(f"{k:4d}  {ms:7.2f}   {base / ms:5.2f}x" if base else f"{k} {ms}")


if __name__ == "__main__":
    main()
