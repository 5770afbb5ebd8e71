"""Measure sequence packing through the production MDLM sampler.

python scripts/pack_bench.py [quant]  — runs (L, B, k) combos and prints
ms/step for the full 25-step ddpm_sample (sigma conditioning included).
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

QUANT = sys.argv[1] if len(sys.argv) > 1 else "int8"
STEPS = 25
COMBOS = [(64, 64, 1), (64, 64, 2), (64, 64, 4),
          (128, 64, 1), (128, 64, 2)]


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    import bench

    cfg, mdlm, params = bench.build_sampler(quant=QUANT)
    from esmdiff_tpu.core import constants as C

    rng = np.random.RandomState(0)
    for L, B, k in COMBOS:
        toks = np.concatenate([[0], rng.randint(4, 24, L - 2), [2]])
        row = np.full((L,), C.SEQUENCE_PAD_TOKEN, np.int32)
        row[:L] = toks
        seq = jnp.asarray(np.tile(row[None], (B, 1)))
        lengths = jnp.sum(seq != C.SEQUENCE_PAD_TOKEN, axis=-1,
                          dtype=jnp.int32)

        @jax.jit
        def sample(params, key, _k=k):
            return mdlm.ddpm_sample(params, key, seq, num_steps=STEPS,
                                    eps=1e-5, lengths=lengths, pack=_k)

        t0 = time.time()
        jax.block_until_ready(sample(params, jax.random.PRNGKey(0)))
        compile_s = time.time() - t0
        times = []
        for i in range(3):
            t0 = time.time()
            jax.block_until_ready(sample(params, jax.random.PRNGKey(i + 1)))
            times.append(time.time() - t0)
        best = min(times)
        print(f"L={L:4d} B={B:3d} k={k:2d}  {best / STEPS * 1e3:7.2f} ms/step"
              f"  ({B / best:6.1f} conf/s)  [compile {compile_s:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
