"""AR (CLM/JLM) sampling throughput on the real TPU.

Usage:  python scripts/ar_bench.py [B] [L] [model ...]
where model is clm | jlm | clm_int8 | jlm_int8 (W8A8 projections,
ops/quant.py).  Builds the full-size reference geometries (CLM: 12-layer
T5 enc-dec d=1280, configs/clm.yaml; JLM: 48-layer GPT-2 d=1280,
configs/jlm.yaml), random params, random (B, L, 1536) trunk embeddings,
and times one scanned KV decode of L structure tokens.  Same protocol as
scripts/ablate_step.py.
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
L = int(sys.argv[2]) if len(sys.argv) > 2 else 64
MODELS = sys.argv[3:] or ["clm", "jlm"]
COND_DIM = 1536


def run(which: str):
    import dataclasses

    from esmdiff_tpu.api.ar_generation import clm_generate, jlm_generate
    from esmdiff_tpu.models.clm import (CLM, CLMConfig, quantize_clm_params)
    from esmdiff_tpu.models.jlm import (JLM, JLMConfig, quantize_jlm_params)

    base, _, variant = which.partition("_")
    rng = np.random.RandomState(0)
    emb = jnp.asarray(rng.randn(B, L, COND_DIM) * 0.1, jnp.float32)
    key = jax.random.PRNGKey(0)

    # reference experiment geometries (configs/experiment/{clm,jlm}.yaml:
    # CLM d=1280 ff=2048 12L; JLM d=1280 48L 16H)
    if base == "clm":
        model = CLM(CLMConfig(cond_dim=COND_DIM, d_model=1280, d_ff=2048,
                              n_layers=12, n_heads=16))
        params = jax.jit(lambda k: model.init(
            k, emb[:1, :8], jnp.zeros((1, 8), jnp.int32)))(key)["params"]
        if variant == "int8":
            model = CLM(dataclasses.replace(model.cfg, quant="int8"))
            params = jax.jit(quantize_clm_params)(params)
        gen = lambda e, k: clm_generate(model, params, e, L, 1.0, 0.95, key=k)
    else:
        model = JLM(JLMConfig(cond_dim=COND_DIM, n_embd=1280, n_layers=48,
                              n_heads=16))
        params = jax.jit(lambda k: model.init(
            k, emb[:1, :8], jnp.zeros((1, 8), jnp.int32)))(key)["params"]
        if variant == "int8":
            model = JLM(dataclasses.replace(model.cfg, quant="int8"))
            params = jax.jit(quantize_jlm_params)(params)
        gen = lambda e, k: jlm_generate(model, params, e, L, 1.0, 0.95, key=k)

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    # NB: block_until_ready alone reads ~0 ms on this tunneled runtime
    # (PERF.md gotchas) — force a small host transfer of the result instead.
    t0 = time.time()
    _ = np.asarray(gen(emb, key))
    first = time.time() - t0
    times = []
    for i in range(3):
        e = emb + 0.001 * (i + 1)  # vary inputs (memoization gotcha)
        t0 = time.time()
        _ = np.asarray(gen(e, jax.random.fold_in(key, i)))
        times.append(time.time() - t0)
    best = min(times)
    print(f"{which} ({n_params/1e6:.0f}M params) B={B} L={L}: "
          f"{best*1e3:9.1f} ms/decode = {B/best:8.1f} samples/s, "
          f"{B*L/best/1e3:7.1f}k tok/s (compile {first:.0f}s)", flush=True)


for m in MODELS:
    run(m)
