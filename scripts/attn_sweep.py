"""In-scan flash-vs-XLA attention timing at given (B, L) on the real TPU.

Usage:  python scripts/attn_sweep.py B L [backend ...]
Times the full-size trunk inside a 25-step sampling-style scan per backend
(default: xla flash).  Same protocol as scripts/ablate_step.py (random
weights + random tokens; see PERF.md measurement gotchas).
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
L = int(sys.argv[2]) if len(sys.argv) > 2 else 512
BACKENDS = sys.argv[3:] or ["xla", "flash"]
STEPS = 25

from esmdiff_tpu.models.esm3 import ESM3, ESM3Config


def run_backend(backend: str):
    cfg = ESM3Config(head_type="structure", param_dtype="bfloat16",
                     remat=False, attn_backend=backend)
    net = ESM3(cfg)
    params = jax.jit(lambda k: net.init(
        k, sequence_tokens=jnp.zeros((1, 16), jnp.int32),
        structure_coords=jnp.zeros((1, 16, 3, 3), jnp.float32)))(
        jax.random.PRNGKey(0))["params"]

    rng = np.random.RandomState(0)
    seq = jnp.asarray(rng.randint(4, 24, (B, L)), jnp.int32)
    lengths = jnp.full((B,), L - 2, jnp.int32)

    @jax.jit
    def run(params, toks0):
        def step(toks, _):
            out = net.apply({"params": params}, structure_tokens=toks,
                            sequence_tokens=seq, lengths=lengths)
            return jnp.argmax(out.structure_logits, -1).astype(jnp.int32), None
        toks, _ = jax.lax.scan(step, toks0, None, length=STEPS)
        return toks

    toks0 = jnp.asarray(rng.randint(0, 4096, (B, L)), jnp.int32)
    t0 = time.time()
    jax.block_until_ready(run(params, toks0))
    first = time.time() - t0
    times = []
    for i in range(3):
        t0 = time.time()
        jax.block_until_ready(run(params, toks0 + i + 1))
        times.append(time.time() - t0)
    ms = min(times) / STEPS * 1e3
    print(f"B={B} L={L} attn={backend:<6} {ms:9.2f} ms/step "
          f"(compile {first:.0f}s)", flush=True)
    return ms


for be in BACKENDS:
    run_backend(be)
