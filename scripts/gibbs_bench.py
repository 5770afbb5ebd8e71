"""Gibbs (confidence-ranked iterative unmasking) throughput on the real TPU.

Usage:  python scripts/gibbs_bench.py [B] [L] [steps]
Full 1.4B trunk, canonical gibbs config (temperature 1.4, top_p 0.9,
16 steps — reference sample_esmdiff.py:72-74), random weights/tokens.
Times one jitted unmasking scan via a small host transfer (PERF.md
gotcha #7: block_until_ready alone can lie on this runtime).
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
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 16

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.diffusion.gibbs import iterative_unmask_sample
from esmdiff_tpu.models.esm3 import ESM3, ESM3Config

cfg = ESM3Config(head_type="structure", param_dtype="bfloat16", remat=False)
net = ESM3(cfg)
params = jax.jit(lambda k: net.init(
    k, sequence_tokens=jnp.zeros((1, 16), jnp.int32),
    structure_coords=jnp.zeros((1, 16, 3, 3), jnp.float32)))(
    jax.random.PRNGKey(0))["params"]

rng = np.random.RandomState(0)
seq = jnp.asarray(rng.randint(4, 24, (B, L)), jnp.int32)
lengths = jnp.full((B,), L - 2, jnp.int32)


@jax.jit
def run(params, key):
    from esmdiff_tpu.diffusion.mdlm import shield_special_tokens

    def fwd(tokens):
        out = net.apply({"params": params}, structure_tokens=tokens,
                        sequence_tokens=seq, lengths=lengths)
        return shield_special_tokens(out.structure_logits.astype(jnp.float32))

    init = jnp.full((B, L), C.STRUCTURE_MASK_TOKEN, jnp.int32)
    dmask = jnp.ones((B, L), bool).at[:, 0].set(False).at[:, -1].set(False)
    return iterative_unmask_sample(fwd, key, init, dmask, num_steps=STEPS,
                                   temperature=1.4, top_p=0.9)


key = jax.random.PRNGKey(0)
t0 = time.time()
_ = np.asarray(run(params, key))
first = time.time() - t0
times = []
for i in range(3):
    t0 = time.time()
    toks = np.asarray(run(params, jax.random.fold_in(key, i)))
    times.append(time.time() - t0)
best = min(times)
assert (toks[:, 1:-1] < 4096).all()
print(f"gibbs B={B} L={L} {STEPS} steps: {best*1e3:9.1f} ms = "
      f"{best/STEPS*1e3:7.1f} ms/step, {B/best:6.1f} conf/s/chip "
      f"(compile {first:.0f}s)", flush=True)
