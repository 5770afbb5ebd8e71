"""Full-trunk fine-tune step timing on the real TPU.

Usage:  python scripts/train_bench.py [B] [L] [remat_policy ...]
Builds the full 1.4B MDLM fine-tune step (bf16 params, fp32 AdamW moments,
remat on) and times it per remat policy (default: nothing dots).  Same
measurement protocol as scripts/ablate_step.py (random weights/tokens).
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
L = int(sys.argv[2]) if len(sys.argv) > 2 else 512
POLICIES = sys.argv[3:] or ["nothing", "dots"]


def run(policy: str):
    from esmdiff_tpu.diffusion.mdlm import MDLM, MDLMConfig
    from esmdiff_tpu.diffusion.noise import LogLinearNoise
    from esmdiff_tpu.models.esm3 import ESM3, ESM3Config
    from esmdiff_tpu.nn.layers import TimestepEmbedder
    from esmdiff_tpu.train.state import make_optimizer, make_train_step

    cfg = ESM3Config(head_type="structure", remat=True, remat_policy=policy,
                     param_dtype="bfloat16")
    net = ESM3(cfg)
    se = TimestepEmbedder(hidden_size=cfg.d_model)
    mdlm = MDLM(net, se, noise=LogLinearNoise(), cfg=MDLMConfig())
    params = mdlm.init(jax.random.PRNGKey(0), batch_size=1, length=16)

    from esmdiff_tpu.train.state import create_train_state

    opt = make_optimizer(lr=1e-5)
    loss_fn = lambda p, batch, key: mdlm.loss(p, batch, key)
    step_fn = make_train_step(loss_fn, opt)
    state = create_train_state(params, opt)

    rng = np.random.RandomState(0)
    batch = {
        "structure_tokens": jnp.asarray(
            rng.randint(0, 4096, (B, L)), jnp.int32),
        "sequence_tokens": jnp.asarray(rng.randint(4, 24, (B, L)), jnp.int32),
        "mask": jnp.ones((B, L), jnp.float32),
    }
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    state, metrics = step_fn(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    first = time.time() - t0
    times = []
    for i in range(4):
        b = dict(batch)
        b["structure_tokens"] = (batch["structure_tokens"] + i + 1) % 4096
        t0 = time.time()
        state, metrics = step_fn(state, b, jax.random.fold_in(key, i))
        loss = float(metrics["loss"])  # host sync, forces full step
        times.append(time.time() - t0)
        print(f"  iter {i}: {times[-1]*1e3:.1f} ms, loss {loss:.4f}",
              flush=True)
    ms = min(times) * 1e3
    print(f"B={B} L={L} remat_policy={policy:<8} {ms:9.1f} ms/step "
          f"(compile {first:.0f}s)", flush=True)


for pol in POLICIES:
    run(pol)
