"""Benchmark: conformations/sec/chip for 25-step ESMDiff sampling (BPTI).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload = the reference's canonical config (README.md:64-67): BPTI (58
residues), 25 denoising steps, full-size trunk (d_model 1536, 48 layers,
bf16).  The whole trajectory runs as a single jitted lax.scan on device.
Weights are randomly initialized (identical FLOPs/memory traffic to converted
weights).  NB: all-zero weights must NOT be used — this TPU runtime
short-circuits them and reports fantasy timings.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
1.0 = this framework's own round-1 reference point until a measured PyTorch
A100 number exists.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from esmdiff_tpu.utils.compilation_cache import enable as _enable_cache
    _enable_cache()
    from esmdiff_tpu.core import constants as C
    from esmdiff_tpu.core.tokenizer import SequenceTokenizer
    from esmdiff_tpu.diffusion.mdlm import MDLM, MDLMConfig
    from esmdiff_tpu.diffusion.noise import LogLinearNoise
    from esmdiff_tpu.models.esm3 import ESM3, ESM3Config
    from esmdiff_tpu.nn.layers import TimestepEmbedder
    from esmdiff_tpu.api.protein_api import ESMProtein

    import numpy as np

    prot = ESMProtein.from_pdb("/root/reference/data/targets/bpti/bpti.pdb")
    seq_tokens = SequenceTokenizer().encode(prot.sequence)
    num_steps = 25
    num_samples = 128

    cfg = ESM3Config(head_type="structure", param_dtype="bfloat16",
                     remat=False)
    net = ESM3(cfg)
    se = TimestepEmbedder(hidden_size=cfg.d_model, param_dtype=jnp.bfloat16)
    mdlm = MDLM(net, se, noise=LogLinearNoise(), cfg=MDLMConfig())
    params = mdlm.init(jax.random.PRNGKey(42), batch_size=1, length=16)

    B = num_samples
    # pad to the MXU-friendly 64 bucket (matches api/generation bucketing)
    L = ((len(seq_tokens) + 63) // 64) * 64
    row = np.full((L,), C.SEQUENCE_PAD_TOKEN, np.int32)
    row[:len(seq_tokens)] = seq_tokens
    seq = jnp.asarray(row)[None].repeat(B, axis=0)

    @jax.jit
    def sample(params, key):
        return mdlm.ddpm_sample(params, key, seq, num_steps=num_steps,
                                eps=1e-5)

    t0 = time.time()
    out = sample(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    first_call = time.time() - t0

    times = []
    for i in range(5):
        t0 = time.time()
        out = sample(params, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    best = min(times)
    p50 = sorted(times)[len(times) // 2]
    conf_per_sec = num_samples / best

    result = {
        "metric": "conformations/sec/chip (BPTI, 25-step ESMDiff sampling)",
        "value": round(conf_per_sec, 3),
        "unit": "conformations/sec",
        "vs_baseline": round(conf_per_sec / 1.0, 3),
        "detail": {
            "num_samples": num_samples,
            "num_steps": num_steps,
            "seq_len_padded": L,
            "seq_len_with_specials": len(seq_tokens),
            "best_wall_s": round(best, 3),
            "per_step_ms_batch": round(best / num_steps * 1000.0, 2),
            "p50_per_step_ms": round(p50 / num_steps * 1000.0, 2),
            "first_call_s": round(first_call, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
