"""Diagnose the cold-start path: persistent-cache retrieval vs remote compile.

Round-4 finding to explain: with a populated persistent cache the bench
warmup measured 205 s (14 hits, 0 misses) — WORSE than the 50 s empty-cache
compile path (BENCH_r03).  Hypotheses:
  (a) executable deserialization ships the binary over the slow axon tunnel
      uplink (compile never ships the executable back to the client);
  (b) PJRT deserialize serializes on a client lock so concurrent warmup
      degenerates to a serial sum;
  (c) deserialize triggers a server-side recompile anyway.

Run each mode in a FRESH process (the in-process jit cache would hide
everything):

  python scripts/coldstart_diag.py bandwidth          # tunnel MB/s probe
  python scripts/coldstart_diag.py retrieve [B] [L]   # populated cache
  python scripts/coldstart_diag.py compile  [B] [L]   # cache disabled
  python scripts/coldstart_diag.py ladder_retrieve    # all 3 buckets, conc.
  python scripts/coldstart_diag.py ladder_compile
  python scripts/coldstart_diag.py ladder_serial_retrieve  # one at a time

Prints one JSON line per run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esmdiff_tpu.utils import fixtures as __fx  # noqa: E402


def _bandwidth():
    import jax
    import numpy as np

    dev = jax.devices()[0]
    out = {}
    for mb in (1, 16, 64):
        arr = np.random.RandomState(0).rand(mb * 1024 * 1024 // 8)
        t0 = time.time()
        jax.block_until_ready(jax.device_put(arr, dev))
        up = time.time() - t0
        t0 = time.time()
        np.asarray(jax.device_put(arr, dev))  # down: device -> host
        down = time.time() - t0
        out[f"{mb}MB"] = {"up_s": round(up, 3), "down_s": round(down, 3),
                          "up_MBps": round(mb / up, 1),
                          "down_MBps": round(mb / down, 1)}
    print(json.dumps({"mode": "bandwidth", "xfer": out,
                      "device": str(dev)}))


def _bucket(mode: str, B: int, L: int, concurrent_ladder: bool):
    t_import0 = time.time()
    if mode.endswith("compile"):
        # a throwaway empty dir => every program is a miss, nothing persists
        os.environ["ESMDIFF_COMPILATION_CACHE"] = f"/tmp/empty_xla_{os.getpid()}"

    from esmdiff_tpu.utils.compilation_cache import (
        CacheEventCounter, enable as _enable_cache)
    _enable_cache()
    ev = CacheEventCounter().install()

    import jax

    import bench

    cfg, mdlm, params = bench.build_sampler(quant="int8")
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    t_setup = time.time() - t_import0

    from esmdiff_tpu.api.generation import plan_batches
    from esmdiff_tpu.core.tokenizer import SequenceTokenizer
    from esmdiff_tpu.api.protein_api import ESMProtein

    prot = ESMProtein.from_pdb(str(__fx.bpti_pdb()))
    seq_tokens = SequenceTokenizer().encode(prot.sequence)
    Lw = len(seq_tokens)
    Lpad = ((Lw + 63) // 64) * 64 if L == 0 else L

    if concurrent_ladder:
        sizes = plan_batches(Lw, 100, max_batch=128)
        fns = {b: bench.make_bucket_fn(mdlm, bench._seq_row(seq_tokens, Lpad),
                                       b, Lpad, 25)
               for b in dict.fromkeys(sizes)}
        t0 = time.time()
        if "serial" in mode:
            per_bucket = {}
            for b, fn in fns.items():
                tb = time.time()
                jax.block_until_ready(fn(params, jax.random.PRNGKey(0)))
                per_bucket[b] = round(time.time() - tb, 1)
            wall = time.time() - t0
            per = {"ladder": sizes, "per_bucket_s": per_bucket}
        else:
            wall, phases = bench.warm_buckets(fns, params)
            per = {"ladder": sizes, "warmup_phases": phases}
    else:
        fn = bench.make_bucket_fn(
            mdlm, bench._seq_row(seq_tokens, Lpad), B, Lpad, 25)
        t0 = time.time()
        jax.block_until_ready(fn(params, jax.random.PRNGKey(0)))
        wall = time.time() - t0
        per = {"B": B, "L": Lpad}

    print(json.dumps({"mode": mode, **per,
                      "setup_s": round(t_setup, 1),
                      "first_call_s": round(wall, 1),
                      "compile_cache": ev.snapshot()}))


def _phases():
    """Decompose the cold-start wall of the headline bucket (B=64) into
    param-build / trace+lower / compile-or-load / first-execute — the
    accounting VERDICT round-4 weak #1 asks for.  Run in a fresh process."""
    t_all0 = time.time()
    from esmdiff_tpu.utils.compilation_cache import (
        CacheEventCounter, enable as _enable_cache)
    _enable_cache()
    ev = CacheEventCounter().install()

    import jax

    import bench

    t0 = time.time()
    cfg, mdlm, params = bench.build_sampler(quant="int8")
    t_build_dispatch = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(params)   # ALL leaves: init + quantize really done
    t_params_ready = time.time() - t0

    from esmdiff_tpu.core.tokenizer import SequenceTokenizer
    from esmdiff_tpu.api.protein_api import ESMProtein

    prot = ESMProtein.from_pdb(str(__fx.bpti_pdb()))
    seq_tokens = SequenceTokenizer().encode(prot.sequence)
    Lpad = ((len(seq_tokens) + 63) // 64) * 64
    fn = bench.make_bucket_fn(mdlm, bench._seq_row(seq_tokens, Lpad),
                              64, Lpad, 25)

    t0 = time.time()
    lowered = fn.lower(params, jax.random.PRNGKey(0))
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile_or_load = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(compiled(params, jax.random.PRNGKey(0)))
    t_first_exec = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(compiled(params, jax.random.PRNGKey(1)))
    t_steady = time.time() - t0

    print(json.dumps({
        "mode": "phases", "B": 64, "L": Lpad,
        "build_dispatch_s": round(t_build_dispatch, 1),
        "params_ready_s": round(t_params_ready, 1),
        "trace_lower_s": round(t_lower, 1),
        "compile_or_load_s": round(t_compile_or_load, 1),
        "first_exec_s": round(t_first_exec, 1),
        "steady_exec_s": round(t_steady, 2),
        "total_s": round(time.time() - t_all0, 1),
        "compile_cache": ev.snapshot()}))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "retrieve"
    if mode == "bandwidth":
        _bandwidth()
        return
    if mode == "phases":
        _phases()
        return
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    _bucket(mode, B, L, concurrent_ladder=mode.startswith("ladder"))


if __name__ == "__main__":
    main()
