"""Op-level profile of the in-scan trunk step on the real TPU.

Captures a jax.profiler trace of the 25-step trunk scan (B=64, L=64 by
default), parses the xplane with jax.profiler.ProfileData, and prints the
top device ops by total self-time — the measurement VERDICT round 2 item 2
asks for (where do the ~25 ms/step of non-GEMM time actually go).

Run on the chip:  python scripts/profile_step.py [B] [L] [trace_dir] [quant] [pack]
(pass ``int8`` as the 4th arg to profile the W8A8 serving config; a 5th
arg k > 1 profiles the sequence-packed view, ops/packing.py)
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
STEPS = 25
TRACE_DIR = sys.argv[3] if len(sys.argv) > 3 else "/tmp/esmdiff_profile"
QUANT = sys.argv[4] if len(sys.argv) > 4 else "none"
PACK = int(sys.argv[5]) if len(sys.argv) > 5 else 1


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
        print("[quant] profiling the W8A8 int8 trunk")

    rng = np.random.RandomState(0)
    seq = jnp.asarray(rng.randint(4, 24, (B, L)), jnp.int32)
    lengths = jnp.full((B,), L - 2, jnp.int32)
    if PACK > 1:
        from esmdiff_tpu.ops.packing import (
            packed_positions, packed_segment_ids)

        seg_ids = packed_segment_ids(lengths, L, PACK)
        positions = packed_positions(L, PACK)
        seq_in = seq.reshape(B // PACK, PACK * L)
        print(f"[pack] profiling the k={PACK} packed view "
              f"(B'={B // PACK}, L'={PACK * L})")
    else:
        seg_ids = positions = None
        seq_in = seq

    @jax.jit
    def run(params, toks0):
        def step(toks, _):
            out = net.apply({"params": params}, structure_tokens=toks,
                            sequence_tokens=seq_in,
                            lengths=None if PACK > 1 else lengths,
                            sequence_id=seg_ids, positions=positions)
            nxt = jnp.argmax(out.structure_logits, -1).astype(jnp.int32)
            return nxt, None
        toks, _ = jax.lax.scan(step, toks0, None, length=STEPS)
        return toks

    toks0 = jnp.asarray(rng.randint(0, 4096, (B, L)), jnp.int32)
    if PACK > 1:
        toks0 = toks0.reshape(B // PACK, PACK * L)
    t0 = time.time()
    np.asarray(run(params, toks0))  # compile + settle (host transfer = sync)
    print(f"compile/settle {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    np.asarray(run(params, toks0 + 1))
    wall = time.time() - t0
    print(f"steady state {wall / STEPS * 1e3:.2f} ms/step", flush=True)

    with jax.profiler.trace(TRACE_DIR):
        np.asarray(run(params, toks0 + 2))

    # ---- parse the trace ----
    from pathlib import Path

    from jax.profiler import ProfileData

    xplanes = sorted(Path(TRACE_DIR).rglob("*.xplane.pb"),
                     key=lambda p: p.stat().st_mtime)
    pd = ProfileData.from_file(str(xplanes[-1]))
    totals: dict[str, float] = {}
    n_events = 0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns
                name = ev.name
                totals[name] = totals.get(name, 0.0) + dur / 1e6
                n_events += 1
    print(f"\n[profile] {n_events} device events from {xplanes[-1].name}")
    total_ms = sum(totals.values())
    print(f"{'op':<64} {'total ms':>9} {'ms/step':>8} {'%':>6}")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{name[:64]:<64} {ms:9.2f} {ms / STEPS:8.3f} "
              f"{100 * ms / total_ms:5.1f}%")
    print(f"{'TOTAL':<64} {total_ms:9.2f} {total_ms / STEPS:8.3f}")


if __name__ == "__main__":
    main()
