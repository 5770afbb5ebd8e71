"""Profile the PRODUCTION ddpm sampling path at a given checkpoint geometry.

The round-4 campaign measured ~37 s steady-state per 50-sample target at
(B=64, L=128) on the d768/16L mid-scale trunk — ~30x off roofline — while
the tuned 1.4B gibbs path runs at 49 conf/s.  This drives the REAL
``ESMDiffSampler.ddpm_ensemble`` (planner, sigma conditioning, Gumbel,
scan) exactly as the CLI does, times compile vs steady wall, then captures
an xplane trace and prints the top device ops, so the sink is attributable
(device op vs dispatch vs host).

Run on the chip:
  python scripts/profile_ddpm.py --ckpt output/campaign_joint/mdlm_run/ckpt \
      --vqvae_ckpt output/campaign_joint/vqvae [--L 91] [--n 50] [--steps 25]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--vqvae_ckpt", required=True)
    p.add_argument("--L", type=int, default=91,
                   help="residue count (apo-median bucket by default)")
    p.add_argument("--n", type=int, default=50)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--trace_dir", default="/tmp/esmdiff_ddpm_profile")
    p.add_argument("--decode", action="store_true",
                   help="also time decode_ensemble (VQ decode + host)")
    args = p.parse_args(argv)

    import jax

    from esmdiff_tpu.api.generation import EnsembleSampler
    from esmdiff_tpu.convert.checkpoints import load_runtime
    from esmdiff_tpu.utils.compilation_cache import enable

    enable()
    rs = np.random.RandomState(0)
    seq = "".join(rs.choice(list("ACDEFGHIKLMNPQRSTVWY"), args.L))

    runtime = load_runtime(args.ckpt, vqvae_ckpt=args.vqvae_ckpt)
    sampler = EnsembleSampler(runtime)

    t0 = time.time()
    toks = sampler.ddpm_ensemble(seq, args.n, num_steps=args.steps, seed=0)
    print(f"[ddpm] cold (compile+run): {time.time() - t0:.2f}s "
          f"tokens {toks.shape}", flush=True)

    walls = []
    for i in range(3):
        t0 = time.time()
        toks = sampler.ddpm_ensemble(seq, args.n, num_steps=args.steps,
                                     seed=i + 1)
        walls.append(time.time() - t0)
    steady = min(walls)
    print(f"[ddpm] steady walls {['%.2f' % w for w in walls]} -> "
          f"{args.n / steady:.2f} conf/s", flush=True)

    if args.decode:
        t0 = time.time()
        prots = sampler.decode_ensemble(seq, toks)
        print(f"[decode] {len(prots)} proteins in {time.time() - t0:.2f}s",
              flush=True)
        t0 = time.time()
        sampler.decode_ensemble(seq, toks)
        print(f"[decode] warm repeat {time.time() - t0:.2f}s", flush=True)

    # a fresh per-run subdirectory so a reused --trace_dir can never hand us
    # a stale xplane from an earlier geometry
    run_dir = Path(args.trace_dir) / f"run_{os.getpid()}_{int(time.time())}"
    with jax.profiler.trace(str(run_dir)):
        sampler.ddpm_ensemble(seq, args.n, num_steps=args.steps, seed=99)

    from jax.profiler import ProfileData

    xplanes = sorted(run_dir.rglob("*.xplane.pb"),
                     key=lambda q: q.stat().st_mtime)
    if not xplanes:
        raise SystemExit(
            f"[profile] no .xplane.pb produced under {run_dir} — the "
            "profiler wrote no device trace (CPU-only backend, or trace "
            "write failure); timing numbers above are still valid")
    pd = ProfileData.from_file(str(xplanes[-1]))
    totals: dict[str, float] = {}
    n_events = 0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                totals[ev.name] = (totals.get(ev.name, 0.0)
                                   + ev.duration_ns / 1e6)
                n_events += 1
    total_ms = sum(totals.values())
    print(f"\n[profile] {n_events} device events; "
          f"device total {total_ms:.1f} ms vs steady wall {steady * 1e3:.1f} ms "
          f"({100 * total_ms / (steady * 1e3):.0f}% device-occupied)")
    print(f"{'op':<64} {'total ms':>9} {'ms/step':>8} {'%':>6}")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{name[:64]:<64} {ms:9.2f} {ms / args.steps:8.3f} "
              f"{100 * ms / total_ms:5.1f}%")


if __name__ == "__main__":
    main()
