"""Conformation-ensemble sampling CLI.

TPU-native equivalent of the reference's flagship inference entry point
(slm/sample_esmdiff.py:236-294): per-target PDB in a directory -> N sampled
conformations -> one multi-MODEL PDB per target.

Modes:
  gibbs — iterative confidence-ranked unmasking with the (pretrained) trunk
  ddpm  — fine-tuned ESMDiff ancestral masked-diffusion sampling
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

from esmdiff_tpu.api.generation import EnsembleSampler, GenerationConfig
from esmdiff_tpu.api.protein_api import ESM3Runtime, ESMProtein
from esmdiff_tpu.core import protein as protein_io


def build_runtime(args) -> ESM3Runtime:
    if args.ckpt:
        from esmdiff_tpu.convert.checkpoints import load_runtime
        return load_runtime(args.ckpt,
                            vqvae_ckpt=getattr(args, "vqvae_ckpt", None))
    from esmdiff_tpu.models.esm3 import ESM3Config, esm3_tiny
    from esmdiff_tpu.models.vqvae import DecoderConfig, EncoderConfig

    print("[warning] no --ckpt given: sampling with RANDOM weights "
          "(throughput/dev runs only — outputs are not physical ensembles)")
    head = "structure" if args.mode == "ddpm" else "esm3"
    if args.model_scale == "full":
        return ESM3Runtime.random_init(
            seed=args.seed, trunk_cfg=ESM3Config(head_type=head))
    return ESM3Runtime.random_init(
        seed=args.seed,
        trunk_cfg=esm3_tiny(head_type=head, dtype="float32"),
        encoder_cfg=EncoderConfig(d_model=64, n_heads=2, v_heads=8,
                                  n_layers=2, d_out=16, knn=8),
        decoder_cfg=DecoderConfig(d_model=64, n_heads=2, n_layers=2,
                                  dtype="float32", scan_layers=False),
    )


def get_argparser():
    p = argparse.ArgumentParser(
        description="Sample protein conformation ensembles (TPU-native).")
    p.add_argument("--input", type=str, nargs="+",
                   default=["data/targets/bpti"],
                   help="Directories of target .pdb files.  With more than "
                        "one directory, each target's output lands in "
                        "<output>/<input dirname>/ and the whole sweep "
                        "shares ONE runtime + jit cache (a corpus-wide "
                        "sweep compiles each (B, L) bucket exactly once).")
    p.add_argument("--ckpt", type=str, default=None,
                   help="Checkpoint (orbax dir or converted .pt). None = "
                        "random weights (dev only).")
    p.add_argument("--vqvae_ckpt", type=str, default=None,
                   help="Trained VQ-VAE dir (convert.checkpoints.save_vqvae "
                        "layout) to pair with --ckpt — the quality-campaign "
                        "path (scripts/quality_campaign.py).")
    p.add_argument("--output", type=str, default="output/inference_esmdiff")
    p.add_argument("--mode", type=str, default="gibbs",
                   choices=["gibbs", "ddpm", "eb"],
                   help="gibbs = cosine-schedule iterative unmasking; "
                        "ddpm = fine-tuned masked-diffusion; eb = adaptive "
                        "entropy-bounded unmasking — EXPERIMENTAL: did not "
                        "beat fixed-step gibbs at equal trunk-forward "
                        "budget on the tiny-model testbed (PERF.md table, "
                        "scripts/eb_quality.py).")
    p.add_argument("--num_steps", type=int, default=25)
    p.add_argument("--num_samples", type=int, default=10)
    p.add_argument("--mask_ids", type=str, default=None,
                   help="Comma-separated 0-based residue indices to inpaint.")
    p.add_argument("--filled_ids", type=str, default=None,
                   help="Comma-separated indices to KEEP (everything else is "
                        "generated) — complement of --mask_ids (ddpm only, "
                        "reference sample_esmdiff.py:203-207).")
    p.add_argument("--temperature", type=float, default=1.4)
    p.add_argument("--top_p", type=float, default=0.9)
    p.add_argument("--entropy_budget", type=float, default=1.0,
                   help="eb mode: max cumulative entropy (nats) committed "
                        "per trunk forward.")
    p.add_argument("--ref_compat", action="store_true",
                   help="ddpm inpainting: reproduce the reference's mask "
                        "indexing exactly (it masks TOKEN idx in the BOS-led "
                        "array = residue idx-1, sample_esmdiff.py:201-202). "
                        "Default masks residue idx, consistent with --mode "
                        "gibbs sequence-char masking.")
    p.add_argument("--quant", type=str, default="none",
                   choices=["none", "int8"],
                   help="int8 = W8A8 trunk projections on the MXU's 2x int8 "
                        "path (ops/quant.py) — serving optimization; "
                        "measured speed/parity in PERF.md.")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model_scale", type=str, default="full",
                   choices=["full", "tiny"],
                   help="Trunk size when no ckpt is given.")
    p.add_argument("--max_batch", type=int, default=None)
    p.add_argument("--data_parallel", action="store_true",
                   help="Shard the sample batch across all local devices "
                        "(params replicated).")
    p.add_argument("--profile", type=str, default=None,
                   help="Directory for a jax.profiler trace of the sampling "
                        "phase (TPU-equivalent of the reference's Lightning "
                        "profiler, configs/debug/profiler.yaml).")
    p.add_argument("--skip_existing", action="store_true",
                   help="Skip targets whose output PDB already exists — "
                        "makes long sweeps (full_eval: 282 targets) "
                        "resumable after an interruption.")
    p.add_argument("--refine", action="store_true",
                   help="Post-decode geometry projection (ops/refine.py): "
                        "clamp adjacent CA-CA distances into the physical "
                        "band and push non-bonded clashes apart, shifting "
                        "each residue rigidly — rescues bond/clash validity "
                        "at the scratch-tokenizer decode floor.")
    p.add_argument("--plan", type=str, default="single",
                   choices=["single", "ladder"],
                   help="Batch planning: 'single' compiles ONE program per "
                        "length bucket (sweep default — each extra program "
                        "costs ~10-30s compile/cache-load on this runtime); "
                        "'ladder' minimizes surplus rows (right when shapes "
                        "are warm).  Same seed -> identical ensembles.")
    return p


def main(argv=None):
    args = get_argparser().parse_args(argv)
    from esmdiff_tpu.utils.compilation_cache import enable as _enable_cache
    _enable_cache()
    from esmdiff_tpu.utils.device import prime_transfers_async
    # one-time tunnel d2h stream setup (6-350 s variance, utils/device.py),
    # overlapped with runtime build + first compile
    _prime_join, _ = prime_transfers_async()
    data_paths = [Path(p) for p in (
        args.input if isinstance(args.input, list) else [args.input])]
    for dp in data_paths:
        assert dp.is_dir(), f"--input must be a directory: {dp}"
    multi_input = len(data_paths) > 1
    output_dir = Path(args.output)
    output_dir.mkdir(parents=True, exist_ok=True)

    runtime = build_runtime(args)
    if getattr(args, "quant", "none") == "int8":
        runtime = runtime.quantize("int8")
        print("[quant] trunk projections running W8A8 int8")
    mesh = None
    if args.data_parallel:
        from esmdiff_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh()
        print(f"[mesh] sampling across {mesh.devices.size} device(s)")
    sampler = EnsembleSampler(runtime, mesh=mesh, plan_policy=args.plan)
    mask_ids = (
        [int(i) for i in args.mask_ids.split(",")] if args.mask_ids else None
    )
    filled_ids = (
        [int(i) for i in args.filled_ids.split(",")]
        if args.filled_ids else None
    )

    # distinct --input dirs sharing a basename (runA/targets, runB/targets)
    # must not collide into one output subdir.  The disambiguation is
    # derived from the resolved PATH (parent-qualified until unique), not
    # encounter order: a --skip_existing resume with the dirs reordered
    # must map every dir to the same output subdir (round-4 advisor)
    resolved = [dp.resolve() for dp in data_paths]
    if len(set(resolved)) != len(resolved):
        raise SystemExit("--input lists the same directory twice")

    def _subdir_name(rp: Path) -> str:
        same = [p for p in resolved if p.name == rp.name]
        if len(same) == 1:
            return rp.name
        k = 2
        while True:  # qualify with parents until all colliding names split
            tails = {"--".join(p.parts[-k:]).replace("/", "--")
                     for p in same}
            if len(tails) == len(same):
                return "--".join(rp.parts[-k:]).replace("/", "--")
            k += 1

    targets = []
    for dp, rp in zip(data_paths, resolved):
        if multi_input:
            sub = output_dir / _subdir_name(rp)
        else:
            sub = output_dir
        sub.mkdir(parents=True, exist_ok=True)
        targets += [(p, sub) for p in sorted(dp.iterdir())
                    if p.suffix == ".pdb"]
    # resumed sweeps (--skip_existing) merge into the prior timing report
    # instead of overwriting it with only the newly sampled targets
    timings_path = output_dir / "timings.json"
    prior: dict[str, dict] = {}
    if args.skip_existing and timings_path.exists():
        for r in json.loads(timings_path.read_text()):
            r.setdefault("key", r["target"])  # pre-round-4 format
            prior[r["key"]] = r
    report = []
    profile_cm = None
    if args.profile:
        import jax

        profile_cm = jax.profiler.trace(args.profile)
        profile_cm.__enter__()
    print(f"[device] transfer prime: {_prime_join()}")
    for path, out_dir_t in targets:
        key = (f"{out_dir_t.name}/{path.stem}" if multi_input
               else path.stem)
        if args.skip_existing and (out_dir_t / f"{path.stem}.pdb").exists():
            print(f"[{key}] exists, skipped (--skip_existing)")
            continue
        prot = ESMProtein.from_pdb(path)
        seq = prot.sequence
        t0 = time.time()
        if args.mode == "eb":
            tokens = sampler.eb_ensemble(
                seq, args.num_samples,
                entropy_budget=args.entropy_budget,
                temperature=args.temperature, top_p=args.top_p,
                max_steps=args.num_steps * 8,
                seed=args.seed, max_batch=args.max_batch,
            )
        elif args.mode == "gibbs":
            tokens = sampler.gibbs_ensemble(
                seq, args.num_samples,
                config=GenerationConfig(
                    num_steps=args.num_steps, temperature=args.temperature,
                    top_p=args.top_p),
                seed=args.seed,
                coordinates=prot.coordinates if mask_ids else None,
                mask_ids=mask_ids,
                max_batch=args.max_batch,
            )
        else:
            structure_tokens = None
            if mask_ids or filled_ids:
                pt = runtime.encode(prot)
                structure_tokens = pt.structure
            tokens = sampler.ddpm_ensemble(
                seq, args.num_samples, num_steps=args.num_steps,
                seed=args.seed, mask_ids=mask_ids, filled_ids=filled_ids,
                structure_tokens=structure_tokens,
                max_batch=args.max_batch, ref_compat=args.ref_compat,
            )
        t_tokens = time.time() - t0
        prots = sampler.decode_ensemble(seq, tokens)
        if args.refine:
            from esmdiff_tpu.ops.refine import refine_ca_ensemble

            # project each conformation's CA trace into the validity band
            # and translate every residue's atoms rigidly by its CA
            # displacement (ops/refine.py; only CA metrics are evaluated
            # by the reference suite, eval_utils.py:132-188)
            ca = np.stack([p.coordinates[:, 1] for p in prots])
            shift = np.nan_to_num(refine_ca_ensemble(ca) - ca, nan=0.0)
            for p, s in zip(prots, shift):
                p.coordinates += s[:, None, :]
        t_total = time.time() - t0

        out_file = out_dir_t / f"{path.stem}.pdb"
        protein_io.ensemble_to_pdb_file(
            [p.to_protein() for p in prots], out_file)
        print(f"[{key}] {args.num_samples} samples x "
              f"{args.num_steps} steps: tokens {t_tokens:.2f}s, "
              f"total {t_total:.2f}s -> {out_file}")
        report.append({
            "target": path.stem, "key": key, "L": len(seq),
            "num_samples": args.num_samples,
            "sampling_sec": t_tokens, "total_sec": t_total,
        })
    if profile_cm is not None:
        profile_cm.__exit__(None, None, None)
        print(f"[profile] trace written to {args.profile}")
    prior.update({r["key"]: r for r in report})
    timings_path.write_text(
        json.dumps(sorted(prior.values(), key=lambda r: r["key"]),
                   indent=2))


if __name__ == "__main__":
    main()
