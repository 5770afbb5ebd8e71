"""Real-weight-day runbook: one command from downloaded PyTorch checkpoints
to a verified, quant-checked, benchmarked TPU sampler (VERDICT round-3
item 6).

No pretrained weights exist in THIS environment (zero egress), so the chain
is smoke-tested end-to-end on reference-layout FIXTURE checkpoints
(``--fixture``): synthetic torch state dicts in the exact tensor layout the
converters expect (convert/verify.py's make_reference_*_state_dict), saved
as real ``.pt`` files and pushed through the same stages real weights will
take.  ``esmdiff-verify`` disagreement on real-weight day is NEWS, not noise
(the in-repo oracles pin the same architectural reading as the JAX code —
ROUND3_NOTES caveat) — which is exactly why the gate is a hard failure.

Stages (all run by default; ``--stages`` to select):

  download      check the expected files exist; print fetch instructions
                (reference README.md:60-65; esm3_sm_open_v1 from the HF hub,
                release_v0.pt from the reference's Google Drive link)
  verify        per-layer torch-vs-jax activation diff for every provided
                component (convert/verify.py); HARD-FAILS above --tol
  convert       build the sampling runtime from the torch files + export
                the VQ-VAE pair to the standard --vqvae_ckpt layout, then
                prove the path with a tiny sampling probe (multi-MODEL PDB)
  quant_parity  fp-vs-int8 logit parity on the CONVERTED weights (the gate
                PERF.md requires before enabling int8 serving in production;
                re-uses scripts/quant_parity.logit_parity)
  bench         throughput: the canonical 25-step BPTI workload
                (full bench.py on TPU; an inline tiny probe under --fixture)
  campaign      sample a benchmark target through the production CLI and
                score TM-ens/validity (the first real-quality number)

Real-weight usage (on the TPU host):

  python scripts/real_weight_day.py \
      --trunk /data/esm3_sm_open_v1.pt \
      --vq_encoder /data/esm3_structure_encoder_v0.pt \
      --vq_decoder /data/esm3_structure_decoder_v0.pt \
      [--release release_v0.pt]    # fine-tuned ESMDiff trunk, if available

Fixture smoke (CPU, ~2 min):  python scripts/real_weight_day.py --fixture
"""

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))  # sibling scripts

import numpy as np

from esmdiff_tpu.utils.fixtures import bpti_pdb
BPTI = str(bpti_pdb())

DOWNLOAD_NOTES = """\
[download] expected checkpoint files (reference README.md:60-65, net.py:358):
  trunk        esm3_sm_open_v1 state dict (HF hub EvolutionaryScale/esm3;
               data/weights/esm3_sm_open_v1.pth inside the package cache)
  vq_encoder   esm3_structure_encoder_v0.pth   (same HF snapshot)
  vq_decoder   esm3_structure_decoder_v0.pth   (same HF snapshot)
  release      release_v0.pt — the paper's fine-tuned ESMDiff weights
               (reference README.md:60: Google Drive link; optional)
"""


def _cfgs(fixture: bool):
    """(trunk_cfg, enc_cfg, dec_cfg) at fixture(tiny)/real(full) geometry."""
    from esmdiff_tpu.models.esm3 import ESM3Config, esm3_tiny
    from esmdiff_tpu.models.vqvae import DecoderConfig, EncoderConfig

    if fixture:
        # NB the decoder keeps scan_layers=True (the default): the converter
        # maps the reference's per-layer keys into the SCANNED stacked
        # layout (torch_to_jax.vqvae_decoder_rules) — an unscanned template
        # mis-stacks and fails verify (caught by this smoke's first run)
        return (esm3_tiny(dtype="float32", head_type="structure"),
                EncoderConfig(d_model=64, n_heads=2, v_heads=8, n_layers=2,
                              d_out=16, knn=8),
                DecoderConfig(d_model=64, n_heads=4, n_layers=3,
                              dtype="float32"))
    return (ESM3Config(head_type="structure"), EncoderConfig(),
            DecoderConfig())


def stage_download(args) -> dict:
    paths = {"trunk": args.trunk, "vq_encoder": args.vq_encoder,
             "vq_decoder": args.vq_decoder, "release": args.release}
    if args.fixture:
        # materialize reference-layout fixture .pt files — the same bytes
        # path real downloads take (torch.save/load round trip)
        import torch

        from esmdiff_tpu.convert.verify import (
            make_reference_decoder_state_dict,
            make_reference_encoder_state_dict,
            make_reference_trunk_state_dict)

        tcfg, ecfg, dcfg = _cfgs(True)
        root = Path(args.workdir) / "fixture_weights"
        root.mkdir(parents=True, exist_ok=True)
        makers = {
            "trunk": lambda: make_reference_trunk_state_dict(tcfg),
            "vq_encoder": lambda: make_reference_encoder_state_dict(ecfg),
            "vq_decoder": lambda: make_reference_decoder_state_dict(dcfg),
        }
        for name, make in makers.items():
            f = root / f"{name}.pt"
            if not f.exists():
                torch.save({k: torch.from_numpy(np.asarray(v))
                            for k, v in make().items()}, f)
            paths[name] = str(f)
        paths["release"] = None
        print(f"[download] fixture weights -> {root}")
        return paths
    print(DOWNLOAD_NOTES)
    missing = [k for k, v in paths.items()
               if k != "release" and (not v or not Path(v).exists())]
    if missing:
        raise SystemExit(f"[download] missing checkpoint files: {missing} "
                         f"— fetch them (see above) and re-run")
    print(f"[download] all present: "
          f"{ {k: v for k, v in paths.items() if v} }")
    return paths


def stage_verify(args, paths) -> None:
    """esmdiff-verify every component; hard gate on the max rel diff."""
    from esmdiff_tpu.convert import verify as V
    from esmdiff_tpu.convert.torch_to_jax import (load_torch_state_dict,
                                                  strip_prefix)

    tcfg, ecfg, dcfg = _cfgs(args.fixture)

    def gate(rows, label):
        worst = max((r["rel_diff"] for r in rows if "rel_diff" in r),
                    default=0.0)
        if worst > args.tol:
            raise SystemExit(
                f"[verify] {label}: max rel diff {worst:.3e} > tol "
                f"{args.tol:.1e} — conversion DISAGREES with the torch "
                f"oracle; treat as news (ROUND3_NOTES caveat), do not "
                f"proceed to serving")
        print(f"[verify] {label}: max rel diff {worst:.3e} <= {args.tol:.0e}")

    sd = load_torch_state_dict(paths["trunk"])
    gate(V.verify_trunk(strip_prefix(sd, "net.")
                        if any(k.startswith("net.") for k in sd) else sd,
                        tcfg), "trunk")
    gate(V.verify_vqvae_encoder(
        load_torch_state_dict(paths["vq_encoder"]), ecfg), "vq_encoder")
    gate(V.verify_vqvae_decoder(
        load_torch_state_dict(paths["vq_decoder"]), dcfg), "vq_decoder")
    if paths.get("release"):
        rsd = load_torch_state_dict(paths["release"])
        if any(k.startswith("net.") for k in rsd):
            rsd = strip_prefix(rsd, "net.")
        gate(V.verify_trunk(rsd, tcfg), "release (fine-tuned trunk)")


def stage_convert(args, paths):
    """Torch files -> runtime; export the VQ-VAE pair; prove with a probe."""
    import jax

    from esmdiff_tpu.api.protein_api import ESM3Runtime
    from esmdiff_tpu.convert.checkpoints import save_vqvae
    from esmdiff_tpu.convert.torch_to_jax import (
        convert_trunk, convert_vqvae_decoder, convert_vqvae_encoder,
        load_torch_state_dict, strip_prefix)

    tcfg, ecfg, dcfg = _cfgs(args.fixture)
    runtime = ESM3Runtime.random_init(
        trunk_cfg=tcfg, encoder_cfg=ecfg, decoder_cfg=dcfg)

    trunk_path = paths.get("release") or paths["trunk"]
    sd = load_torch_state_dict(trunk_path)
    if any(k.startswith("net.") for k in sd):
        sd = strip_prefix(sd, "net.")
    runtime.trunk_params, rep = convert_trunk(
        runtime.trunk_params, sd, tcfg, strict=False)
    print(f"[convert] trunk from {trunk_path} "
          f"({len(rep['missing'])} missing, {len(rep['unmapped'])} unmapped)")
    runtime.encoder_params, _ = convert_vqvae_encoder(
        runtime.encoder_params, load_torch_state_dict(paths["vq_encoder"]),
        n_layers=ecfg.n_layers)
    runtime.decoder_params, _ = convert_vqvae_decoder(
        runtime.decoder_params, load_torch_state_dict(paths["vq_decoder"]),
        n_layers=dcfg.n_layers)

    vq_dir = Path(args.workdir) / "vqvae"
    save_vqvae(vq_dir, ecfg, runtime.encoder_params, dcfg,
               runtime.decoder_params)
    print(f"[convert] VQ-VAE pair -> {vq_dir} (use as --vqvae_ckpt)")

    # sampling probe through the generation engine: tokens -> coords -> PDB
    from esmdiff_tpu.api.generation import EnsembleSampler, GenerationConfig
    from esmdiff_tpu.core import protein as protein_io
    from esmdiff_tpu.core.protein import from_pdb_file

    seq = from_pdb_file(BPTI).sequence
    sampler = EnsembleSampler(runtime)
    toks = sampler.gibbs_ensemble(
        seq, 2, config=GenerationConfig(num_steps=2), seed=0)
    prots = sampler.decode_ensemble(seq, toks)
    out = Path(args.workdir) / "probe.pdb"
    out.write_text(protein_io.ensemble_to_pdb(
        [p.to_protein() for p in prots]))
    n_models = sum(1 for ln in out.read_text().splitlines()
                   if ln.startswith("MODEL"))
    assert n_models == 2, f"probe wrote {n_models} models"
    print(f"[convert] sampling probe ok -> {out} ({n_models} MODELs)")
    return runtime


def stage_quant_parity(args, runtime) -> None:
    """fp-vs-int8 logit parity on the CONVERTED weights (the PERF.md gate
    for production int8 serving: parity was only ever proven on
    trained-from-scratch weights before real-weight day)."""
    from quant_parity import logit_parity  # sibling script, same sys.path

    qruntime = runtime.quantize("int8")
    seq = _bpti_seq()
    rows = logit_parity(runtime, qruntime, seq)
    worst_agree = min(r["argmax_agree"] for r in rows)
    print(f"[quant_parity] argmax agreement across masking levels: "
          f"{[r['argmax_agree'] for r in rows]}")
    if worst_agree < args.quant_gate:
        raise SystemExit(
            f"[quant_parity] agreement {worst_agree:.3f} < "
            f"{args.quant_gate} — do NOT enable --quant int8 in serving "
            f"with these weights (PERF.md caveat)")
    print(f"[quant_parity] PASS (>= {args.quant_gate})")


def _bpti_seq() -> str:
    from esmdiff_tpu.core.protein import from_pdb_file

    return from_pdb_file(BPTI).sequence


def stage_bench(args, runtime) -> None:
    if not args.fixture:
        # the real thing: canonical 25-step x 100-sample BPTI line
        subprocess.run(
            [sys.executable,
             str(Path(__file__).resolve().parent.parent / "bench.py")],
            check=True)
        return
    # fixture: tiny inline throughput probe through the same engine
    from esmdiff_tpu.api.generation import EnsembleSampler

    sampler = EnsembleSampler(runtime)
    seq = _bpti_seq()
    sampler.ddpm_ensemble(seq, 8, num_steps=4, seed=0)   # compile
    t0 = time.time()
    sampler.ddpm_ensemble(seq, 8, num_steps=4, seed=1)
    dt = time.time() - t0
    print(f"[bench] fixture probe: 8 samples x 4 steps in {dt:.2f}s "
          f"({8 / dt:.1f} conf/s tiny-CPU — NOT the headline number; run "
          f"'python bench.py' on the TPU host)")


def stage_campaign(args, runtime) -> None:
    """First quality number on converted weights: sample a benchmark target
    through the engine and score TM-ens + validity."""
    from esmdiff_tpu.api.generation import EnsembleSampler, GenerationConfig
    from esmdiff_tpu.core import protein as protein_io
    from esmdiff_tpu.core.protein import load_ca_ensemble
    from esmdiff_tpu.eval import metrics
    from esmdiff_tpu.eval.tmscore import tm_diversity, tm_ensemble

    n = 4 if args.fixture else 100
    steps = 2 if args.fixture else 25
    seq = _bpti_seq()
    sampler = EnsembleSampler(runtime)
    toks = sampler.gibbs_ensemble(
        seq, n, config=GenerationConfig(num_steps=steps), seed=0)
    prots = sampler.decode_ensemble(seq, toks)
    out = Path(args.workdir) / "campaign_bpti.pdb"
    out.write_text(protein_io.ensemble_to_pdb(
        [p.to_protein() for p in prots]))
    pred = load_ca_ensemble(out)
    target = load_ca_ensemble(BPTI)[0]
    Lc = min(pred.shape[1], len(target))
    tm_best, rmsd_best = tm_ensemble(pred[:, :Lc], target[:Lc])
    report = {
        "target": "bpti", "n_samples": int(pred.shape[0]),
        "tm_ens": round(tm_best, 4), "rmsd_best": round(rmsd_best, 3),
        "tm_div": round(float(tm_diversity(pred[:, :Lc])), 4),
        "clash_validity": float(metrics.validity({"p": pred})["p"]),
    }
    (Path(args.workdir) / "report.json").write_text(json.dumps(report))
    print(f"[campaign] {report}")
    if not args.fixture:
        print("[campaign] full protocol: python scripts/quality_campaign.py "
              "sample analyze --out output/campaign_real "
              "(--ckpt the converted trunk, --vqvae_ckpt "
              f"{Path(args.workdir) / 'vqvae'})")


STAGES = ["download", "verify", "convert", "quant_parity", "bench",
          "campaign"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--fixture", action="store_true",
                   help="Smoke the whole chain on reference-layout fixture "
                        "weights at tiny geometry (CPU, ~2 min).")
    p.add_argument("--trunk", type=str, default=None)
    p.add_argument("--vq_encoder", type=str, default=None)
    p.add_argument("--vq_decoder", type=str, default=None)
    p.add_argument("--release", type=str, default=None,
                   help="Fine-tuned ESMDiff trunk (release_v0.pt); used "
                        "for sampling when given.")
    p.add_argument("--workdir", type=str, default="output/real_weight_day")
    p.add_argument("--stages", type=str, default=",".join(STAGES))
    p.add_argument("--tol", type=float, default=1e-3,
                   help="Max per-layer relative activation diff.")
    p.add_argument("--quant_gate", type=float, default=0.95,
                   help="Min fp-vs-int8 argmax agreement.")
    args = p.parse_args(argv)

    if args.fixture:
        os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    unknown = [s for s in stages if s not in STAGES]
    if unknown:  # fail BEFORE any stage runs, not minutes in with a KeyError
        p.error(f"unknown stage(s) {unknown}; valid stages: "
                f"{', '.join(STAGES)}")
    Path(args.workdir).mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    paths = stage_download(args)
    runtime = None
    for s in stages:
        if s == "download":
            continue
        print(f"========== {s} ==========", flush=True)
        if s == "verify":
            stage_verify(args, paths)
        elif s == "convert":
            runtime = stage_convert(args, paths)
        else:
            if runtime is None:
                runtime = stage_convert(args, paths)
            {"quant_parity": stage_quant_parity, "bench": stage_bench,
             "campaign": stage_campaign}[s](args, runtime)
    print(f"[real_weight_day] ALL STAGES GREEN in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
