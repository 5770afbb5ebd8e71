"""fp-vs-int8 quality parity on TRAINED weights (the round-3 campaign
checkpoint): logit-level agreement across diffusion times, and seeded
ensemble sampling with both backends through the production CLI path,
compared on the campaign's ensemble metrics.

Usage (real chip, ~5 min):
  python scripts/quant_parity.py --root output/campaign
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from esmdiff_tpu.utils.fixtures import targets_root
TARGETS_ROOT = targets_root()


def logit_parity(runtime, qruntime, seq: str, n_times: int = 5):
    """Forward the trained MDLM trunk fp vs int8 on identical noisy inputs
    at several masking levels; report argmax agreement + logprob stats."""
    import jax
    import jax.numpy as jnp

    from esmdiff_tpu.core import constants as C

    st = runtime.seq_tokenizer.encode(seq)
    Lw = len(st)
    L = ((Lw + 63) // 64) * 64
    seq_row = np.full((L,), C.SEQUENCE_PAD_TOKEN, np.int32)
    seq_row[:Lw] = st
    seq_b = jnp.asarray(np.tile(seq_row[None], (8, 1)))

    def make_fwd(rt):
        @jax.jit
        def f(params, toks):
            out = rt.trunk.apply(
                {"params": params},
                structure_tokens=toks, sequence_tokens=seq_b)
            return out.structure_logits.astype(jnp.float32)
        return f

    fwd_f, fwd_q = make_fwd(runtime), make_fwd(qruntime)

    rng = np.random.default_rng(0)
    rows = []
    for frac in np.linspace(0.2, 1.0, n_times):
        toks = np.full((8, L), C.STRUCTURE_PAD_TOKEN, np.int32)
        # random structure tokens with `frac` of positions masked
        body = rng.integers(0, 4096, (8, L))
        m = rng.random((8, L)) < frac
        body[m] = C.STRUCTURE_MASK_TOKEN
        toks[:, :Lw] = body[:, :Lw]
        toks_b = jnp.asarray(toks)

        lf = np.asarray(fwd_f(runtime.trunk_params, toks_b))
        lq = np.asarray(fwd_q(qruntime.trunk_params, toks_b))
        pf = jax.nn.log_softmax(jnp.asarray(lf), axis=-1)
        pq = jax.nn.log_softmax(jnp.asarray(lq), axis=-1)
        kl = float(jnp.mean(jnp.sum(jnp.exp(pf) * (pf - pq), axis=-1)))
        rows.append({
            "mask_frac": round(float(frac), 2),
            "argmax_agree": round(
                float((lf.argmax(-1) == lq.argmax(-1)).mean()), 4),
            "mean_kl_nats": round(kl, 5),
            "max_abs_logit_diff": round(float(np.abs(lf - lq).max()), 3),
        })
    return rows


def sample_and_score(tag, quant, targets, root, out_base, num_samples,
                     num_steps, score_only=False):
    from esmdiff_tpu.cli.sample import main as sample_main
    from esmdiff_tpu.core.protein import load_ca_ensemble
    from esmdiff_tpu.eval import metrics
    from esmdiff_tpu.eval.tmscore import tm_diversity, tm_ensemble

    out_dir = out_base / tag
    wall = 0.0
    if not score_only:
        argv = [
            "--input", str(root / "quant_eval_targets"),
            "--output", str(out_dir),
            "--mode", "ddpm", "--num_steps", str(num_steps),
            "--num_samples", str(num_samples),
            "--ckpt", str(root / "mdlm_run" / "ckpt"),
            "--vqvae_ckpt", str(root / "vqvae"),
        ]
        if quant != "none":
            argv += ["--quant", quant]
        t0 = time.time()
        sample_main(argv)
        wall = time.time() - t0
    rows = []
    for name, fam in targets:
        pred = out_dir / f"{name}.pdb"
        target = TARGETS_ROOT / fam / f"{name}.pdb"
        pred_ca = load_ca_ensemble(pred)
        target_ca = load_ca_ensemble(target)[0]
        Lc = min(pred_ca.shape[1], len(target_ca))
        tm_best, rmsd_best = tm_ensemble(pred_ca[:, :Lc], target_ca[:Lc])
        d = {"pred": pred_ca[:, :Lc], "target": target_ca[None, :Lc]}
        rows.append({
            "target": name,
            "tm_ens": round(tm_best, 4),
            "rmsd_best": round(rmsd_best, 3),
            "tm_div": round(float(tm_diversity(pred_ca[:, :Lc])), 4),
            "clash_validity": round(
                float(metrics.validity({"pred": pred_ca})["pred"]), 4),
            "bond_validity": round(
                float(metrics.bonding_validity(d)["pred"]), 4),
        })
    return {"wall_s": round(wall, 1), "per_target": rows}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default="output/campaign")
    ap.add_argument("--out", type=str, default="output/quant_parity")
    ap.add_argument("--num_samples", type=int, default=50)
    ap.add_argument("--num_steps", type=int, default=25)
    ap.add_argument("--score_only", action="store_true",
                    help="Re-score existing sample dirs (skip the chip).")
    args = ap.parse_args()

    from esmdiff_tpu.utils.compilation_cache import enable as _enable
    _enable()

    import shutil

    from esmdiff_tpu.api.protein_api import ESMProtein
    from esmdiff_tpu.convert.checkpoints import load_runtime

    root = Path(args.root)
    out_base = Path(args.out)
    out_base.mkdir(parents=True, exist_ok=True)

    # one short target per family (cheap buckets, distinct lengths)
    targets = []
    for fam in ("bpti", "apo", "codnas", "ped"):
        fam_dir = root / "eval_targets" / fam
        cands = sorted(fam_dir.glob("*.pdb"),
                       key=lambda p: p.stat().st_size)
        if cands:
            targets.append((cands[0].stem, fam))
    in_dir = root / "quant_eval_targets"
    in_dir.mkdir(exist_ok=True)
    for name, fam in targets:
        shutil.copy(TARGETS_ROOT / fam / f"{name}.pdb",
                    in_dir / f"{name}.pdb")
    print(f"[targets] {targets}")

    report = {}
    if not args.score_only:
        runtime = load_runtime(str(root / "mdlm_run" / "ckpt"),
                               vqvae_ckpt=str(root / "vqvae"))
        qruntime = runtime.quantize("int8")
        bpti_seq = ESMProtein.from_pdb(
            TARGETS_ROOT / "bpti" / "bpti.pdb").sequence
        parity = logit_parity(runtime, qruntime, bpti_seq)
        for r in parity:
            print("[logits]", r)
        del runtime, qruntime
        report["logit_parity_bpti"] = parity
    elif (out_base / "report.json").exists():
        report = json.loads((out_base / "report.json").read_text())

    for tag, quant in (("fp", "none"), ("int8", "int8")):
        old_wall = report.get(tag, {}).get("wall_s")
        report[tag] = sample_and_score(
            tag, quant, targets, root, out_base,
            args.num_samples, args.num_steps,
            score_only=args.score_only)
        if args.score_only and old_wall is not None:
            report[tag]["wall_s"] = old_wall
        print(f"[{tag}] wall {report[tag]['wall_s']}s")
        for r in report[tag]["per_target"]:
            print(f"  {r}")
    (out_base / "report.json").write_text(json.dumps(report, indent=2))
    print(f"[done] -> {out_base / 'report.json'}")


if __name__ == "__main__":
    main()
