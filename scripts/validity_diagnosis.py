"""Diagnose WHY sampled ensembles fail the validity metrics (VERDICT r3 #3).

Ground truth passes the calibrated metrics (tests/test_eval.py), so a 0.0
must come from the decoded geometry itself.  This script quantifies how:
for every sampled ensemble it histograms

  - adjacent CA-CA distances (bonds; real chains: 3.73-4.01 Å, see the
    PERF.md round-4 calibration) against the per-target bond threshold,
  - non-bonded minimum CA-CA distances (clashes; bar = 2*1.7 - 0.4 = 3.0 Å,
    reference eval_utils.py:132),

and reports the fraction of frames failing each criterion plus the offending
distance quantiles, so "0.0 validity" becomes "N% of bonds outside
[lo, hi] Å with median X" — attributable, not ambiguous.

Usage:
  python scripts/validity_diagnosis.py output/campaign_joint/samples \
      [--report output/campaign_joint/validity_diagnosis.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esmdiff_tpu.utils.fixtures import targets_root
TARGETS_ROOT = targets_root()
FAMILIES = ("bpti", "apo", "codnas", "ped")
CLASH_BAR = 2 * 1.7 - 0.4  # reference _steric_clash default


def _bond_stats(ca):
    """ca: (M, L, 3) -> per-frame adjacent distances (M, L-1)."""
    return np.linalg.norm(np.diff(ca, axis=-2), axis=-1)


def _min_nonbonded(ca):
    """Per-frame minimum CA-CA distance over |i-j| >= 2 pairs."""
    M, L, _ = ca.shape
    d = np.linalg.norm(ca[:, :, None] - ca[:, None], axis=-1)
    mask = np.abs(np.arange(L)[:, None] - np.arange(L)[None]) >= 2
    return np.where(mask, d, np.inf).min((-1, -2))


def diagnose_ensemble(pred_ca, target_ca):
    adj_p = _bond_stats(pred_ca)
    thres = float(_bond_stats(target_ca[None]).max() + 1e-6)
    bond_fail_frac = float((adj_p >= thres).any(-1).mean())
    frac_bonds_out = float((adj_p >= thres).mean())
    mn = _min_nonbonded(pred_ca)
    clash_fail_frac = float((mn < CLASH_BAR).mean())
    q = np.quantile(adj_p, [0.05, 0.5, 0.95])
    return {
        "bond_threshold": round(thres, 3),
        "bond_fail_frame_frac": round(bond_fail_frac, 4),
        "bonds_outside_frac": round(frac_bonds_out, 4),
        "bond_q05": round(float(q[0]), 3),
        "bond_q50": round(float(q[1]), 3),
        "bond_q95": round(float(q[2]), 3),
        "clash_fail_frame_frac": round(clash_fail_frac, 4),
        "min_nonbonded_q50": round(float(np.median(mn)), 3),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("samples_root", type=Path)
    p.add_argument("--report", type=Path, default=None)
    args = p.parse_args(argv)

    from esmdiff_tpu.core.protein import load_ca_ensemble

    rows = []
    for fam in FAMILIES:
        fam_dir = args.samples_root / fam
        if not fam_dir.is_dir():
            continue
        for pred in sorted(fam_dir.glob("*.pdb")):
            target = TARGETS_ROOT / fam / f"{pred.stem}.pdb"
            try:
                pred_ca = load_ca_ensemble(pred)
                target_ca = load_ca_ensemble(target)[0]
                Lc = min(pred_ca.shape[1], len(target_ca))
                row = {"target": pred.stem, "family": fam,
                       **diagnose_ensemble(pred_ca[:, :Lc],
                                           target_ca[:Lc])}
            except Exception as e:  # keep the sweep alive per-target
                row = {"target": pred.stem, "family": fam, "error": str(e)}
            rows.append(row)
            print(row, flush=True)

    ok = [r for r in rows if "error" not in r]
    summary = {"per_target": rows}
    if ok:
        summary["aggregate"] = {
            "n_targets": len(ok),
            "bond_fail_frame_frac_mean": round(float(np.mean(
                [r["bond_fail_frame_frac"] for r in ok])), 4),
            "bonds_outside_frac_mean": round(float(np.mean(
                [r["bonds_outside_frac"] for r in ok])), 4),
            "bond_q50_mean": round(float(np.mean(
                [r["bond_q50"] for r in ok])), 3),
            "bond_q95_mean": round(float(np.mean(
                [r["bond_q95"] for r in ok])), 3),
            "clash_fail_frame_frac_mean": round(float(np.mean(
                [r["clash_fail_frame_frac"] for r in ok])), 4),
        }
        print(json.dumps(summary["aggregate"], indent=2))
    if args.report:
        args.report.write_text(json.dumps(summary, indent=2))
        print(f"[validity_diagnosis] -> {args.report}")


if __name__ == "__main__":
    main()
