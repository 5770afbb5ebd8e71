"""Benchmark analysis suites: BPTI, apo/holo + CoDNaS fold-switch, PED IDP.

Behavioral parity with the reference analysis CLIs:
  - bpti_evaluation / bpti_rmsd_clusters (analysis/bpti_analysis.py:33-209)
  - apo/codnas analyze (analysis/apo_analysis.py:211-380)
  - idp_evaluation (analysis/ped_analysis.py:17-118)

All heavy pair computations use the in-repo native TM-score library (batched
C++ entry point) instead of per-pair subprocess calls to the external
``TMscore`` binary.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from esmdiff_tpu.core.protein import load_ca_ensemble
from . import metrics
from .tmscore import tm_diversity, tm_score, tm_score_many


# ---------------------------------------------------------------------------
# BPTI
# ---------------------------------------------------------------------------

def bpti_evaluation(preds: dict[str, str | Path], target: str | Path,
                    output_dir: str | Path | None = None,
                    lagtime: int = 500, save_plot: bool = False) -> dict:
    """JS suite + validity for each prediction ensemble vs the reference
    trajectory (reference bpti_evaluation, bpti_analysis.py:33-104)."""
    d_coords = {}
    for name, path in preds.items():
        arr = load_ca_ensemble(path)
        d_coords[name] = arr[:100] if len(arr) > 100 else arr
    d_coords["target"] = load_ca_ensemble(target)

    js_t, d_tica = metrics.js_tica(d_coords, ref_key="target",
                                   lagtime=lagtime, return_tic=True)
    js_p = metrics.js_pwd(d_coords, ref_key="target")
    js_r = metrics.js_rg(d_coords, ref_key="target")
    val_clash = metrics.validity(d_coords)
    val_bond = metrics.bonding_validity(d_coords)

    names = [k for k in preds]
    results = {
        "name": names,
        "js_pwd": [js_p[k] for k in names],
        "js_tica": [js_t[k] for k in names],
        "js_rg": [js_r[k] for k in names],
        "val_clash": [val_clash[k] for k in names],
        "val_bond": [val_bond[k] for k in names],
    }
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        import csv

        with open(output_dir / "js_metrics.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(results.keys())
            w.writerows(zip(*results.values()))
        if save_plot:
            from .plots import scatterplot_2d

            scatterplot_2d(d_tica, output_dir / "tica2d_all.png")
    return results


def bpti_rmsd_clusters(preds: dict[str, str | Path],
                       clusters_dir: str | Path,
                       output_dir: str | Path | None = None) -> dict:
    """Best TM / best RMSD vs each kinetic cluster + TM diversity
    (reference bpti_rmsd_clusters, bpti_analysis.py:107-209)."""
    clusters_dir = Path(clusters_dir)
    cluster_files = sorted(clusters_dir.glob("*.pdb"))
    out = {}
    for name, path in preds.items():
        ens = load_ca_ensemble(path, max_n_model=100)
        best_tms, best_rmsds = [], []
        for cf in cluster_files:
            target = load_ca_ensemble(cf)[0]
            L = min(ens.shape[1], target.shape[0])
            tms, rmsds = tm_score_many(ens[:, :L], target[:L])
            best_tms.append(float(tms.max()))
            best_rmsds.append(float(rmsds.min()))
        div = tm_diversity(ens)
        out[name] = {
            "TM-ens": float(np.mean(best_tms)),
            "RMSD-ens": float(np.mean(best_rmsds)),
            "TM-div": div,
            "per_cluster_tm": best_tms,
            "per_cluster_rmsd": best_rmsds,
        }
    if output_dir is not None:
        import json

        Path(output_dir).mkdir(parents=True, exist_ok=True)
        (Path(output_dir) / "bpti_tm_rmsd_div.json").write_text(
            json.dumps(out, indent=2))
    return out


# ---------------------------------------------------------------------------
# apo/holo & CoDNaS
# ---------------------------------------------------------------------------

def _load_chain_with_seq(path, model: int = 0):
    """(CA coords with NaN where unresolved, one-letter sequence)."""
    from esmdiff_tpu.core import protein as protein_io
    from esmdiff_tpu.core import residue_constants as rc

    got = protein_io.from_pdb_file(path)
    prot = got[model] if isinstance(got, list) else got
    ca_i = rc.atom_order["CA"]
    ca = prot.atom_positions[:, ca_i].astype(np.float64).copy()
    ca[prot.atom_mask[:, ca_i] < 0.5] = np.nan
    return ca, prot.sequence


def apo_analyze(samples_dir: str | Path, pairs: list[dict],
                output_dir: str | Path | None = None,
                save_plot: bool = False) -> dict:
    """apo/holo (or CoDNaS) conformation-pair benchmark
    (reference analyze + main, apo_analysis.py:211-380).

    pairs: list of {"name": <sample/target stem>, "path1": apo pdb,
    "path2": holo pdb, "seqres": reference sequence (optional — falls back
    to path1's parsed sequence)}.  samples_dir holds per-target multi-MODEL
    PDBs named ``<name>.pdb`` (as written by the sampling CLIs).

    Every parsed chain is globally aligned to the reference sequence and its
    CAs are scattered into a NaN-masked reference-length frame (reference
    get_structures, apo_analysis.py:182-208) — internal gaps and numbering
    offsets cannot silently shift residues off-register; per-target gap
    counts are reported.  Computes TM-ens, TM-diversity vs TM-pair, and
    RMSD-vs-RMSF correlations.
    """
    from scipy.stats import kendalltau, pearsonr, spearmanr

    from .align import map_to_reference, nan_pair_deviation

    samples_dir = Path(samples_dir)
    rows = []
    rmsd_dict, rmsf_dict = {}, {}
    for pair in pairs:
        name = pair["name"]
        sample_path = samples_dir / f"{name}.pdb"
        if not sample_path.exists():
            print(f"[apo] missing samples for {name}, skip")
            continue
        ca1_raw, seq1 = _load_chain_with_seq(pair["path1"])
        ca2_raw, seq2 = _load_chain_with_seq(pair["path2"])
        seqres = pair.get("seqres") or seq1
        struct1 = map_to_reference(seqres, seq1, ca1_raw)
        struct2 = map_to_reference(seqres, seq2, ca2_raw)
        gaps1 = int(np.isnan(struct1[:, 0]).sum())
        gaps2 = int(np.isnan(struct2[:, 0]).sum())
        if gaps1 or gaps2:
            print(f"[apo] {name}: {gaps1}/{gaps2} gap positions "
                  f"(of {len(seqres)}) NaN-masked in pair structures")

        rmsd_dict[name] = nan_pair_deviation(struct1, struct2)

        # samples: map each model into the same reference frame
        from esmdiff_tpu.core import protein as protein_io

        got = protein_io.from_pdb_file(sample_path)
        models = got if isinstance(got, list) else [got]
        from esmdiff_tpu.core import residue_constants as rc

        ca_i = rc.atom_order["CA"]
        ens_list = []
        for m in models:
            ca = m.atom_positions[:, ca_i].astype(np.float64).copy()
            ca[m.atom_mask[:, ca_i] < 0.5] = np.nan
            ens_list.append(map_to_reference(seqres, m.sequence, ca))
        ens = np.stack(ens_list)

        # per-residue fluctuation across sampled pairs
        devs = []
        for j in range(len(ens)):
            for k in range(j + 1, len(ens)):
                devs.append(nan_pair_deviation(ens[j], ens[k]))
        rmsf_dict[name] = (
            np.sqrt(np.nanmean(np.square(devs), axis=0)) if devs
            else np.zeros(len(seqres)))

        # TM scores run on the finite intersection of each pair
        def _tm_many(ens_arr, target):
            ok_t = np.isfinite(target).all(-1)
            tms, rmsds = [], []
            for e in ens_arr:
                m = ok_t & np.isfinite(e).all(-1)
                t, r = tm_score(e[m], target[m])
                tms.append(t)
                rmsds.append(r)
            return np.asarray(tms), np.asarray(rmsds)

        tm1, _ = _tm_many(ens, struct1)
        tm2, _ = _tm_many(ens, struct2)
        m12 = np.isfinite(struct1).all(-1) & np.isfinite(struct2).all(-1)
        tm_fwd, _ = tm_score(struct1[m12], struct2[m12])
        tm_bwd, _ = tm_score(struct2[m12], struct1[m12])
        ok_all = np.isfinite(ens).all(axis=(0, 2))
        rows.append({
            "name": name,
            "tm1max": float(tm1.max()),
            "tm2max": float(tm2.max()),
            "tm_ens": float((tm1.max() + tm2.max()) / 2),
            "tm_pair": float((tm_fwd + tm_bwd) / 2),
            "tm_div": tm_diversity(np.ascontiguousarray(ens[:, ok_all])),
            "gaps": [gaps1, gaps2],
        })

    if not rows:
        return {"error": "no targets evaluated"}

    tm_ens = np.array([r["tm_ens"] for r in rows])
    tm_pair = np.array([r["tm_pair"] for r in rows])
    tm_div = np.array([r["tm_div"] for r in rows])

    per_target = {}
    for name in rmsd_dict:
        m = ~np.isnan(rmsd_dict[name]) & ~np.isnan(rmsf_dict[name])
        if m.sum() < 3 or np.std(rmsf_dict[name][m]) < 1e-9:
            continue
        per_target[name] = {
            "pearson": pearsonr(rmsd_dict[name][m], rmsf_dict[name][m])[0],
            "spearman": spearmanr(rmsd_dict[name][m],
                                  rmsf_dict[name][m]).correlation,
            "kendall": kendalltau(rmsd_dict[name][m],
                                  rmsf_dict[name][m]).correlation,
        }
    g_rmsd = np.concatenate(list(rmsd_dict.values()))
    g_rmsf = np.concatenate(list(rmsf_dict.values()))
    m = ~np.isnan(g_rmsd) & ~np.isnan(g_rmsf)

    pearsons = [v["pearson"] for v in per_target.values()]
    summary = {
        "tm_correlation": (
            float(pearsonr(tm_div, tm_pair)[0]) if len(rows) > 2 else None),
        "tm_ens_mean": float(np.mean(tm_ens)),
        "tm_ens_median": float(np.median(tm_ens)),
        "rmsd_global_correlation": (
            float(pearsonr(g_rmsd[m], g_rmsf[m])[0]) if m.sum() > 2 else None),
        "rmsd_per_target_pearson_mean": (
            float(np.mean(pearsons)) if pearsons else None),
        "rmsd_per_target_pearson_median": (
            float(np.median(pearsons)) if pearsons else None),
        "per_target": rows,
    }
    if output_dir is not None:
        import json

        Path(output_dir).mkdir(parents=True, exist_ok=True)
        (Path(output_dir) / "apo_metrics.json").write_text(
            json.dumps(summary, indent=2, default=float))
        if save_plot:
            from .plots import scatterplot_apo

            scatterplot_apo(tm_pair, tm_ens,
                            Path(output_dir) / "ens_scatter.png")
            scatterplot_apo(tm_pair, tm_div,
                            Path(output_dir) / "var_scatter.png",
                            ylabel="TM diversity", regplot=True)
    return summary


def load_pairs_csv(csv_path: str | Path, structures_dir: str | Path,
                   holo_col: str = "holo") -> list[dict]:
    """Reference splits CSV ('name', 'holo'|'other', 'seqres' columns;
    structures under <dir>/<name[:2]>/<name>, apo_analysis.py:222-234)."""
    import pandas as pd

    df = pd.read_csv(csv_path, index_col="name").sort_index()
    structures_dir = Path(structures_dir)
    col = holo_col if holo_col in df.columns else "other"
    pairs = []
    for name, row in df.iterrows():
        pairs.append({
            "name": Path(name).stem,
            "path1": structures_dir / name[:2] / name,
            "path2": structures_dir / row[col][:2] / row[col],
            "seqres": row.get("seqres"),
        })
    return pairs


# ---------------------------------------------------------------------------
# PED / IDP
# ---------------------------------------------------------------------------

def ped_evaluation(preds: dict[str, str | Path],
                   target_ensembles: list[str | Path]) -> dict:
    """IDP MAE metrics vs the concatenation of PED target ensembles
    (reference idp_evaluation, ped_analysis.py:17-46).  Targets of
    different chain lengths are truncated to the common minimum BEFORE
    concatenation (multi-target CLI invocations crashed on the ragged
    concat otherwise)."""
    targets = [load_ca_ensemble(t) for t in target_ensembles]
    pred_arrs = {name: load_ca_ensemble(path)
                 for name, path in preds.items()}
    L = min(min(t.shape[1] for t in targets),
            min(v.shape[1] for v in pred_arrs.values()))
    d_coords = {
        "target": np.concatenate([t[:, :L] for t in targets], axis=0)
    }
    d_coords.update({k: v[:, :L] for k, v in pred_arrs.items()})
    (mse_pwd, mse_rg, mse_contact,
     mae_pwd, mae_rg, mae_contact) = metrics.idp_metrics(d_coords)
    names = [k for k in preds]
    return {
        "name": names,
        "mae_pwd": [float(mae_pwd[k]) for k in names],
        "mae_rg": [float(mae_rg[k]) for k in names],
        "mae_contact": [float(mae_contact[k]) for k in names],
        "mse_pwd": [float(mse_pwd[k]) for k in names],
        "mse_rg": [float(mse_rg[k]) for k in names],
        "mse_contact": [float(mse_contact[k]) for k in names],
    }
