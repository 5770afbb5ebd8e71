"""Offline data pipeline: mmCIF corpus -> filtered per-chain pickles + metadata.

TPU-native equivalent of scripts/preprocess.py + filter_metadata.py
(reference :236-524 and :11-87): parse each mmCIF, split into chains, apply
resolution/length filters, write per-chain ``.npz`` (aatype, atom37
positions/mask, residue index, sequence) plus a ``metadata.csv``.  Typed
per-file error handling degrades gracefully (reference errors.py:2-24).
Multiprocessing fan-out mirrors the reference's mp.Pool
(preprocess.py:514-517).

The reference also computes DSSP secondary structure via mdtraj for curation
metadata (preprocess.py::compute_dssp_feats); here ``--with_dssp`` runs the
in-repo dependency-free Kabsch-Sander assigner
(core/secondary_structure.py) and records the 3-state string + helix/sheet/
coil fractions per chain.  (The training dump never consumes SS — the trunk
receives SS8 pad tokens, slm/models/net.py:415 — so it stays opt-in.)
"""

from __future__ import annotations

import argparse
import csv
import multiprocessing as mp
import string
from pathlib import Path

import numpy as np

# Chain-character -> integer map (reference scripts/preprocess.py:31-37);
# multi-char chain ids compose positionally (chain_str_to_int, :63-70).
ALPHANUMERIC = string.ascii_letters + string.digits + " "
CHAIN_TO_INT = {c: i for i, c in enumerate(ALPHANUMERIC)}


def chain_str_to_int(chain_str: str) -> int:
    out = 0
    for i, ch in enumerate(chain_str):
        out += CHAIN_TO_INT.get(ch, 0) + i * len(ALPHANUMERIC)
    return out


class DataProcessingError(Exception):
    """Base typed error for skip-and-log per-file handling."""


class FileExistsError_(DataProcessingError):
    pass


class ResolutionError(DataProcessingError):
    pass


class LengthError(DataProcessingError):
    pass


def _process_complex(obj, pdb_name, out_dir, min_len, max_len, with_dssp,
                     res, quaternary):
    """Merge all chains of one entry into a single training example
    (reference preprocess.py mode='complex', :400-426): per-residue
    ``chain_index`` via chain_str_to_int, concatenated atom37 features, and
    unmodeled (UNK) termini stripped (strip_feats_by_modeled_idx, :225-236).
    The dump stage inserts chainbreak tokens at chain transitions
    (api/protein_api.ESMProtein.from_npz)."""
    from esmdiff_tpu.core import residue_constants as rc

    items = sorted(obj.chains.items())
    aatype = np.concatenate([p.aatype for _, p in items])
    pos = np.concatenate([p.atom_positions for _, p in items])
    mask = np.concatenate([p.atom_mask for _, p in items])
    residx = np.concatenate([p.residue_index for _, p in items])
    # the reference's additive chain map is not injective for multi-char ids
    # ('AB' == 'BA'); chain boundaries are load-bearing downstream (from_npz
    # inserts chainbreaks at chain_index transitions), so fall back to
    # sequential ids when the entry's ids collide
    ids = [chain_str_to_int(cid) for cid, _ in items]
    if len(set(ids)) != len(ids):
        ids = list(range(len(items)))
    chain_index = np.concatenate([
        np.full((len(p.aatype),), ids[k], np.int32)
        for k, (_, p) in enumerate(items)])
    seq = "".join(p.sequence for _, p in items)
    raw_len = len(aatype)

    modeled = np.where(aatype != rc.unk_restype_index)[0]
    if len(modeled) == 0:
        return {"file": pdb_name, "status": "no_modeled_residues"}
    lo, hi = int(modeled.min()), int(modeled.max()) + 1
    aatype, pos, mask, residx, chain_index = (
        a[lo:hi] for a in (aatype, pos, mask, residx, chain_index))
    seq = seq[lo:hi]
    L = len(aatype)
    if L < min_len or L > max_len:
        return {"file": pdb_name, "status": f"length_filtered ({L})"}

    arrays = dict(
        aatype=aatype, atom_positions=pos, atom_mask=mask,
        residue_index=residx, chain_index=chain_index,
        sequence=np.array(seq),
    )
    ss_cols = {}
    if with_dssp:
        from esmdiff_tpu.core import protein as protein_io
        from esmdiff_tpu.core.secondary_structure import (
            assign_secondary_structure, ss_fractions)

        merged = protein_io.Protein(
            pos, mask, aatype, residx,
            np.zeros_like(mask))
        ss = assign_secondary_structure(merged)
        arrays["secondary_structure"] = np.array(ss)
        ss_cols = {"secondary_structure": ss, **{
            k: round(v, 4) for k, v in ss_fractions(ss).items()}}
    np.savez_compressed(Path(out_dir) / f"{pdb_name}.npz", **arrays)
    return {
        **ss_cols,
        "file": pdb_name, "status": "ok", "length": L,
        "resolution": res if res is not None else "",
        "method": obj.header.method,
        "release_date": obj.header.release_date,
        "pdb_name": pdb_name,
        "num_chains": len(obj.chains),
        "quaternary_category": quaternary,
        "oligomeric_detail": obj.header.oligomeric_detail,
        "raw_seq_len": raw_len,
        "modeled_seq_len": L,
    }


def process_one(args):
    path, out_dir, max_resolution, min_len, max_len, with_dssp, mode = args
    from esmdiff_tpu.core import mmcif

    rows = []
    try:
        obj = mmcif.parse_mmcif(path)
    except Exception as e:
        return [{"file": Path(path).name, "status": f"parse_error: {e}"}]
    res = obj.header.resolution
    if res is not None and (res < 0.01 or res > max_resolution):
        return [{"file": Path(path).name,
                 "status": f"resolution_filtered ({res})"}]
    # quaternary category from the polymer chain content (reference
    # computes this AlphaFold-style; consumed by filter_metadata.py:60-74)
    pdb_name = Path(path).stem.split(".")[0]
    seqs = {p.sequence for p in obj.chains.values()}
    quaternary = "homomer" if len(seqs) <= 1 else "heteromer"
    if mode == "complex":
        return [_process_complex(obj, pdb_name, out_dir, min_len, max_len,
                                 with_dssp, res, quaternary)]
    for cid, prot in obj.chains.items():
        L = len(prot.aatype)
        name = f"{pdb_name}_{cid}"
        if L < min_len or L > max_len:
            rows.append({"file": name, "status": f"length_filtered ({L})"})
            continue
        arrays = dict(
            aatype=prot.aatype,
            atom_positions=prot.atom_positions,
            atom_mask=prot.atom_mask,
            residue_index=prot.residue_index,
            sequence=np.array(prot.sequence),
        )
        ss_cols = {}
        if with_dssp:
            from esmdiff_tpu.core.secondary_structure import (
                assign_secondary_structure, ss_fractions)

            ss = assign_secondary_structure(prot)
            arrays["secondary_structure"] = np.array(ss)
            ss_cols = {"secondary_structure": ss, **{
                k: round(v, 4) for k, v in ss_fractions(ss).items()}}
        np.savez_compressed(Path(out_dir) / f"{name}.npz", **arrays)
        rows.append({
            **ss_cols,
            "file": name, "status": "ok", "length": L,
            "resolution": res if res is not None else "",
            "method": obj.header.method,
            "release_date": obj.header.release_date,
            "pdb_name": pdb_name,
            "num_chains": len(obj.chains),
            "quaternary_category": quaternary,
            "oligomeric_detail": obj.header.oligomeric_detail,
        })
    return rows


def filter_metadata(csv_path, output_csv=None, min_len: int = 10,
                    max_len: int = 1000, min_res: float = 0.01,
                    max_res: float = 5.0,
                    oligomeric: str = "monomeric") -> list[dict]:
    """Post-preprocess dataset curation (reference filter_metadata.py:11-87):
    length [10,1000], resolution [0.01,5.0], one chain per homomeric entry,
    and oligomeric_detail restricted to all-``monomeric`` assemblies.
    Returns the kept rows; writes them to ``output_csv`` when given."""
    with open(csv_path, newline="") as f:
        rows = [r for r in csv.DictReader(f) if r.get("status") == "ok"]
    n0 = len(rows)

    rows = [r for r in rows if min_len <= int(r["length"]) <= max_len]
    n1 = len(rows)
    rows = [
        r for r in rows
        if r.get("resolution") not in ("", None)
        and min_res <= float(r["resolution"]) <= max_res
    ]
    n2 = len(rows)

    # homomer dedup: keep every heteromer chain, but only the first chain of
    # each multi-chain homomeric pdb (reference filter_metadata.py:60-74)
    kept, seen_homomer = [], set()
    for r in rows:
        if (r.get("quaternary_category") == "homomer"
                and int(r.get("num_chains", 1) or 1) > 1):
            if r["pdb_name"] in seen_homomer:
                continue
            seen_homomer.add(r["pdb_name"])
        kept.append(r)
    rows = kept
    n3 = len(rows)

    if oligomeric:
        # allow "monomeric", "monomeric,monomeric", ... (reference :77-81)
        rows = [
            r for r in rows
            if r.get("oligomeric_detail")
            and set(r["oligomeric_detail"].split(",")) == {oligomeric}
        ]
    print(f"[filter] {n0} chains -> {n1} after length [{min_len},{max_len}] "
          f"-> {n2} after resolution [{min_res},{max_res}] "
          f"-> {n3} after homomer dedup -> {len(rows)} after "
          f"oligomeric_detail == {oligomeric!r}")
    if output_csv is not None and rows:
        with open(output_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Preprocess mmCIF corpus into per-chain npz + metadata.")
    p.add_argument("input_dir", type=str)
    p.add_argument("output_dir", type=str)
    p.add_argument("--max_resolution", type=float, default=5.0)
    p.add_argument("--min_len", type=int, default=10)
    p.add_argument("--max_len", type=int, default=1000)
    p.add_argument("--num_workers", type=int, default=1)
    p.add_argument("--filter_only", action="store_true",
                   help="input_dir is an existing metadata.csv: run only the "
                        "curation stage (reference filter_metadata.py) and "
                        "write filtered.csv next to it.")
    p.add_argument("--oligomeric", type=str, default="monomeric",
                   help="Keep only chains whose assemblies are all this "
                        "oligomeric_detail ('' disables; reference "
                        "filter_metadata.py:77-81).")
    p.add_argument("--mode", type=str, default="chain",
                   choices=["chain", "complex"],
                   help="'chain' = one example per chain (rounds 1-2 "
                        "behavior); 'complex' = merge all chains of an entry "
                        "into one example with per-residue chain_index and "
                        "unmodeled-termini stripping (the reference's "
                        "DEFAULT, scripts/preprocess.py:450,400-426).")
    p.add_argument("--with_dssp", action="store_true",
                   help="Record 3-state secondary structure + fractions per "
                        "chain (in-repo Kabsch-Sander, "
                        "core/secondary_structure.py; reference uses mdtraj "
                        "DSSP, preprocess.py:196).")
    args = p.parse_args(argv)

    if args.filter_only:
        csv_in = Path(args.input_dir)
        out_csv = Path(args.output_dir) / "filtered.csv"
        out_csv.parent.mkdir(parents=True, exist_ok=True)
        filter_metadata(csv_in, out_csv, min_len=args.min_len,
                        max_len=args.max_len, max_res=args.max_resolution,
                        oligomeric=args.oligomeric)
        return

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(
        list(Path(args.input_dir).glob("*.cif"))
        + list(Path(args.input_dir).glob("*.cif.gz"))
    )
    print(f"[preprocess] {len(files)} mmCIF files")
    work = [(str(f), str(out_dir), args.max_resolution, args.min_len,
             args.max_len, args.with_dssp, args.mode) for f in files]
    if args.num_workers > 1:
        with mp.Pool(args.num_workers) as pool:
            all_rows = pool.map(process_one, work)
    else:
        all_rows = [process_one(w) for w in work]
    rows = [r for rs in all_rows for r in rs]
    fields = ["file", "status", "length", "resolution", "method",
              "release_date", "pdb_name", "num_chains",
              "quaternary_category", "oligomeric_detail"]
    if args.mode == "complex":
        fields += ["raw_seq_len", "modeled_seq_len"]
    if args.with_dssp:
        fields += ["secondary_structure", "frac_helix", "frac_sheet",
                   "frac_coil"]
    with open(out_dir / "metadata.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        for r in rows:
            w.writerow({k: r.get(k, "") for k in fields})
    n_ok = sum(1 for r in rows if r["status"] == "ok")
    print(f"[preprocess] {n_ok} chains kept, "
          f"{len(rows) - n_ok} filtered/errored -> {out_dir}")


if __name__ == "__main__":
    main()
