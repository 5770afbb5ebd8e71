"""Offline data pipeline: mmCIF corpus -> filtered per-chain pickles + metadata.

TPU-native equivalent of scripts/preprocess.py + filter_metadata.py
(reference :236-524 and :11-87): parse each mmCIF, split into chains, apply
resolution/length filters, write per-chain ``.npz`` (aatype, atom37
positions/mask, residue index, sequence) plus a ``metadata.csv``.  Typed
per-file error handling degrades gracefully (reference errors.py:2-24).
Multiprocessing fan-out mirrors the reference's mp.Pool
(preprocess.py:514-517).

The reference also computes DSSP secondary structure via mdtraj for curation
metadata; this pipeline skips it (the training dump never consumes it — the
trunk receives SS8 pad tokens, slm/models/net.py:415).
"""

from __future__ import annotations

import argparse
import csv
import multiprocessing as mp
from pathlib import Path

import numpy as np


class DataProcessingError(Exception):
    """Base typed error for skip-and-log per-file handling."""


class FileExistsError_(DataProcessingError):
    pass


class ResolutionError(DataProcessingError):
    pass


class LengthError(DataProcessingError):
    pass


def process_one(args):
    path, out_dir, max_resolution, min_len, max_len = args
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
    for cid, prot in obj.chains.items():
        L = len(prot.aatype)
        name = f"{Path(path).stem.split('.')[0]}_{cid}"
        if L < min_len or L > max_len:
            rows.append({"file": name, "status": f"length_filtered ({L})"})
            continue
        np.savez_compressed(
            Path(out_dir) / f"{name}.npz",
            aatype=prot.aatype,
            atom_positions=prot.atom_positions,
            atom_mask=prot.atom_mask,
            residue_index=prot.residue_index,
            sequence=np.array(prot.sequence),
        )
        rows.append({
            "file": name, "status": "ok", "length": L,
            "resolution": res if res is not None else "",
            "method": obj.header.method,
            "release_date": obj.header.release_date,
        })
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
    args = p.parse_args(argv)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(
        list(Path(args.input_dir).glob("*.cif"))
        + list(Path(args.input_dir).glob("*.cif.gz"))
    )
    print(f"[preprocess] {len(files)} mmCIF files")
    work = [(str(f), str(out_dir), args.max_resolution, args.min_len,
             args.max_len) for f in files]
    if args.num_workers > 1:
        with mp.Pool(args.num_workers) as pool:
            all_rows = pool.map(process_one, work)
    else:
        all_rows = [process_one(w) for w in work]
    rows = [r for rs in all_rows for r in rs]
    fields = ["file", "status", "length", "resolution", "method",
              "release_date"]
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
