"""Encoding dump: corpus of PDB chains -> .npz training encodings.

TPU-native equivalent of scripts/dump.py (reference :60-110): run every chain
through the VQ-VAE structure encoder (+ optionally the trunk for embeddings,
needed by CLM/JLM) and save per-chain arrays:
  sequence_tokens (L+2,), structure_tokens (L+2,), [embeddings (L+2, D)],
  sequence (str), coordinates (L, 37, 3).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="Dump ESM3 encodings for training.")
    p.add_argument("input_dir", type=str,
                   help="Directory of per-chain .pdb files and/or .npz "
                        "chains from cli/preprocess (the reference dump's "
                        "pdb/pkl input modes, scripts/dump.py:82-98).")
    p.add_argument("output_dir", type=str)
    p.add_argument("--ckpt", type=str, default=None,
                   help="Converted/orbax runtime checkpoint; None = random "
                        "weights (dev only).")
    p.add_argument("--with_embeddings", action="store_true",
                   help="Also run the trunk and store per-residue embeddings "
                        "(needed for CLM/JLM training).")
    p.add_argument("--model_scale", type=str, default="full",
                   choices=["full", "tiny"])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from esmdiff_tpu.api.protein_api import ESM3Runtime, ESMProtein
    from esmdiff_tpu.models.esm3 import esm3_tiny
    from esmdiff_tpu.models.vqvae import DecoderConfig, EncoderConfig

    if args.ckpt:
        from esmdiff_tpu.convert.checkpoints import load_runtime
        runtime = load_runtime(args.ckpt)
    elif args.model_scale == "tiny":
        runtime = ESM3Runtime.random_init(
            seed=args.seed, trunk_cfg=esm3_tiny(dtype="float32"),
            encoder_cfg=EncoderConfig(d_model=64, n_heads=2, v_heads=8,
                                      n_layers=2, d_out=16, knn=8),
            decoder_cfg=DecoderConfig(d_model=64, n_heads=2, n_layers=2,
                                      dtype="float32", scan_layers=False))
    else:
        runtime = ESM3Runtime.random_init(seed=args.seed)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(Path(args.input_dir).glob("*.pdb")) + sorted(
        Path(args.input_dir).glob("*.npz"))
    print(f"[dump] {len(files)} chains -> {out_dir}")

    trunk_fwd = None
    if args.with_embeddings:
        # params as a jit argument (closing over them bakes weights into the
        # HLO as constants — see PERF.md)
        _fwd = jax.jit(lambda p, seq: runtime.trunk.apply(
            {"params": p}, sequence_tokens=seq))
        trunk_fwd = lambda seq: _fwd(runtime.trunk_params, seq)

    n_ok = 0
    for f in files:
        try:
            prot = (ESMProtein.from_npz(f) if f.suffix == ".npz"
                    else ESMProtein.from_pdb(f))
            pt = runtime.encode(prot)
            arrays = {
                "sequence_tokens": pt.sequence.astype(np.int32),
                "structure_tokens": pt.structure.astype(np.int32),
            }
            if prot.coordinates is not None:
                arrays["coordinates"] = np.nan_to_num(
                    prot.coordinates, nan=np.nan).astype(np.float32)
            if trunk_fwd is not None:
                out = trunk_fwd(jnp.asarray(pt.sequence)[None])
                arrays["embeddings"] = np.asarray(
                    out.embeddings[0], dtype=np.float32)
            np.savez_compressed(out_dir / f"{f.stem}.npz", **arrays)
            n_ok += 1
        except Exception as e:  # per-file degradation (reference preprocess)
            print(f"[dump] skip {f.name}: {e}")
    print(f"[dump] wrote {n_ok}/{len(files)} encodings")


if __name__ == "__main__":
    main()
