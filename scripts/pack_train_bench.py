"""Packed vs bucketed MDLM training throughput on a ragged corpus.

Measures what sequence-packed training (data.pack_len, train/data.py) is
worth on the real chip: both arms consume the SAME synthetic ragged corpus
(lognormal chain lengths, PDB-like) through the production batch
generators + jitted train step, and report wall time per epoch and valid
(non-pad) tokens/s.

Usage: python scripts/pack_train_bench.py [--size campaign|full]
           [--batch 16] [--pack_len 512] [--n_chains 256] [--epochs 3]
"""

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from esmdiff_tpu.utils.compilation_cache import enable

enable()


def make_corpus(root: Path, n: int, seed: int = 0, max_len: int = 510):
    """Synthetic ragged encodings: lognormal lengths (median ~190, clipped
    [20, max_len]) approximating a single-chain PDB length mixture."""
    rng = np.random.RandomState(seed)
    lens = np.clip(np.exp(rng.normal(5.25, 0.65, n)).astype(int), 20, max_len)
    from esmdiff_tpu.core import constants as C

    for i, L in enumerate(lens):
        np.savez(
            root / f"chain{i:05d}.npz",
            sequence_tokens=np.concatenate(
                [[C.SEQUENCE_BOS_TOKEN], rng.randint(4, 24, L),
                 [C.SEQUENCE_EOS_TOKEN]]).astype(np.int32),
            structure_tokens=np.concatenate(
                [[C.STRUCTURE_BOS_TOKEN], rng.randint(0, 4096, L),
                 [C.STRUCTURE_EOS_TOKEN]]).astype(np.int32),
        )
    return lens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="campaign",
                    choices=["tiny", "campaign", "full"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pack_len", type=int, default=512)
    ap.add_argument("--n_chains", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=3,
                    help="epoch 1 pays the compiles; report the best of the rest")
    args = ap.parse_args()

    from esmdiff_tpu.train import data as data_mod
    from esmdiff_tpu.train.config import load_config
    from esmdiff_tpu.train.loop import build_task
    from esmdiff_tpu.train.state import (create_train_state, make_optimizer,
                                         make_train_step)

    tmp = tempfile.mkdtemp(prefix="packbench_")
    lens = make_corpus(Path(tmp), args.n_chains)
    print(f"corpus: {args.n_chains} chains, lengths min/med/max "
          f"{lens.min()}/{int(np.median(lens))}/{lens.max()}, "
          f"{int(lens.sum())} residues")

    size_ov = {
        "tiny": ["model.size=tiny", "model.param_dtype=float32",
                 "model.remat=false"],
        "campaign": ["model.size=custom", "model.d_model=768",
                     "model.n_heads=12", "model.n_layers=16",
                     "model.v_heads=64", "model.param_dtype=float32"],
        "full": ["model.size=full", "model.param_dtype=bfloat16"],
    }[args.size]

    def run(tag: str, extra_ov):
        cfg = load_config(None, [
            f"data.path={tmp}", f"data.batch_size={args.batch}",
            "data.max_len=512", "data.train_val_split=1.0",
            "model.dtype=bfloat16", "model.remat=true",
            *size_ov, *extra_ov,
        ])
        loss_fn_t, init_fn = build_task(cfg)
        params = init_fn()
        opt = make_optimizer(lr=1e-5)
        step_fn = make_train_step(
            lambda p, b, k: loss_fn_t(p, b, k), opt)
        state = create_train_state(params, opt)
        ds = data_mod.EncodingDataset(cfg.data, training=True)
        split, _ = data_mod.train_val_split(ds, cfg.data)
        key = jax.random.PRNGKey(0)
        best = None
        for ep in range(args.epochs):
            t0 = time.time()
            n_tok = n_steps = 0
            losses = []
            for i, b in enumerate(data_mod.batches(
                    split, cfg.data, shuffle=True, seed=ep)):
                n_tok += int(b["mask"].sum())
                bj = {k2: jax.numpy.asarray(v) for k2, v in b.items()}
                state, metrics = step_fn(state, bj, jax.random.fold_in(key, i))
                n_steps += 1
                losses.append(metrics["loss"])
            loss = float(np.mean([float(jax.device_get(x)) for x in losses]))
            wall = time.time() - t0
            tps = n_tok / wall
            print(f"  [{tag}] epoch {ep}: {n_steps} steps, {n_tok} valid tok, "
                  f"{wall:.2f}s, {tps/1e3:.2f}k tok/s, mean loss {loss:.4f}",
                  flush=True)
            if ep > 0:
                best = max(best or 0.0, tps)
        return best

    bucketed = run("bucketed", ["data.pack_len=0"])
    packed = run("packed", [f"data.pack_len={args.pack_len}",
                            "data.pack_max_segments=24"])
    print(f"\nbucketed {bucketed/1e3:.2f}k tok/s | packed {packed/1e3:.2f}k "
          f"tok/s | speedup {packed/bucketed:.2f}x")


if __name__ == "__main__":
    main()
