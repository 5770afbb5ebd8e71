"""Mid-scale quality campaign over the full in-repo benchmark corpus.

VERDICT round 2 item 3: train a mid-size (~100M) VQ-VAE decoder + MDLM on
the 282 benchmark structures shipped with the reference
(data/targets/{bpti,apo,codnas,ped}), generate conformation ensembles with
the PRODUCTION CLIs, and run the analysis suites end-to-end, publishing the
tables.  No pretrained weights exist in this environment, so the campaign
is self-consistent (fixed random mid-size VQ encoder defines the token
space, decoder + MDLM trained from scratch); the claim is the machinery at
scale and real chip-hours, not reference-paper quality.

The reference snapshot ships neither the DESRES BPTI trajectory, the full
PED ensembles (single representative models only), nor the apo/codnas pair
CSVs (analysis/readme.md points at external downloads), so the evaluable
metrics here are: TM-ensemble (best sample-vs-target TM), TM-diversity,
clash/CA-bond validity, and the PED MAE suite vs the shipped structures.

Stages (run in order; each resumes from the previous stage's artifacts):

  python scripts/quality_campaign.py prepare        # corpus -> tokens
  python scripts/quality_campaign.py train_vqvae    # JOINT enc+codebook+dec
  # (legacy: train_decoder = decoder-only against the frozen random encoder)
  python scripts/quality_campaign.py dump           # MDLM training npzs
  python scripts/quality_campaign.py train_mdlm     # production esmdiff-train
  python scripts/quality_campaign.py sample         # production esmdiff-sample
  python scripts/quality_campaign.py analyze        # metrics tables
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TARGETS_ROOT = Path("/root/reference/data/targets")
FAMILIES = ("bpti", "apo", "codnas", "ped")
MAX_LEN = 318          # residues; padded to PAD_L with specials
PAD_L = 320            # single padded length -> one compile bucket
SEED = 0


def out_root(args) -> Path:
    return Path(args.out)


# ---------------------------------------------------------------------------
# geometries (mid-scale: between the tiny test configs and the 1.4B full)
# ---------------------------------------------------------------------------

def encoder_cfg():
    from esmdiff_tpu.models.vqvae import EncoderConfig

    return EncoderConfig(d_model=256, n_heads=4, v_heads=32, n_layers=2,
                         d_out=64, knn=16)


def decoder_cfg(args):
    """Decoder geometry.  Defaults to the mid-scale d768/12L; the round-4
    capacity experiment (PERF.md: at 224 train chains the d768/12L decoder
    memorizes — train-val recon gap 5.9 Å vs the round-3e d256/6L hedge's
    2.1 Å) overrides it via --dec_d_model/--dec_n_layers/--dec_n_heads.
    Plain attribute access (argparse always defines these) so a renamed
    flag fails loudly instead of being swallowed by a getattr default."""
    from esmdiff_tpu.models.vqvae import DecoderConfig

    return DecoderConfig(
        d_model=args.dec_d_model or 768,
        n_heads=args.dec_n_heads or 12,
        n_layers=args.dec_n_layers or 12,
        dtype="bfloat16", predict_ptm=False, remat=True)


def check_decoder_geometry(saved_dcfg, dcfg, stage):
    """Saved-checkpoint params must match the requested decoder geometry —
    otherwise flax apply fails with an opaque shape error deep in the run."""
    mismatch = [(f, getattr(saved_dcfg, f), getattr(dcfg, f))
                for f in ("d_model", "n_heads", "n_layers")
                if getattr(saved_dcfg, f) != getattr(dcfg, f)]
    if mismatch:
        raise SystemExit(
            f"[{stage}] decoder geometry overrides do not match the saved "
            f"vqvae checkpoint: {['%s saved=%s requested=%s' % m for m in mismatch]}. "
            "Re-run `prepare` with the same --dec_* overrides, or drop them "
            "to use the checkpoint's geometry.")


MDLM_OVERRIDES = [
    "model.size=custom", "model.d_model=768", "model.n_heads=12",
    "model.n_layers=16", "model.v_heads=64",
    "model.dtype=bfloat16", "model.param_dtype=float32",
]


# ---------------------------------------------------------------------------
# stage: prepare — load corpus, tokenize with the fixed encoder
# ---------------------------------------------------------------------------

def iter_corpus():
    """Yield (name, family, Protein) for every benchmark structure."""
    from esmdiff_tpu.core import protein as protein_io

    for fam in FAMILIES:
        for f in sorted((TARGETS_ROOT / fam).glob("*.pdb")):
            try:
                got = protein_io.from_pdb_file(f)
            except Exception as e:
                print(f"[corpus] skip {f.name}: {e}")
                continue
            prot = got[0] if isinstance(got, list) else got
            yield f.stem, fam, prot


def stage_prepare(args):
    import jax
    import jax.numpy as jnp

    from esmdiff_tpu.models.vqvae import StructureTokenEncoder

    root = out_root(args)
    root.mkdir(parents=True, exist_ok=True)
    ecfg = encoder_cfg()
    enc = StructureTokenEncoder(ecfg)
    bb0 = jnp.zeros((1, 8, 3, 3), jnp.float32)
    enc_params = jax.jit(lambda k: enc.init(k, bb0))(
        jax.random.PRNGKey(SEED))["params"]

    names, fams, seqs, bbs, lens = [], [], [], [], []
    for name, fam, prot in iter_corpus():
        L = len(prot.aatype)
        if L < 10 or L > MAX_LEN:
            print(f"[prepare] skip {name}: L={L}")
            continue
        bb = prot.backbone_coords()          # (L, 3, 3) NaN where missing
        names.append(name)
        fams.append(fam)
        seqs.append(prot.sequence)
        lens.append(L)
        pad = np.full((PAD_L, 3, 3), np.nan, np.float32)
        pad[:L] = bb
        bbs.append(pad)
    bbs = np.stack(bbs)                      # (N, PAD_L, 3, 3)
    print(f"[prepare] corpus: {len(names)} structures "
          f"({', '.join(f'{f}:{fams.count(f)}' for f in FAMILIES)})")

    # batch-encode (fixed random encoder = the frozen tokenizer)
    fwd = jax.jit(lambda p, bb: enc.apply({"params": p}, bb))
    toks = []
    BS = 16
    for i in range(0, len(bbs), BS):
        t, _, _ = fwd(enc_params, jnp.asarray(bbs[i:i + BS]))
        toks.append(np.asarray(t))
    tokens = np.concatenate(toks)            # (N, PAD_L) codes
    np.savez_compressed(
        root / "corpus.npz",
        tokens=tokens, backbones=bbs,
        lengths=np.asarray(lens, np.int32),
        names=np.asarray(names), families=np.asarray(fams),
        sequences=np.asarray(seqs))
    # persist the frozen encoder now; the decoder joins after training
    from esmdiff_tpu.convert.checkpoints import save_vqvae

    save_vqvae(root / "vqvae", ecfg, enc_params, decoder_cfg(args),
               _decoder_init(args))
    n_distinct = len(np.unique(
        np.concatenate([tokens[i, :l] for i, l in enumerate(lens)])))
    print(f"[prepare] {n_distinct} distinct codes in use "
          f"-> {root / 'corpus.npz'}")


def _decoder_init(args=None):
    import jax
    import jax.numpy as jnp

    from esmdiff_tpu.models.vqvae import StructureTokenDecoder

    dec = StructureTokenDecoder(decoder_cfg(args))
    return jax.jit(lambda k: dec.init(k, jnp.zeros((1, 16), jnp.int32)))(
        jax.random.PRNGKey(SEED + 1))["params"]


# ---------------------------------------------------------------------------
# stage: train_decoder — tokens -> backbone, rotation-invariant loss
# ---------------------------------------------------------------------------

def stage_train_decoder(args):
    import jax
    import jax.numpy as jnp
    import optax

    from esmdiff_tpu.convert.checkpoints import load_vqvae, save_vqvae
    from esmdiff_tpu.core import constants as C
    from esmdiff_tpu.models.vqvae import StructureTokenDecoder

    root = out_root(args)
    z = np.load(root / "corpus.npz", allow_pickle=True)
    tokens, bbs, lens = z["tokens"], z["backbones"], z["lengths"]
    N = len(tokens)
    n_val = max(4, N // 20)
    rs = np.random.RandomState(SEED)
    perm = rs.permutation(N)
    val_idx, tr_idx = perm[:n_val], perm[n_val:]

    dcfg = decoder_cfg(args)
    dec = StructureTokenDecoder(dcfg)
    ecfg, enc_params, saved_dcfg, dec_params = load_vqvae(root / "vqvae")
    check_decoder_geometry(saved_dcfg, dcfg, "train_decoder")

    # tokens with specials, padded rows -> PAD token; bb NaN -> masked loss
    def with_specials(tok_row, L):
        t = np.full((PAD_L + 2,), C.STRUCTURE_PAD_TOKEN, np.int32)
        t[0] = C.STRUCTURE_BOS_TOKEN
        t[1:L + 1] = tok_row[:L]
        t[L + 1] = C.STRUCTURE_EOS_TOKEN
        return t

    toks_sp = np.stack([with_specials(tokens[i], int(lens[i]))
                        for i in range(N)])
    bb_j = jnp.asarray(np.nan_to_num(bbs, nan=0.0))
    bb_mask = jnp.asarray(np.isfinite(bbs).all(-1).all(-1))   # (N, PAD_L)
    toks_j = jnp.asarray(toks_sp)

    # grad clip is load-bearing for the coordinate-space loss: a single bad
    # alignment (degenerate SVD frame early in training) otherwise produces
    # a divergence spike (observed: train 4.9 -> 200 at step 2000)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(args.lr, weight_decay=0.01))
    opt_state = opt.init(dec_params)

    # rotation/translation-invariant reconstruction losses, shared with the
    # joint trainer.  kabsch (aligned coordinate Huber) measured UNSTABLE
    # for decoder-only training here (diverged unclipped at step 2k,
    # oscillated 13-70 with clip 1.0); drmsd (CA pairwise distances + local
    # bonds + chirality) is the stable default.
    from esmdiff_tpu.train.vqvae import drmsd_loss, kabsch_huber_loss

    loss_impl = (kabsch_huber_loss if args.dec_loss == "kabsch"
                 else drmsd_loss)

    @jax.jit
    def step(p, s, idx):
        def loss_fn(p):
            out = dec.apply({"params": p}, toks_j[idx])
            pred = out["bb_pred"][:, 1:-1].astype(jnp.float32)
            return loss_impl(pred, bb_j[idx], bb_mask[idx].astype(
                jnp.float32))
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    @jax.jit
    def val_loss(p, idx):
        out = dec.apply({"params": p}, toks_j[idx])
        pred = out["bb_pred"][:, 1:-1].astype(jnp.float32)
        return loss_impl(pred, bb_j[idx], bb_mask[idx].astype(jnp.float32))

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(dec_params))
    print(f"[decoder] {n_params / 1e6:.1f}M params, {len(tr_idx)} train / "
          f"{n_val} val structures, {args.steps} steps @ B={args.batch}")
    t0 = time.time()
    best = float("inf")
    for it in range(args.steps):
        idx = jnp.asarray(rs.choice(tr_idx, args.batch))
        dec_params, opt_state, loss = step(dec_params, opt_state, idx)
        if it % 500 == 0 or it == args.steps - 1:
            vl = float(val_loss(dec_params, jnp.asarray(val_idx[:16])))
            best = min(best, vl)
            print(f"[decoder] step {it}: train {float(loss):.4f} "
                  f"val {vl:.4f} ({time.time() - t0:.0f}s)", flush=True)
    # save the FINAL decoder: the campaign decodes tokens of corpus
    # structures (and MDLM samples drawn from their token distribution), so
    # train-set inversion fidelity is the load-bearing quantity; held-out
    # val is reported for honesty (random-encoder tokens generalize poorly
    # from a 225-structure corpus — see ROUND3_NOTES caveats)
    save_vqvae(root / "vqvae", ecfg, enc_params, dcfg, dec_params)
    print(f"[decoder] done in {time.time() - t0:.0f}s, final train "
          f"{float(loss):.4f}, best val {best:.4f} -> {root / 'vqvae'}")

    # corpus reconstruction CA-RMSD (the decode-fidelity number that
    # matters for the campaign).  Params are a jit ARGUMENT — closing over
    # them bakes 89M constants into the HLO (PERF.md compile-time gotcha).
    @jax.jit
    def _recon(p, toks):
        out = dec.apply({"params": p}, toks)
        return out["bb_pred"][:, 1:-1].astype(jnp.float32)

    def recon(idx):
        return _recon(dec_params, toks_j[idx])

    from esmdiff_tpu.eval.geo import rmsd as kabsch_rmsd

    rmsds = []
    for i in list(tr_idx[:24]) + list(val_idx[:8]):
        L = int(lens[i])
        pred = np.asarray(recon(jnp.asarray([i])))[0, :L, 1]  # (L, 3) CA
        true = bbs[i, :L, 1]                                  # (L, 3) CA
        msk = np.isfinite(true).all(-1)
        if msk.sum() < 3:
            continue
        r = float(kabsch_rmsd(jnp.asarray(pred[msk]),
                              jnp.asarray(true[msk])))
        rmsds.append((r, "train" if i in tr_idx else "val"))
    tr_r = [r for r, s in rmsds if s == "train"]
    va_r = [r for r, s in rmsds if s == "val"]
    print(f"[decoder] recon CA-RMSD: train {np.mean(tr_r):.2f} A "
          f"(n={len(tr_r)}), val {np.mean(va_r):.2f} A (n={len(va_r)})")


# ---------------------------------------------------------------------------
# stage: train_vqvae — JOINT encoder+codebook+decoder training
# ---------------------------------------------------------------------------

def stage_train_vqvae(args):
    """Replace the frozen-random tokenizer with a jointly trained VQ-VAE
    (train/vqvae.py): straight-through codebook learning gives the decoder a
    token space that is actually informative about geometry, instead of the
    random-encoder floor (7.2 Å train recon in the round-3 decoder-only
    run).  Exports to the same ``vqvae`` checkpoint dir and RE-TOKENIZES
    corpus.npz with the trained encoder, so dump/train_mdlm/sample consume
    it unchanged."""
    import jax
    import jax.numpy as jnp

    from esmdiff_tpu.models.vqvae import (StructureTokenDecoder,
                                          StructureTokenEncoder)
    from esmdiff_tpu.train.vqvae import (VQAugmentConfig, VQLossConfig,
                                         export_vqvae, train_vqvae)

    root = out_root(args)
    z = np.load(root / "corpus.npz", allow_pickle=True)
    bbs, lens = z["backbones"], z["lengths"]
    N = len(lens)
    n_val = max(4, N // 20)
    rs = np.random.RandomState(SEED)
    perm = rs.permutation(N)
    val_idx, tr_idx = perm[:n_val], perm[n_val:]

    ecfg, dcfg = encoder_cfg(), decoder_cfg(args)
    t0 = time.time()
    res = train_vqvae(
        ecfg, dcfg, bbs, lens, steps=args.steps, batch=args.batch,
        lr=args.lr, loss_cfg=VQLossConfig(recon=args.dec_loss),
        seed=SEED, val_idx=val_idx, log_every=500,
        augment=VQAugmentConfig() if args.aug else None)
    print(f"[vqvae] trained in {time.time() - t0:.0f}s, "
          f"{res.n_live_codes}/{ecfg.n_codes} live codes")
    export_vqvae(root / "vqvae", ecfg, dcfg, res.params)

    # re-tokenize with the trained encoder (downstream stages read these)
    enc = StructureTokenEncoder(ecfg)
    fwd = jax.jit(lambda p, bb: enc.apply({"params": p}, bb))
    toks = []
    for i in range(0, N, 16):
        t, _, _ = fwd(res.params["encoder"], jnp.asarray(bbs[i:i + 16]))
        toks.append(np.asarray(t))
    tokens = np.concatenate(toks)
    data = {k: z[k] for k in z.files}
    data["tokens"] = tokens
    np.savez_compressed(root / "corpus.npz", **data)
    n_distinct = len(np.unique(np.concatenate(
        [tokens[i, :int(lens[i])] for i in range(N)])))
    print(f"[vqvae] re-tokenized corpus: {n_distinct} distinct codes")

    # decode-fidelity through the PRODUCTION path: exported standalone
    # encoder->decoder, tokens with specials, Kabsch CA-RMSD
    from esmdiff_tpu.core import constants as C
    from esmdiff_tpu.eval.geo import rmsd as kabsch_rmsd

    dec = StructureTokenDecoder(dcfg)
    from esmdiff_tpu.convert.checkpoints import load_vqvae

    _, _, saved_dcfg, dec_params = load_vqvae(root / "vqvae")
    check_decoder_geometry(saved_dcfg, dcfg, "train_vqvae")

    def with_specials(tok_row, L):
        t = np.full((PAD_L + 2,), C.STRUCTURE_PAD_TOKEN, np.int32)
        t[0] = C.STRUCTURE_BOS_TOKEN
        t[1:L + 1] = tok_row[:L]
        t[L + 1] = C.STRUCTURE_EOS_TOKEN
        return t

    @jax.jit
    def _recon(p, toks):
        out = dec.apply({"params": p}, toks, compute_ptm=False)
        return out["bb_pred"][:, 1:-1].astype(jnp.float32)

    rmsds = []
    for i in list(tr_idx[:24]) + list(val_idx[:8]):
        L = int(lens[i])
        toks_sp = with_specials(tokens[i], L)[None]
        pred = np.asarray(_recon(dec_params, jnp.asarray(toks_sp)))[0, :L, 1]
        true = bbs[i, :L, 1]
        msk = np.isfinite(true).all(-1)
        if msk.sum() < 3:
            continue
        r = float(kabsch_rmsd(jnp.asarray(pred[msk]),
                              jnp.asarray(true[msk])))
        rmsds.append((r, "train" if i in tr_idx else "val"))
    tr_r = [r for r, s in rmsds if s == "train"]
    va_r = [r for r, s in rmsds if s == "val"]
    print(f"[vqvae] recon CA-RMSD: train {np.mean(tr_r):.2f} A "
          f"(n={len(tr_r)}), val {np.mean(va_r):.2f} A (n={len(va_r)})")


# ---------------------------------------------------------------------------
# stage: dump — MDLM training npzs (sequence_tokens + structure_tokens)
# ---------------------------------------------------------------------------

def stage_dump(args):
    from esmdiff_tpu.core import constants as C
    from esmdiff_tpu.core.tokenizer import SequenceTokenizer

    root = out_root(args)
    z = np.load(root / "corpus.npz", allow_pickle=True)
    tokens, lens = z["tokens"], z["lengths"]
    names, seqs = z["names"], z["sequences"]
    enc_dir = root / "encodings"
    enc_dir.mkdir(exist_ok=True)
    st = SequenceTokenizer()
    for i in range(len(names)):
        L = int(lens[i])
        seq_toks = st.encode(str(seqs[i]))            # (L+2,)
        struct = np.concatenate([
            [C.STRUCTURE_BOS_TOKEN], tokens[i, :L],
            [C.STRUCTURE_EOS_TOKEN]]).astype(np.int32)
        np.savez_compressed(enc_dir / f"{names[i]}.npz",
                            sequence_tokens=seq_toks.astype(np.int32),
                            structure_tokens=struct)
    print(f"[dump] {len(names)} encodings -> {enc_dir}")


# ---------------------------------------------------------------------------
# stage: train_mdlm — the production trainer (esmdiff-train code path)
# ---------------------------------------------------------------------------

def stage_train_mdlm(args):
    from esmdiff_tpu.train.config import load_config
    from esmdiff_tpu.train.loop import train

    root = out_root(args)
    overrides = MDLM_OVERRIDES + [
        f"data.path={root / 'encodings'}",
        f"data.batch_size={args.batch}",
        f"data.max_len={PAD_L + 2}", "data.bucket_multiple=64",
        # packed training: exact parity (tests/test_pack_train.py), 1.64x
        # steady tokens/s and a single compiled shape (PERF.md round-3f)
        "data.pack_len=512",
        f"optim.lr={args.lr}", "optim.warmup_steps=200",
        f"trainer.max_epochs={args.epochs}",
        "trainer.log_every_n_steps=20",
        "trainer.early_stopping_patience=40",
        f"trainer.ckpt_dir={root / 'mdlm_run'}",
    ]
    cfg = load_config(None, overrides)
    result = train(cfg)
    print(f"[mdlm] best val loss {result['best_val_loss']:.4f} after "
          f"{result['steps']} steps")


# ---------------------------------------------------------------------------
# stage: sample — the production sampling CLI per target
# ---------------------------------------------------------------------------

def pick_eval_targets(root, per_family):
    z = np.load(root / "corpus.npz", allow_pickle=True)
    names, fams, lens = z["names"], z["families"], z["lengths"]
    chosen = []
    for fam in FAMILIES:
        idx = [i for i in range(len(names)) if fams[i] == fam]
        idx.sort(key=lambda i: int(lens[i]))   # shortest first: cheap + fair
        take = len(idx) if fam == "bpti" else min(per_family, len(idx))
        chosen += [(str(names[i]), fam) for i in idx[:take]]
    return chosen


def stage_sample(args):
    import shutil

    from esmdiff_tpu.cli.sample import main as sample_main

    root = out_root(args)
    targets = pick_eval_targets(root, args.per_family)
    print(f"[sample] {len(targets)} eval targets: "
          f"{[t for t, _ in targets]}")
    # stage the target PDBs into per-family dirs; run the CLI per family so
    # every target keeps its own name in the output dir
    for fam in FAMILIES:
        fam_targets = [t for t, f in targets if f == fam]
        if not fam_targets:
            continue
        in_dir = root / "eval_targets" / fam
        in_dir.mkdir(parents=True, exist_ok=True)
        for t in fam_targets:
            src = TARGETS_ROOT / fam / f"{t}.pdb"
            shutil.copy(src, in_dir / f"{t}.pdb")
        out_dir = root / "samples" / fam
        argv = [
            "--input", str(in_dir), "--output", str(out_dir),
            "--mode", "ddpm", "--num_steps", str(args.num_steps),
            "--num_samples", str(args.num_samples),
            "--ckpt", str(root / "mdlm_run" / "ckpt"),
            "--vqvae_ckpt", str(root / "vqvae"),
            "--skip_existing",  # resumable after a tunnel/driver restart
        ]
        print(f"[sample] esmdiff-sample {' '.join(argv)}", flush=True)
        sample_main(argv)


# ---------------------------------------------------------------------------
# stage: steps_quality — denoising-steps vs ensemble-quality tradeoff
# ---------------------------------------------------------------------------

def stage_steps_quality(args):
    """Sweep sampler mode x forward budget on the trained checkpoint and
    report TM-ens / TM-div / validity vs steps.  Round-2's EB evidence used
    an overfit tiny model (PERF.md caveat: flat entropy signal); this stage
    re-runs the comparison on the campaign-TRAINED MDLM + tokenizer through
    the production CLI."""
    import shutil
    import time as _time

    from esmdiff_tpu.cli.sample import main as sample_main
    from esmdiff_tpu.core.protein import load_ca_ensemble
    from esmdiff_tpu.eval import metrics
    from esmdiff_tpu.eval.tmscore import tm_diversity, tm_ensemble

    root = out_root(args)
    name, fam = pick_eval_targets(root, 1)[0]          # bpti
    in_dir = root / "steps_quality" / "target"
    in_dir.mkdir(parents=True, exist_ok=True)
    shutil.copy(TARGETS_ROOT / fam / f"{name}.pdb", in_dir / f"{name}.pdb")
    target_ca = load_ca_ensemble(TARGETS_ROOT / fam / f"{name}.pdb")[0]

    # eb's knob is the per-step entropy budget (nats), not a step count —
    # smaller budget = more, finer steps; num_steps only caps the scan.
    # Budgets must straddle the model's per-position entropy (up to
    # ln(4096) = 8.3 nats for an underfit model) — any budget below the
    # single-position minimum degenerates to one-token-per-step.
    grid = [("ddpm", s) for s in (2, 5, 10, 25)] + \
           [("gibbs", s) for s in (2, 4, 8, 16)] + \
           [("eb", b) for b in (128.0, 32.0, 8.0)]
    rows = []
    for mode, knob in grid:
        out_dir = root / "steps_quality" / f"{mode}_{knob}"
        argv = ["--input", str(in_dir), "--output", str(out_dir),
                "--mode", mode,
                "--num_samples", str(args.num_samples),
                "--ckpt", str(root / "mdlm_run" / "ckpt"),
                "--vqvae_ckpt", str(root / "vqvae")]
        if mode == "eb":
            argv += ["--entropy_budget", str(knob),
                     "--num_steps", "16"]
        else:
            argv += ["--num_steps", str(int(knob))]
        t0 = _time.time()
        try:
            sample_main(argv)
            pred_ca = load_ca_ensemble(out_dir / f"{name}.pdb")
            Lc = min(pred_ca.shape[1], len(target_ca))
            pred_ca, tgt = pred_ca[:, :Lc], target_ca[:Lc]
            tm_best, rmsd_best = tm_ensemble(pred_ca, tgt)
            row = {"mode": mode, "knob": knob,
                   "tm_ens": round(tm_best, 4),
                   "rmsd_best": round(rmsd_best, 3),
                   "tm_div": round(float(tm_diversity(pred_ca)), 4),
                   "clash_validity": float(
                       metrics.validity({"p": pred_ca})["p"]),
                   "wall_s": round(_time.time() - t0, 1)}
        except Exception as e:
            row = {"mode": mode, "knob": knob, "error": str(e)}
        rows.append(row)
        print(row, flush=True)
    (root / "steps_quality" / "report.json").write_text(
        json.dumps(rows, indent=2, default=float))
    print(f"[steps_quality] -> {root / 'steps_quality' / 'report.json'}")


# ---------------------------------------------------------------------------
# stage: analyze — metric tables over the generated ensembles
# ---------------------------------------------------------------------------

def stage_analyze(args):
    root = out_root(args)
    _analyze_samples(root / "samples", root / "report.json")


def _analyze_samples(samples_root: Path, report_path: Path):
    from esmdiff_tpu.core.protein import load_ca_ensemble
    from esmdiff_tpu.eval import analysis, metrics
    from esmdiff_tpu.eval.tmscore import tm_diversity, tm_ensemble

    report = {}
    rows = []
    for fam in FAMILIES:
        sample_dir = samples_root / fam
        if not sample_dir.is_dir():
            continue
        for pred in sorted(sample_dir.glob("*.pdb")):
            name = pred.stem
            target = TARGETS_ROOT / fam / f"{name}.pdb"
            try:
                pred_ca = load_ca_ensemble(pred)          # (M, L, 3)
                target_ca = load_ca_ensemble(target)[0]   # (L, 3)
                Lc = min(pred_ca.shape[1], len(target_ca))
                pred_ca, target_ca = pred_ca[:, :Lc], target_ca[:Lc]
                tm_best, rmsd_best = tm_ensemble(pred_ca, target_ca)
                d = {"target": target_ca[None], "pred": pred_ca}
                row = {
                    "target": name, "family": fam,
                    "n_samples": int(pred_ca.shape[0]),
                    "tm_ens": round(tm_best, 4),
                    "rmsd_best": round(rmsd_best, 3),
                    "tm_div": round(float(tm_diversity(pred_ca)), 4),
                    "clash_validity": float(
                        metrics.validity({"pred": pred_ca})["pred"]),
                    # bonded neighbors excluded: ground truth scores 1.0
                    # here where the reference default counts cis-peptides
                    # as clashes (tests/test_eval.py calibration)
                    "clash_validity_x1": float(
                        metrics.validity({"pred": pred_ca},
                                         k_exclusion=1)["pred"]),
                    "bond_validity": float(
                        metrics.bonding_validity(d)["pred"]),
                }
            except Exception as e:
                row = {"target": name, "family": fam, "error": str(e)}
            rows.append(row)
            print(row, flush=True)
    report["per_target"] = rows
    ok = [r for r in rows if "error" not in r]
    for fam in FAMILIES:
        fr = [r for r in ok if r["family"] == fam]
        if fr:
            report[fam] = {
                "n_targets": len(fr),
                "tm_ens_mean": round(float(np.mean(
                    [r["tm_ens"] for r in fr])), 4),
                "tm_div_mean": round(float(np.mean(
                    [r["tm_div"] for r in fr])), 4),
                "clash_validity_mean": round(float(np.mean(
                    [r["clash_validity"] for r in fr])), 4),
                "clash_validity_x1_mean": round(float(np.mean(
                    [r["clash_validity_x1"] for r in fr])), 4),
                "bond_validity_mean": round(float(np.mean(
                    [r["bond_validity"] for r in fr])), 4),
            }

    # PED MAE suite through the analysis module, per target (the shipped
    # PED files are single representative models)
    ped_dir = samples_root / "ped"
    if ped_dir.is_dir():
        ped_rows = []
        for p in sorted(ped_dir.glob("*.pdb")):
            try:
                r = analysis.ped_evaluation(
                    {p.stem: str(p)},
                    [TARGETS_ROOT / "ped" / f"{p.stem}.pdb"])
                ped_rows.append({"target": p.stem,
                                 "mae_pwd": r["mae_pwd"][0],
                                 "mae_rg": r["mae_rg"][0],
                                 "mae_contact": r["mae_contact"][0]})
            except Exception as e:
                ped_rows.append({"target": p.stem, "error": str(e)})
        report["ped_mae"] = ped_rows

    report_path.write_text(json.dumps(report, indent=2, default=float))
    print(json.dumps({k: v for k, v in report.items()
                      if k != "per_target"}, indent=2, default=float))
    print(f"[analyze] -> {report_path}")


# ---------------------------------------------------------------------------
# stage: full_eval — the reference-scale evaluation protocol
# ---------------------------------------------------------------------------

def stage_full_eval(args):
    """VERDICT round 3 item 2: ALL shipped benchmark targets (282 = bpti 1 +
    apo 90 + codnas 77 + ped 114 — the reference's full protocol,
    analysis/apo_analysis.py:211-380, ped_analysis.py:17-118,
    configs/predict.yaml:27-32) x ``--num_samples`` samples through the
    production esmdiff-sample, then the full analyze tables.  Targets the
    training corpus excluded (L>318, up to 478 residues) are still
    EVALUATED — rotary positions + the bucket ladder generalize to longer
    L; they are just outside the training distribution.  One process for
    the whole sweep so every (B, L) bucket compiles once."""
    import time as _time

    from esmdiff_tpu.cli.sample import main as sample_main

    root = out_root(args)
    out = root / "full_eval"
    t0 = _time.time()
    walls = {}
    n_all = sum(len(list((TARGETS_ROOT / fam).glob("*.pdb")))
                for fam in FAMILIES)
    # ONE sample_main call over all four family dirs: one runtime, one jit
    # cache — each (B, L) bucket compiles exactly once for the whole sweep
    # (multi --input writes each family to <output>/<family>/)
    argv = [
        "--input", *[str(TARGETS_ROOT / fam) for fam in FAMILIES],
        "--output", str(out / "samples"),
        "--mode", "ddpm", "--num_steps", str(args.num_steps),
        "--num_samples", str(args.num_samples),
        "--ckpt", str(root / "mdlm_run" / "ckpt"),
        "--vqvae_ckpt", str(root / "vqvae"),
        "--skip_existing",  # the 282-target sweep is resumable
    ]
    if args.quant != "none":
        argv += ["--quant", args.quant]
    print(f"[full_eval] {n_all} targets x {args.num_samples} "
          f"samples — esmdiff-sample {' '.join(argv)}", flush=True)
    sample_main(argv)
    walls["sample"] = round(_time.time() - t0, 1)
    print(f"[full_eval] sampling done in {walls['sample']}s", flush=True)
    _analyze_samples(out / "samples", out / "report.json")
    walls["total"] = round(_time.time() - t0, 1)
    (out / "wall.json").write_text(json.dumps(walls, indent=2))
    print(f"[full_eval] total wall {walls['total']}s -> {out}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("stage", choices=["prepare", "train_decoder",
                                     "train_vqvae", "dump", "train_mdlm",
                                     "sample", "analyze", "steps_quality",
                                     "full_eval", "all"])
    p.add_argument("--out", type=str, default="output/campaign")
    p.add_argument("--steps", type=int, default=12000,
                   help="decoder train steps")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--epochs", type=int, default=400,
                   help="MDLM max epochs (early stopping on val)")
    p.add_argument("--per_family", type=int, default=8,
                   help="eval targets per family for sample/analyze")
    p.add_argument("--num_samples", type=int, default=50)
    p.add_argument("--num_steps", type=int, default=25)
    p.add_argument("--dec_d_model", type=int, default=None,
                   help="decoder width override (default 768) — the round-4 "
                        "capacity experiment: smaller decoders memorize "
                        "less at 224 train chains (PERF.md)")
    p.add_argument("--dec_n_layers", type=int, default=None,
                   help="decoder depth override (default 12)")
    p.add_argument("--dec_n_heads", type=int, default=None,
                   help="decoder head-count override (default 12; must "
                        "divide --dec_d_model)")
    p.add_argument("--aug", action="store_true",
                   help="crop/jitter/rotation augmentation for train_vqvae "
                        "(train/vqvae.VQAugmentConfig defaults)")
    p.add_argument("--quant", type=str, default="none",
                   choices=["none", "int8"],
                   help="sampling quantization for full_eval (int8 parity "
                        "proven on trained-from-scratch weights, PERF.md)")
    p.add_argument("--dec_loss", type=str, default="drmsd",
                   choices=["drmsd", "kabsch"],
                   help="decoder loss.  drmsd (default) = CA pairwise "
                        "distances + local bonds + chirality (stable; 7.2 A "
                        "train recon on the campaign corpus).  kabsch = "
                        "aligned coordinate Huber — measured UNSTABLE here "
                        "(diverged unclipped at step 2k; oscillated 13-70 "
                        "with clip 1.0), kept for future work (PERF.md).")
    args = p.parse_args(argv)

    stages = ([args.stage] if args.stage != "all" else
              ["prepare", "train_vqvae", "dump", "train_mdlm", "sample",
               "analyze"])
    for s in stages:
        print(f"========== stage {s} ==========", flush=True)
        globals()[f"stage_{s}"](args)


if __name__ == "__main__":
    main()
