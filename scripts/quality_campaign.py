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

from esmdiff_tpu.utils.fixtures import targets_root
TARGETS_ROOT = targets_root()
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
    """Decoder geometry.  ``--objective ensemble`` (default) = the mid-scale
    d768/12L pair that won TM-ens in 3/4 families (campaign_aug);
    ``--objective fidelity`` = the capacity-down d256/6L/8h pair that holds
    the best decode floor measured on chip (12.54 vs 14.11 Å val CA-RMSD,
    PERF.md round-4 capacity-down campaign) — the two levers trade off at
    this corpus size, so the objective picks the default.  Explicit
    --dec_d_model/--dec_n_layers/--dec_n_heads override either.  Plain
    attribute access (argparse always defines these) so a renamed flag
    fails loudly instead of being swallowed by a getattr default."""
    from esmdiff_tpu.models.vqvae import DecoderConfig

    fidelity = args.objective == "fidelity"
    base = (256, 8, 6) if fidelity else (768, 12, 12)
    return DecoderConfig(
        d_model=args.dec_d_model or base[0],
        n_heads=args.dec_n_heads or base[1],
        n_layers=args.dec_n_layers or base[2],
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
    _write_holdout(root, args)


def _decoder_init(args):
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
    rs = np.random.RandomState(SEED)
    tr_idx, val_idx = _train_val_split(root, z["names"], rs)
    n_val = len(val_idx)

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
    rs = np.random.RandomState(SEED)
    tr_idx, val_idx = _train_val_split(root, z["names"], rs)

    ecfg, dcfg = encoder_cfg(), decoder_cfg(args)
    bbs_tr, lens_tr = bbs, lens
    if args.synth:
        # ENM decoys of TRAIN chains only (holdout untouched) — the data
        # lever on the 224-chain generalization floor (VERDICT r5 item 6);
        # train_vqvae trains on everything outside val_idx, so the expanded
        # tail joins the train pool automatically
        from esmdiff_tpu.train.conformers import synthesize_corpus

        bbs_tr, lens_tr, _ = synthesize_corpus(
            bbs, lens, tr_idx, args.synth, seed=SEED)
    t0 = time.time()
    res = train_vqvae(
        ecfg, dcfg, bbs_tr, lens_tr, steps=args.steps, batch=args.batch,
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
    holdout = campaign_holdout(root)   # eval targets never reach the MDLM
    enc_dir = root / "encodings"
    enc_dir.mkdir(exist_ok=True)
    st = SequenceTokenizer()
    n_written = n_held = 0
    for i in range(len(names)):
        if str(names[i]) in holdout:
            n_held += 1
            continue
        L = int(lens[i])
        seq_toks = st.encode(str(seqs[i]))            # (L+2,)
        struct = np.concatenate([
            [C.STRUCTURE_BOS_TOKEN], tokens[i, :L],
            [C.STRUCTURE_EOS_TOKEN]]).astype(np.int32)
        np.savez_compressed(enc_dir / f"{names[i]}.npz",
                            sequence_tokens=seq_toks.astype(np.int32),
                            structure_tokens=struct)
        n_written += 1
    print(f"[dump] {n_written} encodings -> {enc_dir} "
          f"({n_held} eval-holdout structures excluded)")


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


def pick_seen_targets(root, per_family, holdout: set):
    """Per-family TRAIN-set targets for the seen-vs-unseen comparison: the
    next-shortest structures after the holdout, so lengths are comparable."""
    z = np.load(root / "corpus.npz", allow_pickle=True)
    names, fams, lens = z["names"], z["families"], z["lengths"]
    chosen = []
    for fam in FAMILIES:
        idx = [i for i in range(len(names))
               if fams[i] == fam and str(names[i]) not in holdout]
        idx.sort(key=lambda i: int(lens[i]))
        chosen += [(str(names[i]), fam) for i in idx[:per_family]]
    return chosen


# ---------------------------------------------------------------------------
# train/eval decontamination (VERDICT round-4 weak #4 / next-round item 3):
# the eval targets are held out of BOTH VQ-VAE and MDLM training, frozen in
# holdout.json at prepare time so every later stage reads the same split.
# ---------------------------------------------------------------------------

def _write_holdout(root, args):
    if args.no_holdout:
        (root / "holdout.json").write_text(
            json.dumps({"names": [], "per_family": 0}))
        print("[prepare] --no_holdout: eval targets stay in training "
              "(legacy contaminated protocol, for comparison only)")
        return
    names = [t for t, _ in pick_eval_targets(root, args.per_family)]
    (root / "holdout.json").write_text(
        json.dumps({"names": names, "per_family": args.per_family},
                   indent=2))
    print(f"[prepare] holdout: {len(names)} eval targets excluded from "
          f"VQ-VAE and MDLM training")


def campaign_holdout(root) -> set:
    f = root / "holdout.json"
    if not f.exists():
        print("[holdout] WARNING: no holdout.json (pre-round-5 campaign "
              "dir) — training set includes the eval targets; quality "
              "numbers are on-train-set upper bounds")
        return set()
    return set(json.loads(f.read_text())["names"])


def _train_val_split(root, names, rs):
    """(tr_idx, val_idx) with the eval holdout excluded from training; the
    holdout doubles as the val set (it is exactly the set whose decode
    fidelity the campaign reports).  Falls back to the legacy random 5%
    split when no holdout exists."""
    N = len(names)
    holdout = campaign_holdout(root)
    hold_idx = np.array([i for i in range(N) if str(names[i]) in holdout],
                        dtype=int)
    if len(hold_idx) == 0:
        perm = rs.permutation(N)
        n_val = max(4, N // 20)
        return perm[n_val:], perm[:n_val]
    rest = np.setdiff1d(np.arange(N), hold_idx)
    return rs.permutation(rest), hold_idx


def _sample_target_set(args, targets, samples_root, stage_dir):
    """Run the production sampling CLI per family over a named target set.

    --skip_existing is only passed when the campaign explicitly opts in via
    --resume_samples: an unconditional skip silently reused STALE ensembles
    from a previous model after retraining (round-4 advisor finding)."""
    import shutil

    from esmdiff_tpu.cli.sample import main as sample_main

    root = out_root(args)
    for fam in FAMILIES:
        fam_targets = [t for t, f in targets if f == fam]
        if not fam_targets:
            continue
        in_dir = root / stage_dir / fam
        in_dir.mkdir(parents=True, exist_ok=True)
        for t in fam_targets:
            src = TARGETS_ROOT / fam / f"{t}.pdb"
            shutil.copy(src, in_dir / f"{t}.pdb")
        out_dir = samples_root / fam
        argv = [
            "--input", str(in_dir), "--output", str(out_dir),
            "--mode", "ddpm", "--num_steps", str(args.num_steps),
            "--num_samples", str(args.num_samples),
            "--ckpt", str(root / "mdlm_run" / "ckpt"),
            "--vqvae_ckpt", str(root / "vqvae"),
        ]
        if args.resume_samples:
            argv.append("--skip_existing")
        print(f"[sample] esmdiff-sample {' '.join(argv)}", flush=True)
        sample_main(argv)


def stage_sample(args):
    root = out_root(args)
    holdout = campaign_holdout(root)
    targets = pick_eval_targets(root, args.per_family)
    unseen = [t for t in targets if t[0] in holdout] if holdout else []
    print(f"[sample] {len(targets)} eval targets "
          f"({len(unseen)} held out of training): {[t for t, _ in targets]}")
    _sample_target_set(args, targets, root / "samples", "eval_targets")
    if holdout:
        # seen-vs-unseen side-by-side (VERDICT round-5 item 3): sample an
        # equal number of TRAIN-set targets under the identical protocol
        seen = pick_seen_targets(root, args.per_family, holdout)
        print(f"[sample] {len(seen)} seen (train-set) comparison targets: "
              f"{[t for t, _ in seen]}")
        _sample_target_set(args, seen, root / "samples_seen",
                           "seen_targets")


# ---------------------------------------------------------------------------
# stage: ab_heads — MDLM vs CLM vs JLM on the same held-out targets
# ---------------------------------------------------------------------------

def stage_ab_heads(args):
    """VERDICT round-5 item 7: the reference's core three-head comparison
    (slm/sample_hf.py:301-327) through this framework's production
    surfaces — CLM and JLM train on the SAME decontaminated encodings
    (conditioning embeddings from the campaign-trained trunk, standing in
    for the reference's pretrained ESM3, slm/models/utils.py:105-163),
    sample the SAME held-out targets with the SAME budget as the MDLM, and
    score through the same analyzer.  Writes report_ab.json."""
    import shutil

    import jax
    import jax.numpy as jnp

    from esmdiff_tpu.cli.sample_ar import main as sample_ar_main
    from esmdiff_tpu.convert.checkpoints import load_runtime
    from esmdiff_tpu.core import constants as C
    from esmdiff_tpu.core.tokenizer import SequenceTokenizer
    from esmdiff_tpu.train.config import load_config
    from esmdiff_tpu.train.loop import train as train_loop

    root = out_root(args)
    holdout = campaign_holdout(root)
    runtime = load_runtime(str(root / "mdlm_run" / "ckpt"),
                           vqvae_ckpt=str(root / "vqvae"))
    z = np.load(root / "corpus.npz", allow_pickle=True)
    tokens, lens = z["tokens"], z["lengths"]
    names, seqs = z["names"], z["sequences"]
    st = SequenceTokenizer()
    enc_dir = root / "encodings_ab"
    enc_dir.mkdir(exist_ok=True)
    fwd = jax.jit(lambda p, s: runtime.trunk.apply(
        {"params": p}, sequence_tokens=s))
    n_written = 0
    for i in range(len(names)):
        if str(names[i]) in holdout:
            continue
        L = int(lens[i])
        seq_toks = st.encode(str(seqs[i])).astype(np.int32)
        struct = np.concatenate([
            [C.STRUCTURE_BOS_TOKEN], tokens[i, :L],
            [C.STRUCTURE_EOS_TOKEN]]).astype(np.int32)
        emb = np.asarray(fwd(runtime.trunk_params,
                             jnp.asarray(seq_toks)[None]).embeddings[0],
                         np.float32)
        np.savez_compressed(enc_dir / f"{names[i]}.npz",
                            sequence_tokens=seq_toks,
                            structure_tokens=struct, embeddings=emb)
        n_written += 1
    print(f"[ab] {n_written} embedding encodings -> {enc_dir} "
          f"(holdout excluded)", flush=True)

    # mid-scale AR heads (from-scratch training on ~230 chains — modest
    # capacity; the reference fine-tunes pretrained HF nets instead)
    geo = {
        "clm": ["model.clm.d_model=512", "model.clm.d_ff=1024",
                "model.clm.n_layers=6", "model.clm.n_heads=8"],
        "jlm": ["model.jlm.n_embd=512", "model.jlm.n_layers=6",
                "model.jlm.n_heads=8"],
    }
    for task in ("clm", "jlm"):
        run_dir = root / f"{task}_run"
        overrides = geo[task] + [
            f"data.path={enc_dir}", f"data.batch_size={args.batch}",
            f"data.max_len={PAD_L + 2}", "data.with_embeddings=true",
            "data.bucket_multiple=64",
            "optim.lr=3e-4", "optim.warmup_steps=200",
            f"trainer.max_epochs={args.epochs}",
            "trainer.log_every_n_steps=50",
            "trainer.early_stopping_patience=40",
            f"trainer.ckpt_dir={run_dir}",
        ]
        cfg = load_config(f"configs/{task}.yaml", overrides)
        t0 = time.time()
        result = train_loop(cfg)
        print(f"[ab:{task}] best val loss {result['best_val_loss']:.4f} "
              f"after {result['steps']} steps ({time.time() - t0:.0f}s)",
              flush=True)

    targets = pick_eval_targets(root, args.per_family)
    for task in ("clm", "jlm"):
        run_dir = root / f"{task}_run"
        for fam in FAMILIES:
            fam_targets = [t for t, f in targets if f == fam]
            if not fam_targets:
                continue
            in_dir = root / "eval_targets" / fam
            in_dir.mkdir(parents=True, exist_ok=True)
            for t in fam_targets:
                shutil.copy(TARGETS_ROOT / fam / f"{t}.pdb",
                            in_dir / f"{t}.pdb")
            argv = [
                "--input", str(in_dir),
                "--output", str(root / "samples_ab" / task / fam),
                "--model_type", task,
                "--ckpt", str(run_dir / "ckpt"),
                "--config", str(run_dir / "config.yaml"),
                "--runtime_ckpt", str(root / "mdlm_run" / "ckpt"),
                "--vqvae_ckpt", str(root / "vqvae"),
                "--n_samples", str(args.num_samples),
            ]
            print(f"[ab:{task}] esmdiff-sample-ar {' '.join(argv)}",
                  flush=True)
            sample_ar_main(argv)

    report = {}
    for task in ("clm", "jlm"):
        rows = _score_ensemble_dirs(root / "samples_ab" / task, holdout,
                                    force_seen=False)
        report[task] = {"per_target": rows}
        ok = [r for r in rows if "error" not in r]
        for fam in FAMILIES:
            fr = [r for r in ok if r["family"] == fam]
            if fr:
                report[task][fam] = _family_aggregate(fr)
    main_rep = root / "report.json"
    if main_rep.exists():  # MDLM numbers on the identical targets
        mr = json.loads(main_rep.read_text())
        report["mdlm"] = {k: v for k, v in mr.items()
                          if k != "per_target" and not k.endswith("/seen")}
    (root / "report_ab.json").write_text(
        json.dumps(report, indent=2, default=float))
    summary = {h: {k: v.get("tm_ens_mean") for k, v in report[h].items()
                   if isinstance(v, dict) and "tm_ens_mean" in v}
               for h in report}
    print(json.dumps(summary, indent=2))
    print(f"[ab] -> {root / 'report_ab.json'}")


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
    _analyze_samples(root / "samples", root / "report.json",
                     holdout=campaign_holdout(root),
                     seen_root=root / "samples_seen")


def _score_ensemble_dirs(samples_root: Path, holdout, force_seen: bool):
    from esmdiff_tpu.core.protein import load_ca_ensemble
    from esmdiff_tpu.eval import metrics
    from esmdiff_tpu.eval.tmscore import tm_diversity, tm_ensemble

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
                # *_refined: the same ensemble after the jitted bond/clash
                # projection (ops/refine.py) — the raw columns stay the
                # honest decode-floor readout (VERDICT round-5 item 4)
                from esmdiff_tpu.ops.refine import refine_ca_ensemble

                ref_ca = refine_ca_ensemble(pred_ca)
                tm_ref, _ = tm_ensemble(ref_ca, target_ca)
                row.update({
                    "tm_ens_refined": round(tm_ref, 4),
                    "clash_validity_refined": float(
                        metrics.validity({"pred": ref_ca})["pred"]),
                    "bond_validity_refined": float(metrics.bonding_validity(
                        {"target": target_ca[None],
                         "pred": ref_ca})["pred"]),
                })
            except Exception as e:
                row = {"target": name, "family": fam, "error": str(e)}
            if holdout:  # train/eval contamination tag per row
                row["seen"] = bool(force_seen or name not in holdout)
            rows.append(row)
            print(row, flush=True)
    return rows


_AGG_KEYS = ("tm_ens", "tm_div", "clash_validity", "clash_validity_x1",
             "bond_validity", "tm_ens_refined", "clash_validity_refined",
             "bond_validity_refined")


def _family_aggregate(fr):
    agg = {"n_targets": len(fr)}
    for k in _AGG_KEYS:
        agg[f"{k}_mean"] = round(float(np.mean([r[k] for r in fr])), 4)
    return agg


def _analyze_samples(samples_root: Path, report_path: Path,
                     holdout: set | None = None,
                     seen_root: Path | None = None):
    from esmdiff_tpu.eval import analysis

    report = {}
    rows = _score_ensemble_dirs(samples_root, holdout, force_seen=False)
    if seen_root is not None and seen_root.is_dir():
        rows += _score_ensemble_dirs(seen_root, holdout, force_seen=True)
    report["per_target"] = rows
    ok = [r for r in rows if "error" not in r]
    for fam in FAMILIES:
        fr = [r for r in ok if r["family"] == fam]
        if not fr:
            continue
        if holdout:
            # seen-vs-unseen side by side: with a model diagnosed as
            # memorizing, on-train-set TM-ens is an upper bound, not
            # evidence (VERDICT round-4 weak #4)
            for tag, flag in (("unseen", False), ("seen", True)):
                sub = [r for r in fr if r.get("seen") is flag]
                if sub:
                    report[f"{fam}/{tag}"] = _family_aggregate(sub)
        else:
            report[fam] = _family_aggregate(fr)

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
    ]
    # resumable 282-target sweep — but only on explicit opt-in: a blanket
    # --skip_existing reused stale ensembles after retraining (advisor)
    if args.resume_samples:
        argv.append("--skip_existing")
    if args.quant != "none":
        argv += ["--quant", args.quant]
    print(f"[full_eval] {n_all} targets x {args.num_samples} "
          f"samples — esmdiff-sample {' '.join(argv)}", flush=True)
    sample_main(argv)
    walls["sample"] = round(_time.time() - t0, 1)
    print(f"[full_eval] sampling done in {walls['sample']}s", flush=True)
    _analyze_samples(out / "samples", out / "report.json",
                     holdout=campaign_holdout(root))
    walls["total"] = round(_time.time() - t0, 1)
    (out / "wall.json").write_text(json.dumps(walls, indent=2))
    print(f"[full_eval] total wall {walls['total']}s -> {out}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("stage", choices=["prepare", "train_decoder",
                                     "train_vqvae", "dump", "train_mdlm",
                                     "sample", "analyze", "ab_heads",
                                     "steps_quality", "full_eval", "all"])
    p.add_argument("--out", type=str, default="output/campaign")
    p.add_argument("--steps", type=int, default=12000,
                   help="decoder train steps")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--epochs", type=int, default=400,
                   help="MDLM max epochs (early stopping on val)")
    p.add_argument("--per_family", type=int, default=8,
                   help="eval targets per family for sample/analyze")
    p.add_argument("--objective", type=str, default="ensemble",
                   choices=["ensemble", "fidelity"],
                   help="default decoder geometry: 'ensemble' = d768/12L "
                        "(best TM-ens, campaign_aug); 'fidelity' = "
                        "d256/6L/8h capacity-down pair (best decode floor, "
                        "12.54 vs 14.11 A val CA-RMSD — PERF.md round-4 "
                        "capacity-down campaign)")
    p.add_argument("--resume_samples", action="store_true",
                   help="pass --skip_existing to esmdiff-sample so an "
                        "interrupted sweep resumes.  OFF by default: "
                        "resuming after RETRAINING silently reuses stale "
                        "ensembles from the previous model (round-4 "
                        "advisor finding)")
    p.add_argument("--no_holdout", action="store_true",
                   help="legacy contaminated protocol: keep the eval "
                        "targets in the VQ-VAE/MDLM training set (for "
                        "comparison only)")
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
    p.add_argument("--synth", type=int, default=0,
                   help="ENM decoy conformers per TRAIN chain for "
                        "train_vqvae (train/conformers.py) — scales the "
                        "coordinate corpus past the 224-chain data floor; "
                        "eval-holdout chains are never used")
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
