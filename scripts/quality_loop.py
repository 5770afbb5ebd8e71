"""End-to-end coordinate-level quality loop on a tiny self-contained testbed.

Extends scripts/eb_quality.py (token-space JS) to the FULL scientific loop of
the reference experiments — train -> sample -> decode -> ensemble metrics —
with every stage running in this framework:

  1. target ensemble: BPTI backbone + low-rank collective modes (structured
     diversity, not iid noise, so pairwise-distance statistics are meaningful)
  2. tokenize with a FIXED random tiny VQ encoder (the reference's encoder is
     likewise frozen at inference)
  3. TRAIN the tiny VQ decoder to invert tokens -> backbone (MSE on centered
     coords); reconstruction CA-RMSD is reported so decode fidelity is known
  4. TRAIN a tiny MDLM on the token ensemble (NELBO, diffusion/mdlm.py)
  5. sample (ddpm 25-step / gibbs 8-step) -> decode -> eval/metrics:
     JS-PwD, JS-Rg, clash validity, CA-bond validity vs the target ensemble,
     against the target's own split-half floor

CPU-runnable:  JAX_PLATFORM_NAME=cpu python scripts/quality_loop.py
Writes output/quality_loop/report.json and prints a markdown table.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_ENSEMBLE = 64
N_SAMPLES = 64
MDLM_STEPS = 500
DEC_STEPS = 1500
from esmdiff_tpu.utils.fixtures import bpti_pdb
BPTI = str(bpti_pdb())


def make_target_ensemble(bb, rng, n=N_ENSEMBLE, n_modes=5, amp=1.2,
                         noise=0.15):
    """(L, 3, 3) backbone -> (n, L, 3, 3): low-rank smooth collective modes
    + small iid noise.  Modes are random walks smoothed along the chain so
    displacements are spatially correlated (hinge/breathing-like)."""
    L = bb.shape[0]
    modes = rng.randn(n_modes, L + 20, 3)
    kernel = np.hanning(21)[:, None]
    modes = np.stack([
        np.stack([np.convolve(m[:, d], kernel[:, 0], mode="valid")
                  for d in range(3)], -1)
        for m in modes
    ])                                   # (n_modes, L, 3), smooth
    modes /= np.linalg.norm(modes, axis=(1, 2), keepdims=True) / L ** 0.5
    coeff = rng.randn(n, n_modes) * amp
    disp = np.einsum("nm,mld->nld", coeff, modes)[:, :, None, :]
    return bb[None] + disp + rng.randn(n, L, 3, 3) * noise


def kabsch_rmsd_ca(a, b):
    """CA RMSD after optimal alignment; a, b (L, 3) — the repo's
    oracle-tested Kabsch stack (eval/geo.py, tests/test_geo_oracle.py)."""
    from esmdiff_tpu.eval import geo

    return float(np.asarray(geo.rmsd(a, b)))


def main():
    from esmdiff_tpu.core import constants as C
    from esmdiff_tpu.core import protein as protein_io
    from esmdiff_tpu.api.protein_api import ESM3Runtime, ESMProtein
    from esmdiff_tpu.diffusion.gibbs import iterative_unmask_sample
    from esmdiff_tpu.diffusion.mdlm import (
        MDLM, MDLMConfig, shield_special_tokens)
    from esmdiff_tpu.diffusion.noise import LogLinearNoise
    from esmdiff_tpu.eval import metrics as M
    from esmdiff_tpu.models.esm3 import esm3_tiny
    from esmdiff_tpu.models.vqvae import (
        DecoderConfig, EncoderConfig, StructureTokenDecoder)
    from esmdiff_tpu.core.tokenizer import StructureTokenizer
    from esmdiff_tpu.nn.layers import TimestepEmbedder

    import optax

    rng = np.random.RandomState(0)
    prot = protein_io.from_pdb_file(BPTI)
    prot = prot[0] if isinstance(prot, list) else prot
    bb = prot.backbone_coords()                       # (L, 3, 3) N/CA/C
    L = bb.shape[0]

    # -- 1: target ensemble --------------------------------------------------
    ens = make_target_ensemble(bb, rng)               # (N, L, 3, 3)
    ens -= ens[:, :, 1:2, :].mean(1, keepdims=True)   # center on CA centroid
    target_ca = ens[:, :, 1, :]

    # -- 2: tokenize with a fixed random encoder -----------------------------
    runtime = ESM3Runtime.random_init(
        seed=0, trunk_cfg=esm3_tiny(dtype="float32", head_type="structure"),
        encoder_cfg=EncoderConfig(d_model=64, n_heads=2, v_heads=8,
                                  n_layers=2, d_out=16, knn=8),
        decoder_cfg=DecoderConfig(d_model=64, n_heads=2, n_layers=2,
                                  dtype="float32", scan_layers=False))
    toks, seqs = [], []
    for i in range(N_ENSEMBLE):
        p = protein_io.from_backbone(ens[i], sequence=prot.sequence)
        pt = runtime.encode(ESMProtein(
            sequence=prot.sequence,
            coordinates=p.atom_positions + np.where(
                p.atom_mask[..., None] > 0.5, 0.0, np.nan)))
        toks.append(np.asarray(pt.structure))
        seqs.append(np.asarray(pt.sequence))
    tokens = np.stack(toks)                           # (N, L+2) with specials
    seq_row = seqs[0]
    Lw = tokens.shape[1]
    n_distinct = len(np.unique(tokens[:, 1:-1]))
    print(f"[ql] encoded {N_ENSEMBLE} conformers, L={L}, "
          f"{n_distinct} distinct tokens")

    # -- 3: train the decoder to invert tokens -> backbone -------------------
    dec = StructureTokenDecoder(DecoderConfig(
        d_model=96, n_heads=4, n_layers=3, dtype="float32",
        scan_layers=False, predict_ptm=False))
    dec_params = jax.jit(lambda k: dec.init(
        k, jnp.zeros((1, Lw), jnp.int32)))(jax.random.PRNGKey(3))["params"]
    dopt = optax.adamw(1e-3)
    dopt_state = dopt.init(dec_params)
    ens_j = jnp.asarray(ens, jnp.float32)
    tokens_j = jnp.asarray(tokens)

    @jax.jit
    def dec_step(p, s, idx):
        def loss_fn(p):
            out = dec.apply({"params": p}, tokens_j[idx])
            pred = out["bb_pred"][:, 1:-1]            # strip BOS/EOS rows
            return jnp.mean((pred - ens_j[idx]) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = dopt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    for step in range(DEC_STEPS):
        idx = jnp.asarray(rng.randint(0, N_ENSEMBLE, 16))
        dec_params, dopt_state, dloss = dec_step(dec_params, dopt_state, idx)
        if step % 300 == 0 or step == DEC_STEPS - 1:
            print(f"[ql] decoder step {step}: mse {float(dloss):.4f}")

    def decode(tok_batch):
        out = dec.apply({"params": dec_params}, jnp.asarray(tok_batch))
        return np.asarray(out["bb_pred"][:, 1:-1])    # (B, L, 3, 3)

    recon = decode(tokens)
    recon_rmsd = float(np.mean([
        kabsch_rmsd_ca(recon[i, :, 1], ens[i, :, 1])
        for i in range(N_ENSEMBLE)]))
    print(f"[ql] decoder reconstruction CA-RMSD: {recon_rmsd:.3f} A")

    # -- 4: train a tiny MDLM on the token ensemble --------------------------
    trunk = runtime.trunk
    se = TimestepEmbedder(hidden_size=trunk.cfg.d_model, dtype=jnp.float32,
                          param_dtype=jnp.float32)
    mdlm = MDLM(trunk, se, noise=LogLinearNoise(), cfg=MDLMConfig())
    params = mdlm.init(jax.random.PRNGKey(1), batch_size=1, length=Lw)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    seq_b = jnp.asarray(np.tile(seq_row[None], (16, 1)))

    @jax.jit
    def train_step(params, opt_state, key, batch_tokens):
        def loss_fn(p):
            batch = {
                "structure_tokens": batch_tokens,
                "sequence_tokens": seq_b,
                "mask": (seq_b != C.SEQUENCE_PAD_TOKEN).astype(jnp.float32),
            }
            loss, _ = mdlm.loss(p, batch, key)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(2)
    for step in range(MDLM_STEPS):
        key, k = jax.random.split(key)
        idx = rng.randint(0, N_ENSEMBLE, 16)
        params, opt_state, loss = train_step(params, opt_state, k,
                                             jnp.asarray(tokens[idx]))
        if step % 100 == 0 or step == MDLM_STEPS - 1:
            print(f"[ql] mdlm step {step}: nelbo {float(loss):.3f}")

    # -- 5: sample -> decode -> ensemble metrics -----------------------------
    B = N_SAMPLES
    seq_s = jnp.asarray(np.tile(seq_row[None], (B, 1)))
    lengths = jnp.sum(seq_s != C.SEQUENCE_PAD_TOKEN, -1, dtype=jnp.int32)

    sampled = {}
    fn = jax.jit(lambda p, k: mdlm.ddpm_sample(p, k, seq_s, num_steps=25,
                                               lengths=lengths))
    sampled["ddpm[25]"] = np.asarray(fn(params, jax.random.PRNGKey(11)))

    init = np.full((B, Lw), C.STRUCTURE_MASK_TOKEN, np.int32)
    dmask = np.zeros((B, Lw), bool)
    dmask[:, 1:-1] = True

    def trunk_logits(p, x):
        out = trunk.apply({"params": p["net"]}, structure_tokens=x,
                          sequence_tokens=seq_s, lengths=lengths)
        return shield_special_tokens(out.structure_logits.astype(jnp.float32))

    gfn = jax.jit(lambda p, k: iterative_unmask_sample(
        lambda x: trunk_logits(p, x), k, jnp.asarray(init),
        jnp.asarray(dmask), num_steps=8, temperature=1.0, top_p=0.95))
    sampled["gibbs[8]"] = np.asarray(gfn(params, jax.random.PRNGKey(12)))

    ca = {"target": target_ca}
    extra = {}
    for name, tok in sampled.items():
        wrapped = np.stack([StructureTokenizer.add_bos_eos(
            tok[i, 1:-1].astype(np.int32)) for i in range(B)])
        bbs = decode(wrapped)
        ca[name] = bbs[:, :, 1, :]
    # split-half floor of the target itself
    ca_floor = {"target": target_ca[:N_ENSEMBLE // 2],
                "half2": target_ca[N_ENSEMBLE // 2:]}

    js_pwd = M.js_pwd(ca)
    js_rg = M.js_rg(ca)
    val = M.validity(ca)
    bond = M.bonding_validity(ca)
    floor_pwd = M.js_pwd(ca_floor)["half2"]
    floor_rg = M.js_rg(ca_floor)["half2"]

    rows = []
    for name in sampled:
        rows.append({
            "method": name,
            "js_pwd": float(js_pwd[name]), "js_rg": float(js_rg[name]),
            "clash_validity": float(val[name]),
            "bond_validity": float(bond[name]),
        })
    report = {
        "n_ensemble": N_ENSEMBLE, "n_samples": N_SAMPLES, "L": int(L),
        "n_distinct_tokens": int(n_distinct),
        "decoder_recon_ca_rmsd": recon_rmsd,
        "floor": {"js_pwd": float(floor_pwd), "js_rg": float(floor_rg)},
        "target_validity": {"clash": float(val["target"]),
                            "bond": float(bond["target"])},
        "rows": rows,
    }
    out_dir = os.path.join("output", "quality_loop")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)

    print(f"\ndecoder recon CA-RMSD {recon_rmsd:.3f} A; split-half floor: "
          f"JS-PwD {floor_pwd:.4f}, JS-Rg {floor_rg:.4f}\n")
    print("| method | JS-PwD | JS-Rg | clash-valid | bond-valid |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['method']} | {r['js_pwd']:.4f} | {r['js_rg']:.4f} | "
              f"{r['clash_validity']:.2f} | {r['bond_validity']:.2f} |")
    print(f"| target (self) | {floor_pwd:.4f} | {floor_rg:.4f} | "
          f"{val['target']:.2f} | {bond['target']:.2f} |")


if __name__ == "__main__":
    main()
