"""EB-sampler evidence: steps-vs-quality vs fixed-step ddpm/gibbs.

The entropy-bounded sampler (diffusion/gibbs.py::entropy_bounded_unmask_
sample) is a beyond-parity feature; this experiment justifies (or bounds) it
with data, per VERDICT.md #10:

  1. build a synthetic BPTI conformer ensemble (64 noisy copies),
  2. encode to structure tokens with a fixed tiny VQ encoder,
  3. overfit a tiny MDLM to the token distribution,
  4. sample with ddpm / gibbs / eb at several trunk-forward budgets,
  5. report mean per-position token-histogram JS divergence vs the target
     ensemble (token space — decoder-independent).

CPU-runnable in a few minutes:  JAX_PLATFORM_NAME=cpu python scripts/eb_quality.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_ENSEMBLE = 64
N_SAMPLES = 64
TRAIN_STEPS = 400
from esmdiff_tpu.utils.fixtures import bpti_pdb
BPTI = str(bpti_pdb())


def token_js(a: np.ndarray, b: np.ndarray, vocab: int = 4096) -> float:
    """Mean per-position Jensen-Shannon divergence (nats) of token
    histograms of two (N, L) ensembles."""
    assert a.shape[1] == b.shape[1]
    L = a.shape[1]
    out = []
    for i in range(L):
        ha = np.bincount(a[:, i], minlength=vocab) + 1e-10
        hb = np.bincount(b[:, i], minlength=vocab) + 1e-10
        pa, pb = ha / ha.sum(), hb / hb.sum()
        m = 0.5 * (pa + pb)
        kl = lambda p, q: float(np.sum(p * np.log(p / q)))
        out.append(0.5 * kl(pa, m) + 0.5 * kl(pb, m))
    return float(np.mean(out))


def main():
    from esmdiff_tpu.core import constants as C
    from esmdiff_tpu.core import protein as protein_io
    from esmdiff_tpu.api.protein_api import ESM3Runtime, ESMProtein
    from esmdiff_tpu.diffusion.gibbs import (
        entropy_bounded_unmask_sample, iterative_unmask_sample)
    from esmdiff_tpu.diffusion.mdlm import (
        MDLM, MDLMConfig, shield_special_tokens)
    from esmdiff_tpu.diffusion.noise import LogLinearNoise
    from esmdiff_tpu.models.esm3 import esm3_tiny
    from esmdiff_tpu.models.vqvae import DecoderConfig, EncoderConfig
    from esmdiff_tpu.nn.layers import TimestepEmbedder

    # 1-2: conformer ensemble -> structure tokens
    prot = protein_io.from_pdb_file(BPTI)
    prot = prot[0] if isinstance(prot, list) else prot
    rng = np.random.RandomState(0)
    runtime = ESM3Runtime.random_init(
        seed=0, trunk_cfg=esm3_tiny(dtype="float32", head_type="structure"),
        encoder_cfg=EncoderConfig(d_model=64, n_heads=2, v_heads=8,
                                  n_layers=2, d_out=16, knn=8),
        decoder_cfg=DecoderConfig(d_model=64, n_heads=2, n_layers=2,
                                  dtype="float32", scan_layers=False))
    seqs, toks = [], []
    for i in range(N_ENSEMBLE):
        bb = prot.backbone_coords() + rng.randn(
            *prot.backbone_coords().shape) * 0.5
        p = protein_io.from_backbone(bb, sequence=prot.sequence)
        pt = runtime.encode(ESMProtein(
            sequence=prot.sequence,
            coordinates=p.atom_positions + np.where(
                p.atom_mask[..., None] > 0.5, 0.0, np.nan)))
        toks.append(np.asarray(pt.structure))
        seqs.append(np.asarray(pt.sequence))
    tokens = np.stack(toks)      # (N, L+2) with BOS/EOS
    seq_row = seqs[0]
    target_interior = tokens[:, 1:-1]
    Lw = tokens.shape[1]
    print(f"[eb] encoded {N_ENSEMBLE} conformers, L+2={Lw}, "
          f"{len(np.unique(target_interior))} distinct tokens")

    # 3: overfit a tiny MDLM on the token ensemble
    from esmdiff_tpu.models.esm3 import ESM3

    trunk = runtime.trunk
    se = TimestepEmbedder(hidden_size=trunk.cfg.d_model, dtype=jnp.float32,
                          param_dtype=jnp.float32)
    mdlm = MDLM(trunk, se, noise=LogLinearNoise(), cfg=MDLMConfig())
    params = mdlm.init(jax.random.PRNGKey(1), batch_size=1, length=Lw)

    import optax

    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, key, batch_tokens, batch_seq):
        def loss_fn(p):
            batch = {
                "structure_tokens": batch_tokens,
                "sequence_tokens": batch_seq,
                "mask": (batch_seq != C.SEQUENCE_PAD_TOKEN).astype(
                    jnp.float32),
            }
            loss, _ = mdlm.loss(p, batch, key)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(2)
    seq_b = jnp.asarray(np.tile(seq_row[None], (16, 1)))
    for step in range(TRAIN_STEPS):
        key, k = jax.random.split(key)
        idx = rng.randint(0, N_ENSEMBLE, 16)
        params, opt_state, loss = train_step(
            params, opt_state, k, jnp.asarray(tokens[idx]), seq_b)
        if step % 100 == 0 or step == TRAIN_STEPS - 1:
            print(f"[eb] train step {step}: loss {float(loss):.3f}")

    # 4: samplers at several budgets
    B = N_SAMPLES
    seq_s = jnp.asarray(np.tile(seq_row[None], (B, 1)))
    lengths = jnp.sum(seq_s != C.SEQUENCE_PAD_TOKEN, -1, dtype=jnp.int32)
    init = np.full((B, Lw), C.STRUCTURE_MASK_TOKEN, np.int32)
    dmask = np.zeros((B, Lw), bool)
    dmask[:, 1:-1] = True

    def trunk_logits(p, x):
        out = trunk.apply({"params": p["net"]}, structure_tokens=x,
                          sequence_tokens=seq_s, lengths=lengths)
        return shield_special_tokens(
            out.structure_logits.astype(jnp.float32))

    rows = []

    for steps in (2, 5, 10, 25):
        fn = jax.jit(lambda p, k, _s=steps: mdlm.ddpm_sample(
            p, k, seq_s, num_steps=_s, lengths=lengths))
        s = np.asarray(fn(params, jax.random.PRNGKey(10 + steps)))[:, 1:-1]
        rows.append((f"ddpm[{steps}]", steps + 1,
                     token_js(s, target_interior)))

    for steps in (2, 4, 8, 16):
        fn = jax.jit(lambda p, k, _s=steps: iterative_unmask_sample(
            lambda x: trunk_logits(p, x), k, jnp.asarray(init),
            jnp.asarray(dmask), num_steps=_s, temperature=1.0, top_p=0.95))
        s = np.asarray(fn(params, jax.random.PRNGKey(30 + steps)))[:, 1:-1]
        rows.append((f"gibbs[{steps}]", steps, token_js(s, target_interior)))

    for budget in (16.0, 8.0, 4.0, 2.0, 1.0):
        fn = jax.jit(lambda p, k, _b=budget: entropy_bounded_unmask_sample(
            lambda x: trunk_logits(p, x), k, jnp.asarray(init),
            jnp.asarray(dmask), entropy_budget=_b, temperature=1.0,
            top_p=0.95, max_steps=64))
        s, n_steps = fn(params, jax.random.PRNGKey(50))
        s = np.asarray(s)[:, 1:-1]
        rows.append((f"eb[budget={budget}]", int(n_steps),
                     token_js(s, target_interior)))

    base_js = token_js(
        target_interior[: N_ENSEMBLE // 2], target_interior[N_ENSEMBLE // 2:])
    print(f"\nself-JS floor (target split-half): {base_js:.4f}\n")
    print(f"| method | trunk forwards | token JS (nats) |")
    print(f"|---|---|---|")
    for name, fwds, js in rows:
        print(f"| {name} | {fwds} | {js:.4f} |")


if __name__ == "__main__":
    main()
