"""AR (CLM/JLM) conformation sampling CLI.

TPU-native equivalent of the reference's ``slm/sample_hf.py`` (Hydra
predict.yaml): per-target PDB -> ESM3 embeddings on the fly -> KV-cached AR
decode of structure tokens (top-p/temperature) -> VQ-VAE decode -> merged
multi-MODEL PDB.  Model type is inferred from the checkpoint path substring
(reference :247-252) or set explicitly.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="AR structure-token sampling.")
    p.add_argument("--input", type=str, default="data/targets/bpti")
    p.add_argument("--output", type=str, default="output/inference_ar")
    p.add_argument("--model_type", type=str, default=None,
                   choices=[None, "clm", "jlm"],
                   help="Inferred from --ckpt path if omitted.")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--config", type=str, default=None,
                   help="Training experiment yaml (configs/clm.yaml etc.) "
                        "to rebuild the trained net geometry, OR a predict "
                        "yaml (configs/predict.yaml, reference "
                        "configs/predict.yaml) whose inference block sets "
                        "input/output/batch/n_samples/temperature/top_p "
                        "defaults; explicit CLI flags win.")
    p.add_argument("--n_samples", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_p", type=float, default=0.95)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model_scale", type=str, default="full",
                   choices=["full", "tiny"])
    p.add_argument("--runtime_ckpt", type=str, default=None,
                   help="Trained trunk checkpoint (orbax dir) providing the "
                        "conditioning embeddings — the reference uses "
                        "pretrained ESM3 for this (slm/sample_hf.py:38-87); "
                        "the quality campaign passes its trained MDLM run.")
    p.add_argument("--vqvae_ckpt", type=str, default=None,
                   help="Trained VQ-VAE dir for token decode (pairs with "
                        "--runtime_ckpt; campaign path).")
    p.add_argument("--quant", type=str, default="none",
                   choices=["none", "int8"],
                   help="int8 = W8A8 AR projections + heads (ops/quant.py); "
                        "the weight-bandwidth-bound decode step roughly "
                        "halves its HBM traffic (PERF.md)")
    args = p.parse_args(argv)

    train_cfg = None
    if args.config:
        from esmdiff_tpu.train.config import (is_predict_config, load_config,
                                              load_predict_config)

        if is_predict_config(args.config):
            pred = load_predict_config(args.config)
            # predict-config values replace argparse DEFAULTS only, so an
            # explicitly passed flag still wins (reference lets Hydra CLI
            # overrides beat predict.yaml the same way).
            inf = pred.inference
            for flag, val in (("input", inf.input), ("output", inf.output),
                              ("batch_size", inf.batch_size),
                              ("n_samples", inf.n_samples),
                              ("temperature", inf.temperature),
                              ("top_p", inf.top_p), ("seed", pred.seed),
                              ("ckpt", pred.ckpt_path),
                              ("model_type", pred.model_type)):
                if val is not None and getattr(args, flag) == p.get_default(flag):
                    setattr(args, flag, val)
            if pred.train_config:
                train_cfg = load_config(pred.train_config)
        else:
            train_cfg = load_config(args.config)
    model_type = args.model_type
    if model_type is None:
        if train_cfg is not None and train_cfg.task_name in ("clm", "jlm"):
            model_type = train_cfg.task_name
        elif args.ckpt and "clm" in args.ckpt.lower():
            model_type = "clm"
        elif args.ckpt and "jlm" in args.ckpt.lower():
            model_type = "jlm"
        else:
            model_type = "clm"

    import jax
    import jax.numpy as jnp

    from esmdiff_tpu.api.ar_generation import clm_generate, jlm_generate
    from esmdiff_tpu.api.protein_api import ESM3Runtime, ESMProtein
    from esmdiff_tpu.core import protein as protein_io
    from esmdiff_tpu.models.clm import CLM, CLMConfig
    from esmdiff_tpu.models.jlm import JLM, JLMConfig
    from esmdiff_tpu.models.esm3 import esm3_tiny
    from esmdiff_tpu.models.vqvae import DecoderConfig, EncoderConfig

    # runtime (embeddings + VQ decode)
    if args.runtime_ckpt or args.vqvae_ckpt:
        if not args.runtime_ckpt:
            raise SystemExit("--vqvae_ckpt needs --runtime_ckpt (the trunk "
                             "providing conditioning embeddings)")
        from esmdiff_tpu.convert.checkpoints import load_runtime

        runtime = load_runtime(args.runtime_ckpt,
                               vqvae_ckpt=args.vqvae_ckpt)
        cond_dim = runtime.trunk.cfg.d_model
        ar_kw, jlm_kw = {}, {}
    elif args.model_scale == "tiny":
        runtime = ESM3Runtime.random_init(
            seed=args.seed, trunk_cfg=esm3_tiny(dtype="float32"),
            encoder_cfg=EncoderConfig(d_model=64, n_heads=2, v_heads=8,
                                      n_layers=2, d_out=16, knn=8),
            decoder_cfg=DecoderConfig(d_model=64, n_heads=2, n_layers=2,
                                      dtype="float32", scan_layers=False),
            with_sigma_embedder=False)
        cond_dim = runtime.trunk.cfg.d_model
        ar_kw = dict(d_model=64, d_ff=128, n_layers=2, n_heads=4,
                     dtype="float32")
        jlm_kw = dict(n_embd=64, n_layers=2, n_heads=4, dtype="float32",
                      struct_embed_dim=32)
    else:
        runtime = ESM3Runtime.random_init(seed=args.seed,
                                          with_sigma_embedder=False)
        cond_dim = runtime.trunk.cfg.d_model
        ar_kw, jlm_kw = {}, {}

    if train_cfg is not None:
        from esmdiff_tpu.train.loop import build_clm, build_jlm

        model = build_clm(train_cfg) if model_type == "clm" \
            else build_jlm(train_cfg)
    elif model_type == "clm":
        model = CLM(CLMConfig(cond_dim=cond_dim, **ar_kw))
    else:
        model = JLM(JLMConfig(cond_dim=cond_dim, **jlm_kw))

    # params: converted ckpt or random
    key = jax.random.PRNGKey(args.seed)
    dummy_emb = jnp.zeros((1, 8, cond_dim), jnp.float32)
    if model_type == "clm":
        dummy_lab = jnp.zeros((1, 8), jnp.int32)
        params = model.init(key, dummy_emb, dummy_lab)["params"]
    else:
        params = model.init(key, dummy_emb,
                            jnp.zeros((1, 8), jnp.int32))["params"]
    if args.ckpt:
        from esmdiff_tpu.convert.checkpoints import load_ar_params
        params = load_ar_params(args.ckpt, params)
    if args.quant == "int8":
        import dataclasses

        if model_type == "clm":
            from esmdiff_tpu.models.clm import quantize_clm_params

            model = CLM(dataclasses.replace(model.cfg, quant="int8"))
            params = jax.jit(quantize_clm_params)(params)
        else:
            from esmdiff_tpu.models.jlm import quantize_jlm_params

            model = JLM(dataclasses.replace(model.cfg, quant="int8"))
            params = jax.jit(quantize_jlm_params)(params)
        print(f"[quant] {model_type} projections running W8A8 int8")

    _fwd = jax.jit(lambda p, seq: runtime.trunk.apply(
        {"params": p}, sequence_tokens=seq))
    trunk_fwd = lambda seq: _fwd(runtime.trunk_params, seq)

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    targets = sorted(Path(args.input).glob("*.pdb"))
    for path in targets:
        prot = ESMProtein.from_pdb(path)
        seq = prot.sequence
        pt = runtime.encode(prot)
        emb = np.asarray(
            trunk_fwd(jnp.asarray(pt.sequence)[None]).embeddings[0],
            dtype=np.float32)  # (L+2, D)
        L = len(seq) + 2
        t0 = time.time()
        all_tokens = []
        left = args.n_samples
        bi = 0
        while left > 0:
            B = min(args.batch_size, left)
            emb_b = jnp.asarray(np.tile(emb[None], (B, 1, 1)))
            k = jax.random.fold_in(jax.random.PRNGKey(args.seed), bi)
            if model_type == "clm":
                toks = clm_generate(model, params, emb_b, L,
                                    args.temperature, args.top_p, key=k)
            else:
                toks = jlm_generate(model, params, emb_b, L,
                                    args.temperature, args.top_p, key=k)
            all_tokens.append(np.asarray(toks))
            left -= B
            bi += 1
        tokens = np.concatenate(all_tokens, axis=0)[:, 1:-1]  # strip BOS/EOS
        t_tok = time.time() - t0

        from esmdiff_tpu.api.generation import decode_tokens_to_proteins
        prots = decode_tokens_to_proteins(runtime, seq, tokens)
        out_file = out_dir / f"{path.stem}.pdb"
        protein_io.ensemble_to_pdb_file(
            [pp.to_protein() for pp in prots], out_file)
        print(f"[{path.stem}] {model_type} {args.n_samples} samples: "
              f"tokens {t_tok:.2f}s, total {time.time()-t0:.2f}s "
              f"-> {out_file}")


if __name__ == "__main__":
    main()
