"""Checkpoint loading for inference runtimes.

The TPU analogue of the reference's ``load_state_dict_from_lightning_ckpt`` /
``load_hf_network_checkpoint`` (slm/utils/checkpoint_utils.py:7-75), covering:

  1. this framework's own training runs — an orbax checkpoint dir written by
     utils/checkpoint.CheckpointManager, with the run's ``config.yaml``
     alongside (mirrors the reference's rebuild-from-.hydra/config.yaml);
  2. converted PyTorch files (.pt/.ckpt: plain, Lightning ``state_dict``, or
     DeepSpeed ``module`` layouts) for the trunk.

The VQ-VAE encoder/decoder have no in-repo pretrained source; they are
random-initialized unless a converted dump is supplied via ``vqvae_ckpt``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax


def _is_orbax_dir(path: Path) -> bool:
    return path.is_dir()


def save_vqvae(out_dir, encoder_cfg, encoder_params,
               decoder_cfg, decoder_params) -> None:
    """Persist a (trained) VQ-VAE pair: orbax params + geometry json.  The
    campaign-trained mid-size decoder loads back through
    ``load_runtime(..., vqvae_ckpt=...)`` / ``--vqvae_ckpt``."""
    import dataclasses
    import json

    import orbax.checkpoint as ocp

    out = Path(out_dir).absolute()
    out.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out / "params", jax.device_get(
        {"encoder": encoder_params, "decoder": decoder_params}), force=True)
    ckptr.wait_until_finished()
    (out / "vqvae.json").write_text(json.dumps({
        "encoder_cfg": dataclasses.asdict(encoder_cfg),
        "decoder_cfg": dataclasses.asdict(decoder_cfg),
    }, indent=2))


def load_vqvae(ckpt_dir):
    """-> (encoder_cfg, encoder_params, decoder_cfg, decoder_params)."""
    import json

    import orbax.checkpoint as ocp

    from esmdiff_tpu.models.vqvae import DecoderConfig, EncoderConfig

    path = Path(ckpt_dir).absolute()
    meta = json.loads((path / "vqvae.json").read_text())
    params = ocp.StandardCheckpointer().restore(path / "params")
    return (EncoderConfig(**meta["encoder_cfg"]), params["encoder"],
            DecoderConfig(**meta["decoder_cfg"]), params["decoder"])


def load_runtime(ckpt_path: str, vqvae_ckpt: Optional[str] = None,
                 trunk_cfg=None, **runtime_kwargs):
    """Build an ESM3Runtime for sampling from a checkpoint path."""
    from esmdiff_tpu.api.protein_api import ESM3Runtime
    from esmdiff_tpu.models.esm3 import ESM3Config

    path = Path(ckpt_path)
    if _is_orbax_dir(path):
        return _load_runtime_from_orbax(path, vqvae_ckpt=vqvae_ckpt)

    # torch file: pretrained/fine-tuned trunk weights
    from .torch_to_jax import convert_trunk, load_torch_state_dict, strip_prefix

    if vqvae_ckpt:
        enc_cfg, enc_params, dec_cfg, dec_params = load_vqvae(vqvae_ckpt)
        runtime = ESM3Runtime.random_init(
            trunk_cfg=trunk_cfg or ESM3Config(head_type="structure"),
            encoder_cfg=enc_cfg, decoder_cfg=dec_cfg, **runtime_kwargs)
        runtime.encoder_params = enc_params
        runtime.decoder_params = dec_params
        print(f"[load_runtime] trained VQ-VAE from {vqvae_ckpt}")
    else:
        runtime = ESM3Runtime.random_init(
            trunk_cfg=trunk_cfg or ESM3Config(head_type="structure"),
            **runtime_kwargs)
    sd = load_torch_state_dict(str(path))
    if any(k.startswith("net.") for k in sd):
        sd = strip_prefix(sd, "net.")
    runtime.trunk_params, report = convert_trunk(
        runtime.trunk_params, sd, runtime.trunk.cfg, strict=False)
    print(f"[load_runtime] converted trunk from {path} "
          f"({len(report['missing'])} missing, "
          f"{len(report['unmapped'])} unmapped)")
    return runtime


def _load_runtime_from_orbax(path: Path, vqvae_ckpt: Optional[str] = None):
    """Restore a runtime from a training-run checkpoint directory.

    Accepts either the ckpt dir (picks the best entry from index.json) or a
    specific step_N dir.  Rebuilds the model from the run's config.yaml.
    ``vqvae_ckpt`` = a save_vqvae dir pairing the trunk with TRAINED
    encoder/decoder weights (the quality-campaign path).
    """
    import json

    import orbax.checkpoint as ocp

    from esmdiff_tpu.api.protein_api import ESM3Runtime
    from esmdiff_tpu.train.config import load_config
    from esmdiff_tpu.train.loop import build_mdlm
    from esmdiff_tpu.train import state as tstate

    if (path / "index.json").exists():
        index = json.loads((path / "index.json").read_text())
        step_dir = Path(index[0]["path"])
        run_dir = path.parent
    else:
        step_dir = path
        run_dir = path.parent.parent
    cfg_file = run_dir / "config.yaml"
    if not cfg_file.exists():
        raise FileNotFoundError(
            f"config.yaml not found beside checkpoint: {cfg_file}")
    cfg = load_config(str(cfg_file))

    mdlm = build_mdlm(cfg)
    params = mdlm.init(jax.random.PRNGKey(0))
    # the optimizer SPEC must match training exactly — grad_clip adds a
    # chain stage, changing the opt_state tree orbax restores into
    optimizer = tstate.make_optimizer(
        lr=cfg.optim.lr, weight_decay=cfg.optim.weight_decay,
        warmup_steps=cfg.optim.warmup_steps, grad_clip=cfg.optim.grad_clip)
    target = tstate.create_train_state(params, optimizer)
    state = ocp.StandardCheckpointer().restore(
        step_dir.absolute(), jax.device_get(target))

    if vqvae_ckpt:
        # every component has restored weights — construct the runtime
        # directly instead of random_init-ing params that are immediately
        # overwritten (throwaway full-geometry init compiles)
        from esmdiff_tpu.models.vqvae import (
            StructureTokenDecoder, StructureTokenEncoder)

        enc_cfg, enc_params, dec_cfg, dec_params = load_vqvae(vqvae_ckpt)
        runtime = ESM3Runtime(
            trunk=mdlm.net, trunk_params=state.params["net"],
            encoder=StructureTokenEncoder(enc_cfg),
            encoder_params=enc_params,
            decoder=StructureTokenDecoder(dec_cfg),
            decoder_params=dec_params,
            sigma_embedder=mdlm.sigma_embedder,
            sigma_params=state.params["sigma_embedder"])
        print(f"[load_runtime] trained VQ-VAE from {vqvae_ckpt}; "
              f"restored train state from {step_dir}")
        return runtime
    if cfg.model.size == "tiny":
        from esmdiff_tpu.models.vqvae import DecoderConfig, EncoderConfig

        runtime = ESM3Runtime.random_init(
            trunk_cfg=mdlm.net.cfg,
            encoder_cfg=EncoderConfig(d_model=64, n_heads=2, v_heads=8,
                                      n_layers=2, d_out=16, knn=8),
            decoder_cfg=DecoderConfig(d_model=64, n_heads=2, n_layers=2,
                                      dtype="float32", scan_layers=False))
    else:
        runtime = ESM3Runtime.random_init(trunk_cfg=mdlm.net.cfg)
    runtime.trunk_params = state.params["net"]
    runtime.sigma_params = state.params["sigma_embedder"]
    print(f"[load_runtime] restored train state from {step_dir}")
    return runtime


def load_ar_params(ckpt_path: str, template_params,
                   model_type: str = "clm", n_layers: int = 12):
    """Restore CLM/JLM params from an orbax dir (this framework's runs) or
    convert an HF torch checkpoint (convert/ar_rules.py)."""
    import orbax.checkpoint as ocp

    path = Path(ckpt_path)
    if path.is_dir():
        # orbax dir: either bare params or a full TrainState from a
        # train-loop run (utils/checkpoint.py saves {step, params, opt_state})
        raw = ocp.StandardCheckpointer().restore(path.absolute())
        if isinstance(raw, dict) and "params" in raw and "opt_state" in raw:
            raw = raw["params"]
        return raw

    from .ar_rules import convert_clm, convert_jlm
    from .torch_to_jax import load_torch_state_dict, strip_prefix

    sd = load_torch_state_dict(str(path))
    if any(k.startswith("net.") for k in sd):
        sd = strip_prefix(sd, "net.")
    convert = convert_clm if model_type == "clm" else convert_jlm
    params, report = convert(template_params, sd, n_layers=n_layers,
                             strict=False)
    print(f"[load_ar_params] converted {model_type} from {path} "
          f"({len(report['missing'])} missing, "
          f"{len(report['unmapped'])} unmapped)")
    return params
