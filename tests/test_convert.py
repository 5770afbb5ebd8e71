"""Converter round-trip: export a tiny trunk to torch layout, reload, compare
outputs.  Validates the mapping machinery (key templates, transposes, scan
stacking, Lightning/DeepSpeed unwrapping)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esmdiff_tpu.convert.torch_to_jax import (
    convert_trunk,
    export_torch_state_dict,
    load_torch_state_dict,
    trunk_rules,
)
from esmdiff_tpu.models.esm3 import ESM3, esm3_tiny


@pytest.fixture(scope="module")
def tiny():
    cfg = esm3_tiny(dtype="float32")
    model = ESM3(cfg)
    seq = jnp.full((1, 8), 5, dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), sequence_tokens=seq,
                        structure_coords=jnp.zeros((*seq.shape, 3, 3)))["params"]
    return cfg, model, params, seq


def test_roundtrip_exact(tiny):
    cfg, model, params, seq = tiny
    rules = trunk_rules(cfg.n_layers, cfg.n_layers_geom, cfg.head_type)
    sd = export_torch_state_dict(
        params, rules, n_scan_layers=cfg.n_layers - cfg.n_layers_geom,
        scan_layer_offset=cfg.n_layers_geom)
    assert len(sd) > 40

    # fresh template with different random init
    params2 = model.init(jax.random.PRNGKey(7), sequence_tokens=seq,
                         structure_coords=jnp.zeros((*seq.shape, 3, 3)))["params"]
    converted, report = convert_trunk(params2, sd, cfg, strict=True)
    out_ref = model.apply({"params": params}, sequence_tokens=seq)
    out_conv = model.apply({"params": converted}, sequence_tokens=seq)
    np.testing.assert_allclose(
        np.asarray(out_ref.structure_logits),
        np.asarray(out_conv.structure_logits), atol=1e-5)


def test_missing_keys_strictness(tiny):
    cfg, model, params, seq = tiny
    rules = trunk_rules(cfg.n_layers, cfg.n_layers_geom, cfg.head_type)
    sd = export_torch_state_dict(
        params, rules, n_scan_layers=cfg.n_layers - cfg.n_layers_geom,
        scan_layer_offset=cfg.n_layers_geom)
    key = "transformer.blocks.0.attn.out_proj.weight"
    del sd[key]
    with pytest.raises(KeyError):
        convert_trunk(params, sd, cfg, strict=True)
    _, report = convert_trunk(params, sd, cfg, strict=False)
    assert key in report["missing"]


def test_lightning_and_deepspeed_layout_unwrap(tiny, tmp_path):
    import torch

    cfg, model, params, seq = tiny
    rules = trunk_rules(cfg.n_layers, cfg.n_layers_geom, cfg.head_type)
    sd = export_torch_state_dict(
        params, rules, n_scan_layers=cfg.n_layers - cfg.n_layers_geom,
        scan_layer_offset=cfg.n_layers_geom)
    tsd = {("net." + k): torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    # Lightning .ckpt layout (reference checkpoint_utils.py:21-26)
    ckpt = tmp_path / "lightning.ckpt"
    torch.save({"state_dict": tsd, "epoch": 3}, ckpt)
    loaded = load_torch_state_dict(str(ckpt))
    loaded = {k[len("net."):]: v for k, v in loaded.items()
              if k.startswith("net.")}
    assert set(loaded) == set(sd)

    # DeepSpeed consolidated layout (checkpoint_utils.py:27-31)
    ds = tmp_path / "mp_rank_00_model_states.pt"
    torch.save({"module": {("net." + k): torch.from_numpy(np.asarray(v))
                           for k, v in sd.items()}}, ds)
    loaded2 = load_torch_state_dict(str(ds))
    loaded2 = {k[len("net."):]: v for k, v in loaded2.items()
               if k.startswith("net.")}
    np.testing.assert_allclose(
        loaded2["transformer.norm.weight"], sd["transformer.norm.weight"])
