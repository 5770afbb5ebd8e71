"""Conversion-verification harness: per-layer torch-oracle activation diffs
(convert/verify.py) on reference-layout synthetic state_dicts."""

import numpy as np
import pytest

from esmdiff_tpu.convert.verify import (
    make_reference_trunk_state_dict,
    verify_trunk,
)
from esmdiff_tpu.models.esm3 import esm3_tiny

pytestmark = pytest.mark.slow  # multi-minute compile-heavy module

CFG = esm3_tiny()


def _worst(rows):
    return max(r["rel_diff"] for r in rows)


def test_fixture_roundtrip_is_clean():
    sd = make_reference_trunk_state_dict(CFG, seed=0)
    rows = verify_trunk(sd, CFG)
    assert len(rows) >= CFG.n_layers + 2
    assert _worst(rows) < 1e-5


def test_fixture_roundtrip_full_width_geometry():
    """VERDICT round 2 item 1: verification at REAL trunk dims.  d_model
    1536 / 24 heads (head_dim-64 rotary packing) / v_heads 256 (geometric
    attention layout) / swiglu_hidden_dim(1536) rounding / 4101-way head —
    everything a tiny config can't see — with 4 layers to bound runtime.
    The full 48-layer run is recorded in output/verify_full/log.txt +
    ROUND3_NOTES.md (worst rel diff 1.7e-6 over all 48 blocks; all six
    components OK at full geometry)."""
    from esmdiff_tpu.models.esm3 import ESM3Config

    cfg = ESM3Config(n_layers=4)
    assert cfg.d_model == 1536 and cfg.n_heads == 24 and cfg.v_heads == 256
    assert cfg.ffn_hidden == 4096  # swiglu_hidden_dim(1536, 8/3) rounding
    sd = make_reference_trunk_state_dict(cfg, seed=0)
    rows = verify_trunk(sd, cfg)
    assert len(rows) >= cfg.n_layers + 2
    assert _worst(rows) < 1e-5


def test_key_drift_is_caught_and_patchable(capsys):
    """A renamed torch key (naming drift in a real checkpoint) must surface
    as a missing key, and KEY_OVERRIDES must patch it without code changes."""
    sd = make_reference_trunk_state_dict(CFG, seed=0)
    drifted = dict(sd)
    drifted["transformer.blocks.1.attn.qkv_proj.weight"] = drifted.pop(
        "transformer.blocks.1.attn.layernorm_qkv.1.weight")
    verify_trunk(drifted, CFG)
    out = capsys.readouterr().out
    assert "MISSING" in out and "MISMATCH" in out

    rows = verify_trunk(drifted, CFG, key_overrides={
        "transformer.blocks.1.attn.layernorm_qkv.1.weight":
            "transformer.blocks.1.attn.qkv_proj.weight"})
    assert _worst(rows) < 1e-5


def test_value_transforms_unpermutes_geom_packing():
    """ROUND1_NOTES #1: a real checkpoint may pack the geometric-attention
    projection channels in a different per-head order.  Simulate a
    [kr|qr|qd|kd|val] checkpoint and un-permute it via value_transforms."""
    sd = make_reference_trunk_state_dict(CFG, seed=0)
    key = "transformer.blocks.0.geom_attn.proj.weight"
    H = CFG.v_heads
    w = sd[key]  # (H*15, d) rows packed per head [qr kr qd kd val]
    rows_per_head = w.reshape(H, 15, -1)
    swapped = rows_per_head[:, [3, 4, 5, 0, 1, 2, 6, 7, 8, 9, 10, 11,
                                12, 13, 14]]  # kr first
    sd_swapped = dict(sd)
    sd_swapped[key] = swapped.reshape(H * 15, -1)

    def unswap(arr):
        r = arr.reshape(H, 15, -1)[:, [3, 4, 5, 0, 1, 2, 6, 7, 8, 9, 10,
                                       11, 12, 13, 14]]
        return r.reshape(H * 15, -1)

    # converting the permuted checkpoint WITH the inverse hook must produce
    # byte-identical params to converting the canonical one (NB: the oracle
    # diff alone cannot see a shared packing assumption — both sides read the
    # same tensors — so this is a param-level equality check)
    import jax
    import jax.numpy as jnp

    from esmdiff_tpu.convert.torch_to_jax import convert_params, trunk_rules
    from esmdiff_tpu.models.esm3 import ESM3

    cfg32 = type(CFG)(**{**CFG.__dict__, "dtype": "float32"})
    net = ESM3(cfg32)
    template = jax.jit(lambda k: net.init(
        k, sequence_tokens=jnp.zeros((1, 8), jnp.int32),
        structure_coords=jnp.zeros((1, 8, 3, 3), jnp.float32)))(
        jax.random.PRNGKey(0))["params"]
    rules = trunk_rules(CFG.n_layers, CFG.n_layers_geom, CFG.head_type)
    kw = dict(n_scan_layers=CFG.n_layers - CFG.n_layers_geom,
              scan_layer_offset=CFG.n_layers_geom, strict=False)
    ref_params, _ = convert_params(template, sd, rules, **kw)
    fixed_params, _ = convert_params(template, sd_swapped, rules,
                                     value_transforms={key: unswap}, **kw)
    bad_params, _ = convert_params(template, sd_swapped, rules, **kw)
    ref_proj = ref_params["transformer"]["block0"]["geom_attn"]["proj"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(fixed_params["transformer"]["block0"]["geom_attn"]
                   ["proj"]["kernel"]), np.asarray(ref_proj))
    assert not np.array_equal(
        np.asarray(bad_params["transformer"]["block0"]["geom_attn"]
                   ["proj"]["kernel"]), np.asarray(ref_proj))

    # and the activation harness stays clean with the hook engaged
    rows = verify_trunk(sd_swapped, CFG, value_transforms={key: unswap})
    assert _worst(rows) < 1e-5


def test_converter_layout_bug_explodes_diff(monkeypatch):
    """A converter rule with a wrong layout transform (missing transpose on
    the square out_proj) must be loudly visible in the activation diff of
    exactly the affected layer — this is the failure mode the harness exists
    for (the torch oracle applies the CORRECT layout independently)."""
    from esmdiff_tpu.convert import torch_to_jax as t2j

    real_rules = t2j.trunk_rules

    def broken_rules(n_layers, n_layers_geom=1, head_type="esm3"):
        rules = real_rules(n_layers, n_layers_geom, head_type)
        # drop the transpose on every scanned block's attn out kernel
        k = ("transformer", "blocks", "block", "attn", "out", "kernel")
        tkey, _tf, stack = rules[k]
        rules[k] = (tkey, t2j._id, stack)
        return rules

    monkeypatch.setattr(t2j, "trunk_rules", broken_rules)
    sd = make_reference_trunk_state_dict(CFG, seed=0)
    rows = verify_trunk(sd, CFG)
    by_name = {r["layer"]: r["rel_diff"] for r in rows}
    assert by_name["block1"] > 1e-3, "layout bug must explode the diff"
    assert by_name["block0(geom)"] < 1e-5, "unaffected layer stays clean"


def test_vqvae_decoder_fixture_roundtrip():
    from esmdiff_tpu.convert.verify import (
        make_reference_decoder_state_dict, verify_vqvae_decoder)
    from esmdiff_tpu.models.vqvae import DecoderConfig

    cfg = DecoderConfig(d_model=64, n_heads=4, n_layers=3)
    sd = make_reference_decoder_state_dict(cfg, seed=0)
    rows = verify_vqvae_decoder(sd, cfg)
    assert len(rows) == cfg.n_layers + 2
    assert max(r["rel_diff"] for r in rows) < 1e-5


def test_vqvae_decoder_drift_and_layout_bug():
    from esmdiff_tpu.convert.verify import (
        make_reference_decoder_state_dict, verify_vqvae_decoder)
    from esmdiff_tpu.models.vqvae import DecoderConfig

    cfg = DecoderConfig(d_model=64, n_heads=4, n_layers=3)
    sd = make_reference_decoder_state_dict(cfg, seed=0)
    # renamed key -> missing + patchable via key_overrides
    bad = dict(sd)
    bad["affine_output_projection.out.weight"] = bad.pop(
        "affine_output_projection.proj.weight")
    rows = verify_vqvae_decoder(bad, cfg, key_overrides={
        "affine_output_projection.proj.weight":
            "affine_output_projection.out.weight"})
    assert max(r["rel_diff"] for r in rows) < 1e-5


def test_vqvae_encoder_fixture_roundtrip():
    from esmdiff_tpu.convert.verify import (
        make_reference_encoder_state_dict, verify_vqvae_encoder)
    from esmdiff_tpu.models.vqvae import EncoderConfig

    cfg = EncoderConfig(d_model=64, n_heads=2, v_heads=8, n_layers=2,
                        d_out=16, knn=8)
    sd = make_reference_encoder_state_dict(cfg, seed=0)
    rows = verify_vqvae_encoder(sd, cfg)
    # relpos + blocks + final_norm + pre_vq + codebook_d2 + codebook_argmin
    assert len(rows) == cfg.n_layers + 5
    assert max(r["rel_diff"] for r in rows) < 1e-5


def test_vqvae_encoder_drift_and_layout_bug(monkeypatch):
    from esmdiff_tpu.convert import torch_to_jax as t2j
    from esmdiff_tpu.convert.verify import (
        make_reference_encoder_state_dict, verify_vqvae_encoder)
    from esmdiff_tpu.models.vqvae import EncoderConfig

    cfg = EncoderConfig(d_model=64, n_heads=2, v_heads=8, n_layers=2,
                        d_out=16, knn=8)
    sd = make_reference_encoder_state_dict(cfg, seed=0)
    # renamed codebook key (plausible real-checkpoint drift) -> patchable
    bad = dict(sd)
    bad["quantizer.codebook.weight"] = bad.pop("codebook.embeddings")
    rows = verify_vqvae_encoder(bad, cfg, key_overrides={
        "codebook.embeddings": "quantizer.codebook.weight"})
    assert max(r["rel_diff"] for r in rows) < 1e-5
    # a converter rule that loses the out_proj transpose must explode exactly
    # block 1's diff (the torch oracle applies the correct layout
    # independently of the rule table)
    real_rules = t2j.vqvae_encoder_rules

    def broken_rules(n_layers=2):
        rules = real_rules(n_layers)
        k = ("transformer", "block1", "attn", "out", "kernel")
        tkey, _tf = rules[k]
        rules[k] = (tkey, t2j._id)
        return rules

    monkeypatch.setattr(t2j, "vqvae_encoder_rules", broken_rules)
    rows = verify_vqvae_encoder(sd, cfg)
    by_name = {r["layer"]: r["rel_diff"] for r in rows}
    assert by_name["enc_block1"] > 1e-3
    assert by_name["enc_block0(geom)"] < 1e-5
    assert by_name["pre_vq_proj"] < 1e-5


def test_function_decoder_fixture_roundtrip():
    from esmdiff_tpu.convert.verify import (
        make_reference_function_decoder_state_dict, verify_function_decoder)
    from esmdiff_tpu.models.function_decoder import FunctionDecoderConfig

    cfg = FunctionDecoderConfig(d_model=64, n_heads=4, n_layers=2,
                                interpro_classes=37, keyword_vocab=53)
    sd = make_reference_function_decoder_state_dict(cfg, seed=0)
    rows = verify_function_decoder(sd, cfg)
    # embed + blocks + final_norm + 2 heads
    assert len(rows) == cfg.n_layers + 4
    assert max(r["rel_diff"] for r in rows) < 1e-5


def test_function_decoder_head_sizes_from_state_dict():
    """ROUND1_NOTES #3: head sizes in real checkpoints are unknown — the
    config must be derivable from state_dict shapes, and verification must
    pass at whatever size the checkpoint declares."""
    from esmdiff_tpu.convert.verify import (
        make_reference_function_decoder_state_dict, verify_function_decoder)
    from esmdiff_tpu.models.function_decoder import FunctionDecoderConfig

    donor = FunctionDecoderConfig(d_model=64, n_heads=4, n_layers=2,
                                  interpro_classes=91, keyword_vocab=17)
    sd = make_reference_function_decoder_state_dict(donor, seed=3)
    # rebuild the config purely from the shapes (real-weight-day procedure)
    cfg = FunctionDecoderConfig(
        d_model=sd["decoder.norm.weight"].shape[0], n_heads=4,
        n_layers=2,
        interpro_classes=sd["heads.interpro_logits.3.weight"].shape[0],
        keyword_vocab=sd["heads.keyword_logits.3.weight"].shape[0])
    rows = verify_function_decoder(sd, cfg)
    assert max(r["rel_diff"] for r in rows) < 1e-5


def test_clm_verify_fixture_and_config_inference():
    """CLM verification against the REAL HF torch T5 (no hand-written
    oracle), with the config inferred purely from state-dict shapes — the
    real-checkpoint-day procedure."""
    from esmdiff_tpu.convert.verify import (
        infer_clm_config, make_reference_clm_state_dict, verify_clm)
    from esmdiff_tpu.models.clm import CLMConfig

    donor = CLMConfig(d_model=32, d_ff=48, n_layers=2, n_heads=4,
                      cond_dim=40, dtype="float32")
    sd = make_reference_clm_state_dict(donor, seed=1)
    cfg = infer_clm_config(sd)
    assert (cfg.d_model, cfg.d_ff, cfg.n_layers, cfg.n_heads,
            cfg.cond_dim) == (32, 48, 2, 4, 40)
    rows = verify_clm(sd)  # config inferred internally
    assert max(r["rel_diff"] for r in rows) < 1e-5


def test_jlm_verify_fixture_both_strategies():
    from esmdiff_tpu.convert.verify import (
        infer_jlm_config, make_reference_jlm_state_dict, verify_jlm)
    from esmdiff_tpu.models.jlm import JLMConfig

    for sep in ("sentence", "position"):
        donor = JLMConfig(n_embd=32, n_layers=2, n_heads=4, n_positions=64,
                          cond_dim=40, struct_embed_dim=24, seq_vocab=33,
                          sep_strategy=sep, dtype="float32")
        sd = make_reference_jlm_state_dict(donor, seed=2)
        cfg = infer_jlm_config(sd, n_heads=4)
        assert cfg.sep_strategy == sep and cfg.n_embd == 32
        rows = verify_jlm(sd, n_heads=4)
        assert max(r["rel_diff"] for r in rows) < 1e-5
