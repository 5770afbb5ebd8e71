"""VQ-VAE converter round-trips (same machinery as the trunk tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.convert.torch_to_jax import (
    convert_vqvae_decoder,
    convert_vqvae_encoder,
    export_torch_state_dict,
    vqvae_decoder_rules,
    vqvae_encoder_rules,
)

pytestmark = pytest.mark.slow  # multi-minute compile-heavy module
from esmdiff_tpu.models.vqvae import (
    DecoderConfig,
    EncoderConfig,
    StructureTokenDecoder,
    StructureTokenEncoder,
)


def test_decoder_roundtrip():
    cfg = DecoderConfig(d_model=32, n_heads=2, n_layers=3, dtype="float32",
                        scan_layers=True, predict_ptm=False)
    dec = StructureTokenDecoder(cfg)
    toks = jnp.full((1, 10), 7, jnp.int32)
    p1 = dec.init(jax.random.PRNGKey(0), toks)["params"]
    rules = vqvae_decoder_rules(cfg.n_layers)
    sd = export_torch_state_dict(p1, rules, n_scan_layers=cfg.n_layers,
                                 scan_layer_offset=0)
    p2 = dec.init(jax.random.PRNGKey(5), toks)["params"]
    conv, report = convert_vqvae_decoder(p2, sd, n_layers=cfg.n_layers,
                                         strict=False)
    # everything except the (framework-specific) pae heads must map
    assert not report["missing"]
    assert all("pae" in u for u in report["unmapped"]), report["unmapped"]
    o1 = dec.apply({"params": p1}, toks)
    o2 = dec.apply({"params": conv}, toks)
    np.testing.assert_allclose(np.asarray(o1["bb_pred"]),
                               np.asarray(o2["bb_pred"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1["plddt"]),
                               np.asarray(o2["plddt"]), atol=1e-5)


def test_encoder_roundtrip():
    cfg = EncoderConfig(d_model=32, n_heads=2, v_heads=4, n_layers=2,
                        d_out=8, n_codes=64, knn=6)
    enc = StructureTokenEncoder(cfg)
    bb = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 3, 3)) * 3.0
    p1 = enc.init(jax.random.PRNGKey(0), bb)["params"]
    rules = vqvae_encoder_rules(cfg.n_layers)
    sd = export_torch_state_dict(p1, rules)
    p2 = enc.init(jax.random.PRNGKey(5), bb)["params"]
    conv, report = convert_vqvae_encoder(p2, sd, strict=False)
    assert not report["missing"]
    assert not report["unmapped"], report["unmapped"]
    t1, z1, _ = enc.apply({"params": p1}, bb)
    t2, z2, _ = enc.apply({"params": conv}, bb)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)
