"""HF-layout conversion round-trips for CLM (T5) and JLM (GPT-2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.convert.ar_rules import (
    clm_rules,
    convert_clm,
    convert_jlm,
    jlm_rules,
)
from esmdiff_tpu.convert.torch_to_jax import export_torch_state_dict
from esmdiff_tpu.models.clm import CLM, CLMConfig
from esmdiff_tpu.models.jlm import JLM, JLMConfig

pytestmark = pytest.mark.slow  # multi-minute compile-heavy module

B, L = 2, 10


def test_clm_roundtrip():
    cfg = CLMConfig(d_model=32, d_ff=64, n_layers=2, n_heads=4,
                    cond_dim=48, dtype="float32")
    model = CLM(cfg)
    emb = jnp.asarray(np.random.RandomState(0).randn(B, L, 48),
                      dtype=jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 4096, (B, L)),
                         dtype=jnp.int32)
    p1 = model.init(jax.random.PRNGKey(0), emb, labels)["params"]
    rules = clm_rules(cfg.n_layers)
    sd = export_torch_state_dict(p1, rules)
    p2 = model.init(jax.random.PRNGKey(9), emb, labels)["params"]
    conv, report = convert_clm(p2, sd, n_layers=cfg.n_layers, strict=False)
    assert not report["missing"], report["missing"]
    assert not report["unmapped"], report["unmapped"]
    o1 = model.apply({"params": p1}, emb, labels)
    o2 = model.apply({"params": conv}, emb, labels)
    np.testing.assert_allclose(np.asarray(o1["logits"]),
                               np.asarray(o2["logits"]), atol=1e-5)


def test_jlm_roundtrip():
    cfg = JLMConfig(n_embd=32, n_layers=2, n_heads=4, n_positions=64,
                    cond_dim=48, struct_embed_dim=24, dtype="float32")
    model = JLM(cfg)
    emb = jnp.asarray(np.random.RandomState(0).randn(B, L, 48),
                      dtype=jnp.float32)
    st = jnp.asarray(np.random.RandomState(1).randint(0, 4096, (B, L)),
                     dtype=jnp.int32)
    p1 = model.init(jax.random.PRNGKey(0), emb, st)["params"]
    rules = jlm_rules(cfg.n_layers)
    sd = export_torch_state_dict(p1, rules)
    p2 = model.init(jax.random.PRNGKey(9), emb, st)["params"]
    conv, report = convert_jlm(p2, sd, n_layers=cfg.n_layers, strict=False)
    assert not report["missing"], report["missing"]
    # sentence mode has no sep_token param; nothing else may be unmapped
    assert not report["unmapped"], report["unmapped"]
    o1 = model.apply({"params": p1}, emb, st)
    o2 = model.apply({"params": conv}, emb, st)
    np.testing.assert_allclose(np.asarray(o1["structure_logits"]),
                               np.asarray(o2["structure_logits"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1["sequence_logits"]),
                               np.asarray(o2["sequence_logits"]), atol=1e-5)
