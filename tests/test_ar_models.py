"""CLM (T5-style) and JLM (GPT-2-style) AR models: shapes, loss, causality,
and KV-cache decode consistency with the training-time forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.models.clm import CLM, CLMConfig
from esmdiff_tpu.models.jlm import JLM, JLMConfig

B, L = 2, 10


@pytest.fixture(scope="module")
def clm():
    cfg = CLMConfig(d_model=32, d_ff=64, n_layers=2, n_heads=4,
                    cond_dim=48, dtype="float32")
    model = CLM(cfg)
    emb = jnp.asarray(np.random.RandomState(0).randn(B, L, 48),
                      dtype=jnp.float32)
    labels = jnp.asarray(
        np.random.RandomState(1).randint(0, 4096, (B, L)), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), emb, labels)["params"]
    return model, params, emb, labels


@pytest.fixture(scope="module")
def jlm():
    cfg = JLMConfig(n_embd=32, n_layers=2, n_heads=4, n_positions=64,
                    cond_dim=48, struct_embed_dim=24, dtype="float32")
    model = JLM(cfg)
    emb = jnp.asarray(np.random.RandomState(0).randn(B, L, 48),
                      dtype=jnp.float32)
    st = jnp.asarray(np.random.RandomState(1).randint(0, 4096, (B, L)),
                     dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), emb, st)["params"]
    return model, params, emb, st


def test_clm_train_forward(clm):
    model, params, emb, labels = clm
    out = model.apply({"params": params}, emb, labels)
    assert out["logits"].shape == (B, L, 4101)
    assert np.isfinite(float(out["loss"])) and float(out["loss"]) > 0


def test_clm_ignore_index(clm):
    model, params, emb, labels = clm
    l2 = labels.at[:, 0].set(-100)
    out = model.apply({"params": params}, emb, l2)
    assert np.isfinite(float(out["loss"]))


def test_clm_decoder_causality(clm):
    """Future decoder inputs must not change earlier logits."""
    model, params, emb, labels = clm
    enc = model.apply({"params": params}, emb, method=model.encode)
    dec1 = labels
    dec2 = labels.at[:, -1].set((labels[:, -1] + 1) % 4096)
    lg1 = model.apply({"params": params}, dec1, enc,
                      method=model.decode_train)
    lg2 = model.apply({"params": params}, dec2, enc,
                      method=model.decode_train)
    np.testing.assert_allclose(np.asarray(lg1[:, :-1]),
                               np.asarray(lg2[:, :-1]), atol=1e-5)
    assert np.abs(np.asarray(lg1[:, -1]) - np.asarray(lg2[:, -1])).max() > 1e-6


def test_clm_cache_decode_matches_full(clm):
    model, params, emb, labels = clm
    enc = model.apply({"params": params}, emb, method=model.encode)
    dec_inputs = jnp.concatenate([
        jnp.full((B, 1), model.cfg.decoder_start_token_id, jnp.int32),
        labels[:, :-1],
    ], axis=1)
    full = np.asarray(model.apply({"params": params}, dec_inputs, enc,
                                  method=model.decode_train))
    caches = model.init_cache(B, L)
    step_logits = []
    for pos in range(L):
        lg, caches = model.apply(
            {"params": params}, dec_inputs[:, pos], pos, enc, caches,
            None, None, method=model.decode_step)
        step_logits.append(np.asarray(lg))
    stepped = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(stepped, full, atol=2e-4)


def test_clm_generate(clm):
    from esmdiff_tpu.api.ar_generation import clm_generate

    model, params, emb, _ = clm
    toks = clm_generate(model, params, emb, L, 1.0, 0.95,
                        key=jax.random.PRNGKey(3))
    s = np.asarray(toks)
    assert s.shape == (B, L)
    assert (s < 4096).all()  # specials shielded


def test_jlm_train_forward(jlm):
    model, params, emb, st = jlm
    target = jnp.concatenate([
        jnp.asarray(np.random.RandomState(2).randint(4, 24, (B, L)),
                    dtype=jnp.int32),
        st,
    ], axis=1)
    out = model.apply({"params": params}, emb, st, labels=target,
                      mask=jnp.ones((B, L)))
    assert out["sequence_logits"].shape == (B, L, C.SEQUENCE_VOCAB_SIZE)
    assert out["structure_logits"].shape == (B, L, 4101)
    for k in ("loss", "sequence_nll", "structure_nll", "sequence_acc",
              "structure_acc"):
        assert np.isfinite(float(out[k])), k


def test_jlm_position_strategy(jlm):
    cfg = JLMConfig(n_embd=32, n_layers=2, n_heads=4, n_positions=64,
                    cond_dim=48, struct_embed_dim=24, dtype="float32",
                    sep_strategy="position")
    model = JLM(cfg)
    emb = jnp.asarray(np.random.RandomState(0).randn(B, L, 48),
                      dtype=jnp.float32)
    st = jnp.asarray(np.random.RandomState(1).randint(0, 4096, (B, L)),
                     dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), emb, st)["params"]
    target = jnp.concatenate([
        jnp.full((B, L), 5, jnp.int32), st], axis=1)
    out = model.apply({"params": params}, emb, st, labels=target,
                      mask=jnp.ones((B, L)))
    assert np.isfinite(float(out["loss"]))


def test_jlm_cache_decode_matches_full(jlm):
    model, params, emb, st = jlm
    # full forward logits over the structure segment
    out = model.apply({"params": params}, emb, st)
    full = np.asarray(out["structure_logits"])  # (B, L, V)

    # prefill with BOS-led structure segment, then step
    bos_led = jnp.concatenate([
        jnp.full((B, 1), C.STRUCTURE_BOS_TOKEN, jnp.int32), st[:, :-1],
    ], axis=1)
    out2 = model.apply({"params": params}, emb, bos_led)
    full2 = np.asarray(out2["structure_logits"])

    caches = model.init_cache(B, 2 * L + 2)
    logits0, caches, prompt_len = model.apply(
        {"params": params}, emb,
        jnp.full((B, 1), C.STRUCTURE_BOS_TOKEN, jnp.int32), caches,
        method=model.prefill)
    np.testing.assert_allclose(np.asarray(logits0), full2[:, 0], atol=2e-4)
    for i in range(L - 2):
        tok = bos_led[:, i + 1]
        lg, caches = model.apply(
            {"params": params}, tok, prompt_len + i, caches,
            method=model.decode_step)
        np.testing.assert_allclose(np.asarray(lg), full2[:, i + 1],
                                   atol=2e-4)


def test_jlm_generate(jlm):
    from esmdiff_tpu.api.ar_generation import jlm_generate

    model, params, emb, _ = jlm
    toks = jlm_generate(model, params, emb, L, 1.0, 0.95,
                        key=jax.random.PRNGKey(4))
    s = np.asarray(toks)
    assert s.shape == (B, L)
    assert (s < 4096).all()
