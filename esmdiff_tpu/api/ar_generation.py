"""Autoregressive structure-token generation (CLM / JLM).

TPU-native replacement for the reference AR sampler
(slm/sample_hf.py:149-232): the per-token Python loop with HF KV caches
becomes one jitted ``lax.scan`` over positions with preallocated caches —
an entire L-token decode is a single device program.  Top-p + temperature
sampling and the special-token logit shield (:200-211) match the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.diffusion.gibbs import top_p_filter


def _sample_token(key, logits, temperature: float, top_p: float):
    logits = logits / jnp.maximum(temperature, 1e-4)
    logits = top_p_filter(logits, top_p)
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, logits.shape) + 1e-20) + 1e-20)
    return jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)


def _shield_specials(logits):
    """Disallow the 5 structure specials during AR sampling
    (reference sample_hf.py:200-201)."""
    shield = jnp.concatenate([
        jnp.zeros((C.VQVAE_CODEBOOK_SIZE,), logits.dtype),
        jnp.full((C.STRUCTURE_NUM_SPECIAL_TOKENS,), -1e9, logits.dtype),
    ])
    return logits + shield


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def clm_generate(model, params, embeddings, length: int,
                 temperature: float, top_p: float, key=None,
                 attention_mask=None):
    """CLM: encoder over (B, Lenc, 1536) ESM3 embeddings, then decode
    ``length`` structure tokens.  Returns (B, length) int32."""
    B = embeddings.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)

    enc = model.apply({"params": params}, embeddings, attention_mask,
                      method=model.encode)
    caches = model.init_cache(B, length)
    start = jnp.full((B,), model.cfg.decoder_start_token_id, jnp.int32)

    def step(carry, pos):
        token, caches, key = carry
        key, k = jax.random.split(key)
        cond = enc[:, pos] if model.cfg.dec_add_input_emb else None
        logits, caches = model.apply(
            {"params": params}, token, pos, enc, caches,
            attention_mask, cond,
            method=model.decode_step)
        logits = _shield_specials(logits)
        nxt = _sample_token(k, logits, temperature, top_p)
        return (nxt, caches, key), nxt

    (_, _, _), tokens = jax.lax.scan(
        step, (start, caches, key), jnp.arange(length))
    return tokens.T  # (B, length)


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def jlm_generate(model, params, embeddings, length: int,
                 temperature: float, top_p: float, key=None):
    """JLM: prefill on the sequence segment (+BOS structure token), then
    decode ``length`` structure tokens.  Returns (B, length) int32."""
    B, L = embeddings.shape[:2]
    if key is None:
        key = jax.random.PRNGKey(0)
    off = 0 if model.cfg.sep_strategy == "sentence" else 1
    T_max = L + off + length + 1
    caches = model.init_cache(B, T_max)
    bos = jnp.full((B, 1), C.STRUCTURE_BOS_TOKEN, jnp.int32)
    logits, caches, prompt_len = model.apply(
        {"params": params}, embeddings, bos, caches, method=model.prefill)

    key, k0 = jax.random.split(key)
    first = _sample_token(k0, _shield_specials(logits), temperature, top_p)

    def step(carry, i):
        token, caches, key = carry
        key, k = jax.random.split(key)
        pos = prompt_len + i
        pos_id = (i + 1) if model.cfg.sep_strategy == "position" else pos
        logits, caches = model.apply(
            {"params": params}, token, pos, caches, pos_id,
            method=model.decode_step)
        nxt = _sample_token(k, _shield_specials(logits), temperature, top_p)
        return (nxt, caches, key), nxt

    (_, _, _), rest = jax.lax.scan(
        step, (first, caches, key), jnp.arange(length - 1))
    return jnp.concatenate([first[None], rest], axis=0).T  # (B, length)
