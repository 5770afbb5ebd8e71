"""Conditional Language Model over structure tokens (T5-style enc-dec).

TPU-native rebuild of the reference's ``CustomedT5``
(slm/models/net.py:253-295 + configs/model/default.yaml: 12 layers, d_model
1024, 16 heads, gated-gelu, vocab 4101, pad/decoder-start 4099): an encoder
over per-residue ESM3 embeddings (1536 -> d_model adapter) and an
autoregressive decoder over structure tokens.  Architecture mirrors T5
(RMSNorm, relative-position-bucket attention bias, gated-GELU FFN, no biases)
so HF checkpoints remain convertible.

TPU-first: generation runs as ONE jitted ``lax.scan`` over positions with a
preallocated KV cache — the reference's per-token Python loop with HF
``past_key_values`` (slm/sample_hf.py:173-215) becomes a single device
program.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from esmdiff_tpu.core import constants as C


@dataclasses.dataclass(frozen=True)
class CLMConfig:
    vocab_size: int = C.STRUCTURE_VOCAB_SIZE        # 4101
    d_model: int = 1024
    d_ff: int = 1024
    n_layers: int = 12
    n_heads: int = 16
    dropout: float = 0.1
    cond_dim: int = C.ESM3_D_MODEL                  # 1536 ESM3 embeddings
    pad_token_id: int = C.STRUCTURE_PAD_TOKEN       # 4099
    decoder_start_token_id: int = C.STRUCTURE_PAD_TOKEN
    rel_pos_buckets: int = 32
    rel_pos_max_distance: int = 128
    decoder_only: bool = False                      # net.py:279-281
    dec_add_input_emb: bool = False                 # net.py:284-294
    dtype: str = "bfloat16"
    # "int8" = W8A8 attention/FFN projections + lm_head (ops/quant.py) —
    # inference-only; params converted by quantize_clm_params.  The AR
    # decode step is weight-bandwidth-bound at serving batch sizes, so
    # int8 weights roughly halve the per-step HBM traffic vs bf16.
    quant: str = "none"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def d_head(self):
        return self.d_model // self.n_heads


class RMSNorm(nn.Module):
    """T5 layer norm: no mean subtraction, no bias, fp32 accumulation."""

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        return (x * jax.lax.rsqrt(var + 1e-6) * scale).astype(orig)


def relative_position_bucket(rel, bidirectional: bool, num_buckets: int,
                             max_distance: int):
    """T5 bucketing of relative positions.

    ``rel`` is query_pos - key_pos; HF buckets on memory_pos - context_pos
    = -rel: bidirectional puts future keys (-rel > 0) in the upper table
    half, causal buckets past keys by distance max(rel, 0).  Direction
    parity with the upstream torch implementation is pinned by
    tests/test_convert_hf_oracle.py (a sign flip here swaps the two
    bidirectional table halves and zeroes every causal bucket).
    """
    ret = 0
    n = -rel
    if bidirectional:
        num_buckets //= 2
        ret += (n > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(-n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class RelPosBias(nn.Module):
    cfg: CLMConfig
    bidirectional: bool

    @nn.compact
    def __call__(self, q_pos, k_pos):
        """q_pos (Lq,), k_pos (Lk,) -> bias (1, H, Lq, Lk)."""
        rel = q_pos[:, None] - k_pos[None, :]
        buckets = relative_position_bucket(
            rel, self.bidirectional, self.cfg.rel_pos_buckets,
            self.cfg.rel_pos_max_distance)
        table = self.param(
            "embedding", nn.initializers.normal(0.02),
            (self.cfg.rel_pos_buckets, self.cfg.n_heads), jnp.float32)
        return jnp.transpose(table[buckets], (2, 0, 1))[None]


def _dense(cfg, features: int, name: str):
    """Projection layer honoring cfg.quant (bias-free in both modes)."""
    if cfg.quant == "int8":
        from esmdiff_tpu.ops.quant import QuantDense

        return QuantDense(features, dtype=cfg.jnp_dtype, name=name)
    return nn.Dense(features, use_bias=False, dtype=cfg.jnp_dtype,
                    param_dtype=jnp.float32, name=name)


class T5Attention(nn.Module):
    cfg: CLMConfig

    @nn.compact
    def __call__(self, x, kv=None, bias=None, mask=None, cache=None,
                 cache_index=None):
        """Self-attention when kv is None, cross-attention otherwise.

        cache: optional dict(k (B, Lmax, H, Dh), v (...)) for incremental
        decode; cache_index = current write position (scalar).
        Returns (out, new_cache).
        """
        cfg = self.cfg
        kv_in = x if kv is None else kv
        dense = lambda name: _dense(cfg, cfg.d_model, name)
        B, Lq, _ = x.shape
        q = dense("q")(x).reshape(B, Lq, cfg.n_heads, cfg.d_head)
        k = dense("k")(kv_in).reshape(B, -1, cfg.n_heads, cfg.d_head)
        v = dense("v")(kv_in).reshape(B, -1, cfg.n_heads, cfg.d_head)
        new_cache = None
        if cache is not None:
            ck = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, cache_index, 0, 0))
            k, v = ck, cv
            new_cache = {"k": ck, "v": cv}
        # T5: no 1/sqrt(d) scaling (folded into init)
        logits = jnp.einsum("blhd,bmhd->bhlm", q, k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias
        if mask is not None:
            logits = jnp.where(mask, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(B, Lq, cfg.d_model)
        return dense("o")(o), new_cache


class T5FFN(nn.Module):
    cfg: CLMConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dense = lambda feat, name: _dense(cfg, feat, name)
        g = nn.gelu(dense(cfg.d_ff, "wi_0")(x))
        h = dense(cfg.d_ff, "wi_1")(x)
        return dense(cfg.d_model, "wo")(g * h)


class EncoderBlock(nn.Module):
    cfg: CLMConfig

    @nn.compact
    def __call__(self, x, bias, mask):
        a, _ = T5Attention(self.cfg, name="attn")(
            RMSNorm(name="ln1")(x), bias=bias, mask=mask)
        x = x + a
        return x + T5FFN(self.cfg, name="ffn")(RMSNorm(name="ln2")(x))


class DecoderBlock(nn.Module):
    cfg: CLMConfig

    @nn.compact
    def __call__(self, x, enc, self_bias, self_mask, cross_mask,
                 cache=None, cache_index=None):
        a, new_cache = T5Attention(self.cfg, name="self_attn")(
            RMSNorm(name="ln1")(x), bias=self_bias, mask=self_mask,
            cache=cache, cache_index=cache_index)
        x = x + a
        c, _ = T5Attention(self.cfg, name="cross_attn")(
            RMSNorm(name="ln2")(x), kv=enc, mask=cross_mask)
        x = x + c
        x = x + T5FFN(self.cfg, name="ffn")(RMSNorm(name="ln3")(x))
        return x, new_cache


class CLM(nn.Module):
    """Encoder-decoder over (ESM3 embeddings -> structure tokens)."""

    cfg: CLMConfig

    def setup(self):
        cfg = self.cfg
        self.adapter = nn.Dense(cfg.d_model, use_bias=False,
                                dtype=cfg.jnp_dtype, param_dtype=jnp.float32,
                                name="adapter")
        self.token_embed = nn.Embed(cfg.vocab_size, cfg.d_model,
                                    dtype=cfg.jnp_dtype,
                                    param_dtype=jnp.float32)
        self.enc_blocks = [EncoderBlock(cfg, name=f"enc{i}")
                           for i in range(cfg.n_layers)]
        self.enc_norm = RMSNorm(name="enc_norm")
        self.enc_relpos = RelPosBias(cfg, bidirectional=True,
                                     name="enc_relpos")
        self.dec_blocks = [DecoderBlock(cfg, name=f"dec{i}")
                           for i in range(cfg.n_layers)]
        self.dec_norm = RMSNorm(name="dec_norm")
        self.dec_relpos = RelPosBias(cfg, bidirectional=False,
                                     name="dec_relpos")
        # lm_head stays fp in quant mode: it writes logits directly (no
        # downstream averaging to absorb quantization noise) and is a tiny
        # share of per-step weight traffic
        self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                dtype=cfg.jnp_dtype, param_dtype=jnp.float32,
                                name="lm_head")

    def encode(self, inputs_embeds, attention_mask=None):
        cfg = self.cfg
        x = self.adapter(inputs_embeds.astype(cfg.jnp_dtype))
        if cfg.decoder_only:       # encoder bypass (reference net.py:279-281)
            return x
        L = x.shape[1]
        pos = jnp.arange(L)
        bias = self.enc_relpos(pos, pos)
        mask = None
        if attention_mask is not None:
            mask = attention_mask[:, None, None, :].astype(bool)
        for blk in self.enc_blocks:
            x = blk(x, bias, mask)
        return self.enc_norm(x)

    def decode_train(self, decoder_input_ids, enc, enc_mask=None,
                     cond_embeds=None):
        cfg = self.cfg
        x = self.token_embed(decoder_input_ids)
        if cfg.dec_add_input_emb and cond_embeds is not None:
            x = x + cond_embeds.astype(x.dtype)  # skip-conn (net.py:284-294)
        L = x.shape[1]
        pos = jnp.arange(L)
        bias = self.dec_relpos(pos, pos)
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        cross_mask = None
        if enc_mask is not None:
            cross_mask = enc_mask[:, None, None, :].astype(bool)
        for blk in self.dec_blocks:
            x, _ = blk(x, enc, bias, causal, cross_mask)
        return self.lm_head(self.dec_norm(x)).astype(jnp.float32)

    def __call__(self, inputs_embeds, labels=None, attention_mask=None,
                 decoder_input_ids=None):
        """Training forward (reference model_step contract,
        slm/models/model.py:289-313): returns dict(logits, loss?)."""
        enc = self.encode(inputs_embeds, attention_mask)
        if decoder_input_ids is None:
            assert labels is not None
            start = jnp.full((labels.shape[0], 1),
                             self.cfg.decoder_start_token_id, labels.dtype)
            safe_labels = jnp.where(labels == -100,
                                    self.cfg.pad_token_id, labels)
            decoder_input_ids = jnp.concatenate(
                [start, safe_labels[:, :-1]], axis=1)
        cond = enc if self.cfg.dec_add_input_emb else None
        logits = self.decode_train(decoder_input_ids, enc, attention_mask,
                                   cond_embeds=cond)
        out = {"logits": logits}
        if labels is not None:
            lp = jax.nn.log_softmax(logits, axis=-1)
            safe = jnp.where(labels == -100, 0, labels)
            nll = -jnp.take_along_axis(lp, safe[..., None], axis=-1)[..., 0]
            valid = (labels != -100).astype(jnp.float32)
            out["loss"] = (nll * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        return out

    # -- incremental decoding ------------------------------------------------
    def init_cache(self, B, L_max):
        cfg = self.cfg
        return [
            {"k": jnp.zeros((B, L_max, cfg.n_heads, cfg.d_head),
                            cfg.jnp_dtype),
             "v": jnp.zeros((B, L_max, cfg.n_heads, cfg.d_head),
                            cfg.jnp_dtype)}
            for _ in range(cfg.n_layers)
        ]

    def decode_step(self, token, position, enc, caches, enc_mask=None,
                    cond_embed=None):
        """One decoder step.  token (B,), position scalar, enc (B, Lenc, D).
        Returns (logits (B, V), new_caches)."""
        cfg = self.cfg
        x = self.token_embed(token[:, None])
        if cfg.dec_add_input_emb and cond_embed is not None:
            x = x + cond_embed[:, None].astype(x.dtype)
        L_max = caches[0]["k"].shape[1]
        bias_full = self.dec_relpos(jnp.arange(L_max), jnp.arange(L_max))
        bias = jax.lax.dynamic_slice_in_dim(
            bias_full, position, 1, axis=2)      # (1, H, 1, L_max)
        key_ok = (jnp.arange(L_max) <= position)[None, None, None, :]
        cross_mask = None
        if enc_mask is not None:
            cross_mask = enc_mask[:, None, None, :].astype(bool)
        new_caches = []
        for blk, cache in zip(self.dec_blocks, caches):
            x, nc = blk(x, enc, bias, key_ok, cross_mask, cache=cache,
                        cache_index=position)
            new_caches.append(nc)
        logits = self.lm_head(self.dec_norm(x))[:, 0].astype(jnp.float32)
        return logits, new_caches


# Dense leaves CLMConfig(quant="int8") swaps to QuantDense — the per-block
# q/k/v/o projections and the gated-GELU FFN.  The adapter / embeddings /
# RMSNorms / lm_head stay fp (the adapter runs once per prefill, the head
# writes logits directly; name matching is structural — only
# {kernel[, bias]} leaves convert).
CLM_QUANT_NAMES = frozenset({"q", "k", "v", "o", "wi_0", "wi_1", "wo"})


def quantize_clm_params(tree):
    """Trained fp32 CLM tree -> the CLMConfig(quant='int8') layout."""
    from esmdiff_tpu.ops.quant import quantize_named_denses

    return quantize_named_denses(tree, CLM_QUANT_NAMES)
