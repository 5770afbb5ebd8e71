"""Joint Language Model over concat(sequence, structure) tokens (GPT-2-style).

TPU-native rebuild of the reference's ``CustomedGPT2``
(slm/models/net.py:87-249 + configs/experiment/jlm.yaml): a decoder-only
transformer over the concatenation of per-residue ESM3 sequence embeddings and
structure-token embeddings, with

  - adapter linears from the ESM3 (1536) and VQ-decoder (1280) embedding
    spaces into the model width (net.py:101-102),
  - two separator strategies: 'sentence' (token-type embeddings) and
    'position' (a learned <sep> vector + restarted position ids,
    net.py:107-113,135-183),
  - dual output heads (sequence vocab / structure vocab, net.py:104-105),
  - shift-by-one CE on both segments with segment-aware shifting
    (net.py:222-248).

Generation runs as one jitted ``lax.scan`` with a preallocated KV cache
(replacing HF past_key_values + the per-token Python loop,
slm/sample_hf.py:190-197).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from esmdiff_tpu.core import constants as C


@dataclasses.dataclass(frozen=True)
class JLMConfig:
    n_embd: int = 768
    n_layers: int = 12
    n_heads: int = 12
    n_positions: int = 2048           # jlm.yaml:38 (2L+1 joint sequence)
    seq_vocab: int = C.SEQUENCE_VOCAB_SIZE
    struct_vocab: int = C.STRUCTURE_VOCAB_SIZE
    cond_dim: int = C.ESM3_D_MODEL            # 1536
    struct_embed_dim: int = C.VQVAE_DECODER_D_MODEL  # 1280 (VQ-decoder init)
    sep_strategy: str = "sentence"    # 'sentence' | 'position'
    seq_loss_weight: float = 1.0
    dtype: str = "bfloat16"
    # "int8" = W8A8 block projections + output heads (ops/quant.py) —
    # inference-only; params converted by quantize_jlm_params
    quant: str = "none"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def d_head(self):
        return self.n_embd // self.n_heads


class GPT2Block(nn.Module):
    cfg: JLMConfig

    @nn.compact
    def __call__(self, x, mask, cache=None, cache_index=None):
        cfg = self.cfg
        if cfg.quant == "int8":
            from esmdiff_tpu.ops.quant import QuantDense

            # GPT-2 projections carry biases (HF layout)
            dense = lambda feat, name: QuantDense(
                feat, dtype=cfg.jnp_dtype, use_bias=True, name=name)
        else:
            dense = lambda feat, name: nn.Dense(
                feat, dtype=cfg.jnp_dtype, param_dtype=jnp.float32, name=name)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x).astype(cfg.jnp_dtype)
        B, Lq, _ = h.shape
        qkv = dense(3 * cfg.n_embd, "qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, Lq, cfg.n_heads, cfg.d_head)
        k = k.reshape(B, Lq, cfg.n_heads, cfg.d_head)
        v = v.reshape(B, Lq, cfg.n_heads, cfg.d_head)
        new_cache = None
        if cache is not None:
            ck = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, cache_index, 0, 0))
            k, v = ck, cv
            new_cache = {"k": ck, "v": cv}
        logits = jnp.einsum("blhd,bmhd->bhlm", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(float(cfg.d_head))
        logits = jnp.where(mask, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(B, Lq, cfg.n_embd)
        x = x + dense(cfg.n_embd, "attn_out")(o)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x).astype(cfg.jnp_dtype)
        h = dense(4 * cfg.n_embd, "mlp_up")(h)
        h = nn.gelu(h)
        x = x + dense(cfg.n_embd, "mlp_down")(h)
        return x, new_cache


class JLM(nn.Module):
    cfg: JLMConfig

    def setup(self):
        cfg = self.cfg
        self.structure_embed = nn.Embed(
            cfg.struct_vocab, cfg.struct_embed_dim, dtype=cfg.jnp_dtype,
            param_dtype=jnp.float32, name="structure_embed")
        self.seq_adapter = nn.Dense(cfg.n_embd, use_bias=False,
                                    dtype=cfg.jnp_dtype,
                                    param_dtype=jnp.float32,
                                    name="seq_adapter")
        self.struct_adapter = nn.Dense(cfg.n_embd, use_bias=False,
                                       dtype=cfg.jnp_dtype,
                                       param_dtype=jnp.float32,
                                       name="struct_adapter")
        self.wpe = nn.Embed(cfg.n_positions, cfg.n_embd, dtype=cfg.jnp_dtype,
                            param_dtype=jnp.float32, name="wpe")
        if cfg.sep_strategy == "sentence":
            self.token_type = nn.Embed(2, cfg.n_embd, dtype=cfg.jnp_dtype,
                                       param_dtype=jnp.float32,
                                       name="token_type")
        else:
            self.sep_token = self.param("sep_token",
                                        nn.initializers.normal(1.0),
                                        (cfg.n_embd,), jnp.float32)
        self.blocks = [GPT2Block(cfg, name=f"block{i}")
                       for i in range(cfg.n_layers)]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_f")
        # heads stay fp in quant mode (they write logits directly; tiny
        # share of per-step weight traffic)
        self.sequence_head = nn.Dense(cfg.seq_vocab, use_bias=False,
                                      dtype=cfg.jnp_dtype,
                                      param_dtype=jnp.float32,
                                      name="sequence_head")
        self.structure_head = nn.Dense(cfg.struct_vocab, use_bias=False,
                                       dtype=cfg.jnp_dtype,
                                       param_dtype=jnp.float32,
                                       name="structure_head")

    def _joint_embeds(self, sequence_embeddings, structure_tokens):
        """(B, L, 1536), (B, Ls) -> (B, L[+1]+Ls, D), positions, type ids."""
        cfg = self.cfg
        B, L = sequence_embeddings.shape[:2]
        Ls = structure_tokens.shape[1]
        seq_part = self.seq_adapter(
            sequence_embeddings.astype(cfg.jnp_dtype))
        str_part = self.struct_adapter(self.structure_embed(structure_tokens))
        if cfg.sep_strategy == "sentence":
            x = jnp.concatenate([seq_part, str_part], axis=1)
            types = jnp.concatenate([
                jnp.zeros((B, L), jnp.int32), jnp.ones((B, Ls), jnp.int32),
            ], axis=1)
            x = x + self.token_type(types)
            pos = jnp.arange(L + Ls)
        else:
            sep = jnp.broadcast_to(
                self.sep_token.astype(cfg.jnp_dtype)[None, None],
                (B, 1, cfg.n_embd))
            x = jnp.concatenate([seq_part, sep, str_part], axis=1)
            pos = jnp.concatenate([
                jnp.arange(L), jnp.zeros((1,), jnp.int32),
                jnp.arange(Ls),
            ])
        x = x + self.wpe(pos)[None]
        return x

    def __call__(self, sequence_embeddings, structure_tokens, labels=None,
                 mask=None):
        """Training forward (reference net.py:117-249).

        labels: (B, L + Ls) concat of sequence and structure labels
        (-100 = ignored); mask: (B, L) validity.
        Returns dict(sequence_logits, structure_logits, loss?, ...).
        """
        cfg = self.cfg
        B, L = sequence_embeddings.shape[:2]
        Ls = structure_tokens.shape[1]
        x = self._joint_embeds(sequence_embeddings, structure_tokens)
        T = x.shape[1]
        causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
        for blk in self.blocks:
            x, _ = blk(x, causal)
        h = self.ln_f(x).astype(cfg.jnp_dtype)
        off = 0 if cfg.sep_strategy == "sentence" else 1
        seq_logits = self.sequence_head(h[:, :L]).astype(jnp.float32)
        str_logits = self.structure_head(h[:, L + off:]).astype(jnp.float32)
        out = {"sequence_logits": seq_logits, "structure_logits": str_logits}

        if labels is not None:
            assert mask is not None
            loss = 0.0
            for name, logits, lab in (
                ("sequence", seq_logits, labels[:, :L]),
                ("structure", str_logits, labels[:, L:]),
            ):
                if cfg.sep_strategy == "position" and name == "structure":
                    # sep predicts structure[0]: no shift (net.py:234-236)
                    shift_logits, shift_labels = logits[:, :-1], lab[:, :-1]
                    lm = mask[:, :-1]
                else:
                    shift_logits = logits[:, :-1]
                    shift_labels = lab[:, 1:]
                    lm = mask[:, 1:]
                lp = jax.nn.log_softmax(shift_logits, axis=-1)
                safe = jnp.where(shift_labels == -100, 0, shift_labels)
                nll = -jnp.take_along_axis(
                    lp, safe[..., None], axis=-1)[..., 0]
                valid = (shift_labels != -100).astype(jnp.float32) * lm
                _loss = (nll * valid).sum() / jnp.maximum(valid.sum(), 1.0)
                pred = jnp.argmax(shift_logits, axis=-1)
                acc = ((pred == shift_labels) * valid).sum() / \
                    jnp.maximum(valid.sum(), 1.0)
                out[f"{name}_nll"] = _loss
                out[f"{name}_acc"] = acc
                loss = loss + (_loss * cfg.seq_loss_weight
                               if name == "sequence" else _loss)
            out["loss"] = loss
        return out

    # -- incremental decoding -------------------------------------------------
    def init_cache(self, B, T_max):
        cfg = self.cfg
        return [
            {"k": jnp.zeros((B, T_max, cfg.n_heads, cfg.d_head),
                            cfg.jnp_dtype),
             "v": jnp.zeros((B, T_max, cfg.n_heads, cfg.d_head),
                            cfg.jnp_dtype)}
            for _ in range(cfg.n_layers)
        ]

    def prefill(self, sequence_embeddings, bos_structure_tokens, caches):
        """Run the prompt (sequence part + first structure token) through the
        stack, filling the cache.  Returns (next-token structure logits,
        caches, prompt_len)."""
        x = self._joint_embeds(sequence_embeddings, bos_structure_tokens)
        T = x.shape[1]
        T_max = caches[0]["k"].shape[1]
        causal = (jnp.arange(T_max)[None, :] <= jnp.arange(T)[:, None])
        causal = causal[None, None]
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            x, nc = blk(x, causal, cache=cache, cache_index=0)
            new_caches.append(nc)
        h = self.ln_f(x[:, -1:]).astype(self.cfg.jnp_dtype)
        logits = self.structure_head(h)[:, 0].astype(jnp.float32)
        return logits, new_caches, T

    def decode_step(self, token, position, caches, pos_id=None):
        """One AR step over the structure segment.  token (B,), position =
        absolute write index in the joint sequence; pos_id = wpe index
        (differs from position under the 'position' sep strategy, where the
        structure segment restarts at 0)."""
        cfg = self.cfg
        if pos_id is None:
            pos_id = position
        pos_id = jnp.asarray(pos_id, jnp.int32)
        x = self.struct_adapter(self.structure_embed(token[:, None]))
        if cfg.sep_strategy == "sentence":
            x = x + self.token_type(jnp.ones((), jnp.int32))[None, None]
        x = x + self.wpe(pos_id)[None, None]
        T_max = caches[0]["k"].shape[1]
        key_ok = (jnp.arange(T_max) <= position)[None, None, None, :]
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            x, nc = blk(x, key_ok, cache=cache, cache_index=position)
            new_caches.append(nc)
        h = self.ln_f(x).astype(cfg.jnp_dtype)
        return self.structure_head(h)[:, 0].astype(jnp.float32), new_caches


# Dense leaves JLMConfig(quant="int8") swaps to QuantDense — the GPT-2
# block projections (with their HF biases).  The adapters / embeddings /
# LayerNorms / output heads stay fp.
JLM_QUANT_NAMES = frozenset({"qkv", "attn_out", "mlp_up", "mlp_down"})


def quantize_jlm_params(tree):
    """Trained fp32 JLM tree -> the JLMConfig(quant='int8') layout."""
    from esmdiff_tpu.ops.quant import quantize_named_denses

    return quantize_named_denses(tree, JLM_QUANT_NAMES)
