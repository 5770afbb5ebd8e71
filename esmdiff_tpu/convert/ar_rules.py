"""Torch->JAX conversion rules for the CLM (HF T5) and JLM (HF GPT-2).

The reference's CLM/JLM checkpoints are HF-module state dicts
(``CustomedT5``/``CustomedGPT2``, slm/models/net.py:87-295).  These rules map
them onto models/clm.py / models/jlm.py param trees using the same driver as
the trunk (convert/torch_to_jax.py::convert_params).

Layout notes:
  - T5 Linear weights are (out, in) -> transposed.
  - GPT-2 uses Conv1D with weights already (in, out) -> NOT transposed.
  - T5 relative_attention_bias lives only in block 0 of each stack.
  - GPT-2 token-type embeddings are rows [0, 1] of ``wte`` in HF; the JLM
    keeps a dedicated 2-row table (converted via a post-hook below).
"""

from __future__ import annotations

import numpy as np

from .torch_to_jax import _id, _t


def clm_rules(n_layers: int = 12) -> dict[tuple, tuple]:
    rules: dict[tuple, tuple] = {
        ("adapter", "kernel"): ("adapation_layer.weight", _t),
        ("token_embed", "embedding"): ("decoder.embed_tokens.weight", _id),
        ("lm_head", "kernel"): ("lm_head.weight", _t),
        ("enc_norm", "scale"): ("encoder.final_layer_norm.weight", _id),
        ("dec_norm", "scale"): ("decoder.final_layer_norm.weight", _id),
        ("enc_relpos", "embedding"):
            ("encoder.block.0.layer.0.SelfAttention."
             "relative_attention_bias.weight", _id),
        ("dec_relpos", "embedding"):
            ("decoder.block.0.layer.0.SelfAttention."
             "relative_attention_bias.weight", _id),
    }
    for i in range(n_layers):
        e = f"encoder.block.{i}"
        for nm in ("q", "k", "v", "o"):
            rules[(f"enc{i}", "attn", nm, "kernel")] = (
                f"{e}.layer.0.SelfAttention.{nm}.weight", _t)
        rules[(f"enc{i}", "ln1", "scale")] = (
            f"{e}.layer.0.layer_norm.weight", _id)
        for nm in ("wi_0", "wi_1", "wo"):
            rules[(f"enc{i}", "ffn", nm, "kernel")] = (
                f"{e}.layer.1.DenseReluDense.{nm}.weight", _t)
        rules[(f"enc{i}", "ln2", "scale")] = (
            f"{e}.layer.1.layer_norm.weight", _id)

        d = f"decoder.block.{i}"
        for nm in ("q", "k", "v", "o"):
            rules[(f"dec{i}", "self_attn", nm, "kernel")] = (
                f"{d}.layer.0.SelfAttention.{nm}.weight", _t)
            rules[(f"dec{i}", "cross_attn", nm, "kernel")] = (
                f"{d}.layer.1.EncDecAttention.{nm}.weight", _t)
        rules[(f"dec{i}", "ln1", "scale")] = (
            f"{d}.layer.0.layer_norm.weight", _id)
        rules[(f"dec{i}", "ln2", "scale")] = (
            f"{d}.layer.1.layer_norm.weight", _id)
        for nm in ("wi_0", "wi_1", "wo"):
            rules[(f"dec{i}", "ffn", nm, "kernel")] = (
                f"{d}.layer.2.DenseReluDense.{nm}.weight", _t)
        rules[(f"dec{i}", "ln3", "scale")] = (
            f"{d}.layer.2.layer_norm.weight", _id)
    return rules


def jlm_rules(n_layers: int = 12) -> dict[tuple, tuple]:
    rules: dict[tuple, tuple] = {
        ("structure_embed", "embedding"):
            ("structure_embed_tokens.weight", _id),
        ("seq_adapter", "kernel"): ("sequence_adapation_layer.weight", _t),
        ("struct_adapter", "kernel"): ("structure_adapation_layer.weight", _t),
        ("sequence_head", "kernel"): ("sequence_head.weight", _t),
        ("structure_head", "kernel"): ("structure_head.weight", _t),
        ("wpe", "embedding"): ("wpe.weight", _id),
        ("ln_f", "scale"): ("ln_f.weight", _id),
        ("ln_f", "bias"): ("ln_f.bias", _id),
        ("sep_token",): ("sep_token", _id),
        # HF GPT-2 token-type embeddings are wte rows; extract the 2 used
        ("token_type", "embedding"): ("wte.weight", lambda w: np.asarray(w)[:2]),
    }
    for i in range(n_layers):
        h = f"h.{i}"
        rules[(f"block{i}", "ln1", "scale")] = (f"{h}.ln_1.weight", _id)
        rules[(f"block{i}", "ln1", "bias")] = (f"{h}.ln_1.bias", _id)
        rules[(f"block{i}", "ln2", "scale")] = (f"{h}.ln_2.weight", _id)
        rules[(f"block{i}", "ln2", "bias")] = (f"{h}.ln_2.bias", _id)
        # GPT-2 Conv1D weights are already (in, out)
        rules[(f"block{i}", "qkv", "kernel")] = (f"{h}.attn.c_attn.weight", _id)
        rules[(f"block{i}", "qkv", "bias")] = (f"{h}.attn.c_attn.bias", _id)
        rules[(f"block{i}", "attn_out", "kernel")] = (
            f"{h}.attn.c_proj.weight", _id)
        rules[(f"block{i}", "attn_out", "bias")] = (
            f"{h}.attn.c_proj.bias", _id)
        rules[(f"block{i}", "mlp_up", "kernel")] = (f"{h}.mlp.c_fc.weight", _id)
        rules[(f"block{i}", "mlp_up", "bias")] = (f"{h}.mlp.c_fc.bias", _id)
        rules[(f"block{i}", "mlp_down", "kernel")] = (
            f"{h}.mlp.c_proj.weight", _id)
        rules[(f"block{i}", "mlp_down", "bias")] = (
            f"{h}.mlp.c_proj.bias", _id)
    return rules


def convert_clm(template_params, state_dict, n_layers: int = 12,
                strict: bool = False, key_overrides=None):
    from .torch_to_jax import convert_params

    return convert_params(template_params, state_dict, clm_rules(n_layers),
                          key_overrides=key_overrides, strict=strict)


def convert_jlm(template_params, state_dict, n_layers: int = 12,
                strict: bool = False, key_overrides=None):
    from .torch_to_jax import convert_params

    return convert_params(template_params, state_dict, jlm_rules(n_layers),
                          key_overrides=key_overrides, strict=strict)
