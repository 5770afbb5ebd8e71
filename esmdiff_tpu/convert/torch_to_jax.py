"""PyTorch -> JAX checkpoint conversion.

Converts ESM3-family torch state_dicts into this framework's param pytrees:
the pretrained trunk (esm3_sm_open_v1), the VQ-VAE encoder/decoder, and the
ESMDiff fine-tune checkpoints in the layouts the reference produces
(slm/utils/checkpoint_utils.py:7-75): plain ``state_dict`` with a ``net.``
prefix, and DeepSpeed-consolidated ``mp_rank_00_model_states.pt`` with a
``module`` key.

Design: the converter walks the *JAX* parameter template (so nothing is
silently dropped), derives the torch key for each leaf from declarative rules,
and applies per-kind transforms (Dense kernels transposed; scanned layer
stacks gathered from per-layer torch tensors).  Keys with no rule raise, and
``strict=False`` collects a report instead.

Note: exact upstream tensor names were derived from the esm package's public
module structure; ``KEY_OVERRIDES`` exists so any naming drift in a given
checkpoint can be patched without touching code.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


# ---------------------------------------------------------------------------
# state_dict loading / unwrapping
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """torch.load + layout unwrap + numpy-ify.  Handles the three layouts the
    reference loads (checkpoint_utils.py:21-31,46-64)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "module" in obj and isinstance(
            obj["module"], dict):
        obj = obj["module"]  # DeepSpeed consolidated
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]  # Lightning .ckpt
    out = {}
    for k, v in obj.items():
        if not hasattr(v, "detach"):
            continue
        k = re.sub(r"^(_forward_module\.)", "", k)
        k = re.sub(r"^(module\.)", "", k)
        k = re.sub(r"^(model\.)", "", k)
        out[k] = v.detach().float().cpu().numpy()
    return out


def strip_prefix(sd: dict, prefix: str) -> dict:
    return {
        k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
    }


# ---------------------------------------------------------------------------
# leaf transforms
# ---------------------------------------------------------------------------

def _t(x):  # torch Linear weight (out, in) -> flax kernel (in, out)
    return np.ascontiguousarray(x.T)


def _id(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# trunk rules: jax param path (tuple of str) -> (torch key, transform)
# '{i}' marks the scanned-layer stack dimension.
# ---------------------------------------------------------------------------

ENCODER_RULES = {
    ("encoder", "sequence_embed", "embedding"):
        ("encoder.sequence_embedding.weight", _id),
    ("encoder", "structure_tokens_embed", "embedding"):
        ("encoder.structure_tokens_embedding.weight", _id),
    ("encoder", "ss8_embed", "embedding"):
        ("encoder.ss8_embedding.weight", _id),
    ("encoder", "sasa_embed", "embedding"):
        ("encoder.sasa_embedding.weight", _id),
    ("encoder", "average_plddt_proj", "kernel"):
        ("encoder.plddt_projection.weight", _t),
    ("encoder", "per_res_plddt_proj", "kernel"):
        ("encoder.structure_per_res_plddt_projection.weight", _t),
    ("encoder", "function_embed", "embedding"):
        ("encoder.function_embeddings.weight", _id),
    ("encoder", "residue_embed", "embedding"):
        ("encoder.residue_embedding.weight", _id),
}


def _block_rules(torch_prefix: str):
    """Per-transformer-block mapping, torch names relative to the block."""
    return {
        ("attn", "ln", "scale"): (f"{torch_prefix}.attn.layernorm_qkv.0.weight", _id),
        ("attn", "qkv", "kernel"): (f"{torch_prefix}.attn.layernorm_qkv.1.weight", _t),
        ("attn", "q_ln", "scale"): (f"{torch_prefix}.attn.q_ln.weight", _id),
        ("attn", "k_ln", "scale"): (f"{torch_prefix}.attn.k_ln.weight", _id),
        ("attn", "out", "kernel"): (f"{torch_prefix}.attn.out_proj.weight", _t),
        ("ffn", "ln", "scale"): (f"{torch_prefix}.ffn.0.weight", _id),
        ("ffn", "up", "kernel"): (f"{torch_prefix}.ffn.1.weight", _t),
        ("ffn", "down", "kernel"): (f"{torch_prefix}.ffn.3.weight", _t),
    }


def _geom_rules(torch_prefix: str):
    return {
        ("geom_attn", "ln", "scale"): (f"{torch_prefix}.geom_attn.s_norm.weight", _id),
        ("geom_attn", "proj", "kernel"): (f"{torch_prefix}.geom_attn.proj.weight", _t),
        ("geom_attn", "out", "kernel"): (f"{torch_prefix}.geom_attn.out_proj.weight", _t),
        ("geom_attn", "distance_scale"):
            (f"{torch_prefix}.geom_attn.distance_scale_per_head", _id),
        ("geom_attn", "rotation_scale"):
            (f"{torch_prefix}.geom_attn.rotation_scale_per_head", _id),
    }


def _regression_head_rules(jax_prefix: tuple, torch_prefix: str):
    return {
        jax_prefix + ("dense", "kernel"): (f"{torch_prefix}.0.weight", _t),
        jax_prefix + ("dense", "bias"): (f"{torch_prefix}.0.bias", _id),
        jax_prefix + ("ln", "scale"): (f"{torch_prefix}.2.weight", _id),
        jax_prefix + ("ln", "bias"): (f"{torch_prefix}.2.bias", _id),
        jax_prefix + ("out", "kernel"): (f"{torch_prefix}.3.weight", _t),
        jax_prefix + ("out", "bias"): (f"{torch_prefix}.3.bias", _id),
    }


def trunk_rules(n_layers: int, n_layers_geom: int = 1,
                head_type: str = "esm3"):
    """Full rule set for an ESM3 trunk param pytree (scan layout)."""
    rules: dict[tuple, tuple] = {}
    rules.update(ENCODER_RULES)
    for i in range(n_layers_geom):
        prefix = f"transformer.blocks.{i}"
        for k, v in _block_rules(prefix).items():
            rules[("transformer", f"block{i}") + k] = v
        for k, v in _geom_rules(prefix).items():
            rules[("transformer", f"block{i}") + k] = v
    # scanned stack: '{i}' placeholder expanded at conversion time
    for k, v in _block_rules(
            "transformer.blocks.{i}").items():
        rules[("transformer", "blocks", "block") + k] = (v[0], v[1], "stack")
    rules[("transformer", "norm", "scale")] = ("transformer.norm.weight", _id)

    heads = {
        "sequence_head": "output_heads.sequence_head",
        "structure_head": "output_heads.structure_head",
        "ss8_head": "output_heads.ss8_head",
        "sasa_head": "output_heads.sasa_head",
        "function_head": "output_heads.function_head",
        "residue_head": "output_heads.residue_head",
    }
    if head_type == "structure":
        heads = {
            "structure_head": "output_heads.structure_head",
            "sequence_head": "output_heads.sequence_head",
        }
    for jax_name, torch_name in heads.items():
        rules.update(_regression_head_rules(
            ("output_heads", jax_name), torch_name))
    return rules


# ---------------------------------------------------------------------------
# VQ-VAE rules
# ---------------------------------------------------------------------------

def vqvae_decoder_rules(n_layers: int = 30):
    """StructureTokenDecoder params (models/vqvae.py): embed, 30-layer stack
    (scan layout), 6D-rot affine head, pLDDT head."""
    rules: dict[tuple, tuple] = {
        ("embed", "embedding"): ("embed.weight", _id),
        ("decoder_stack", "norm", "scale"):
            ("decoder_stack.norm.weight", _id),
        ("affine_output_projection", "ffn1", "kernel"):
            ("affine_output_projection.ffn1.weight", _t),
        ("affine_output_projection", "ffn1", "bias"):
            ("affine_output_projection.ffn1.bias", _id),
        ("affine_output_projection", "ln", "scale"):
            ("affine_output_projection.norm.weight", _id),
        ("affine_output_projection", "ln", "bias"):
            ("affine_output_projection.norm.bias", _id),
        ("affine_output_projection", "proj", "kernel"):
            ("affine_output_projection.proj.weight", _t),
        ("affine_output_projection", "proj", "bias"):
            ("affine_output_projection.proj.bias", _id),
    }
    for k, v in _block_rules("decoder_stack.blocks.{i}").items():
        rules[("decoder_stack", "blocks", "block") + k] = (v[0], v[1], "stack")
    rules.update(_regression_head_rules(("plddt_head",), "plddt_head"))
    # pae q/k are this framework's low-rank factorization (no torch source)
    return rules


def vqvae_encoder_rules(n_layers: int = 2):
    """StructureTokenEncoder params: relative-position table, 2-layer
    geometric stack (unrolled), pre-VQ projection, codebook."""
    rules: dict[tuple, tuple] = {
        ("relative_position_embed", "embedding"):
            ("relative_positional_embedding.embedding.weight", _id),
        ("pre_vq_proj", "kernel"): ("pre_vq_proj.weight", _t),
        ("pre_vq_proj", "bias"): ("pre_vq_proj.bias", _id),
        ("codebook",): ("codebook.embeddings", _id),
        ("transformer", "norm", "scale"): ("transformer.norm.weight", _id),
    }
    for i in range(n_layers):
        prefix = f"transformer.blocks.{i}"
        for k, v in _block_rules(prefix).items():
            rules[("transformer", f"block{i}") + k] = v
        if i == 0:
            for k, v in _geom_rules(prefix).items():
                rules[("transformer", f"block{i}") + k] = v
    return rules


def convert_vqvae_decoder(template_params, state_dict, n_layers: int = 30,
                          strict: bool = False, key_overrides=None):
    return convert_params(
        template_params, state_dict, vqvae_decoder_rules(n_layers),
        n_scan_layers=n_layers, scan_layer_offset=0,
        key_overrides=key_overrides, strict=strict)


def convert_vqvae_encoder(template_params, state_dict, n_layers: int = 2,
                          strict: bool = False, key_overrides=None):
    return convert_params(
        template_params, state_dict, vqvae_encoder_rules(n_layers),
        key_overrides=key_overrides, strict=strict)


def function_decoder_rules(n_layers: int = 3):
    """FunctionTokenDecoder params (models/function_decoder.py): depth-offset
    token embedding, small unrolled stack, InterPro/keyword regression heads.
    (Fills the ESM3_function_decoder_v0 loading slot, reference
    slm/models/net.py:27,350; real-checkpoint name drift is absorbed by the
    key_overrides hook like every other component.)"""
    rules: dict[tuple, tuple] = {
        ("embed", "embedding"): ("embedding.weight", _id),
        ("decoder", "norm", "scale"): ("decoder.norm.weight", _id),
    }
    for i in range(n_layers):
        for k, v in _block_rules(f"decoder.blocks.{i}").items():
            rules[("decoder", f"block{i}") + k] = v
    rules.update(_regression_head_rules(
        ("interpro_head",), "heads.interpro_logits"))
    rules.update(_regression_head_rules(
        ("keyword_head",), "heads.keyword_logits"))
    return rules


def convert_function_decoder(template_params, state_dict, n_layers: int = 3,
                             strict: bool = False, key_overrides=None):
    return convert_params(
        template_params, state_dict, function_decoder_rules(n_layers),
        key_overrides=key_overrides, strict=strict)


# ---------------------------------------------------------------------------
# conversion driver
# ---------------------------------------------------------------------------

def convert_params(
    template_params: Any,
    state_dict: dict[str, np.ndarray],
    rules: dict[tuple, tuple],
    n_scan_layers: int = 0,
    scan_layer_offset: int = 1,
    key_overrides: dict[str, str] | None = None,
    value_transforms: dict[str, Any] | None = None,
    strict: bool = True,
):
    """Fill a jax param template from a torch state_dict using ``rules``.

    key_overrides: torch-key renames for checkpoint naming drift.
    value_transforms: {torch_key: fn(array)->array} applied BEFORE the rule's
    layout transform — the hook for channel-order permutations (e.g. the
    geometric-attention projection packing, see ROUND1_NOTES.md).
    Returns (params, report) where report lists unmapped/missing keys.
    """
    import flax

    key_overrides = key_overrides or {}
    value_transforms = value_transforms or {}

    def fetch(tkey):
        arr = state_dict[tkey]
        vt = value_transforms.get(tkey)
        return vt(arr) if vt is not None else arr
    flat = flax.traverse_util.flatten_dict(template_params)
    out = {}
    missing, unmapped = [], []
    for path, tmpl in flat.items():
        rule = rules.get(tuple(path))
        if rule is None:
            unmapped.append("/".join(path))
            out[path] = tmpl
            continue
        if len(rule) == 3 and rule[2] == "stack":
            tkey_tmpl, tf, _ = rule
            layers = []
            ok = True
            for i in range(n_scan_layers):
                tkey = tkey_tmpl.format(i=i + scan_layer_offset)
                tkey = key_overrides.get(tkey, tkey)
                if tkey not in state_dict:
                    missing.append(tkey)
                    ok = False
                    break
                layers.append(tf(fetch(tkey)))
            arr = np.stack(layers) if ok else tmpl
        else:
            tkey, tf = rule
            tkey = key_overrides.get(tkey, tkey)
            if tkey not in state_dict:
                missing.append(tkey)
                arr = tmpl
            else:
                arr = tf(fetch(tkey))
        if np.shape(arr) != np.shape(tmpl):
            raise ValueError(
                f"shape mismatch for {'/'.join(path)}: torch {np.shape(arr)} "
                f"vs template {np.shape(tmpl)}")
        out[path] = np.asarray(arr, dtype=np.asarray(tmpl).dtype)
    report = {"missing": missing, "unmapped": unmapped}
    if strict and (missing or unmapped):
        raise KeyError(f"conversion incomplete: {report}")
    return flax.traverse_util.unflatten_dict(out), report


def convert_trunk(template_params, state_dict, cfg, strict: bool = True,
                  key_overrides=None):
    rules = trunk_rules(cfg.n_layers, cfg.n_layers_geom, cfg.head_type)
    return convert_params(
        template_params, state_dict, rules,
        n_scan_layers=cfg.n_layers - cfg.n_layers_geom,
        scan_layer_offset=cfg.n_layers_geom,
        key_overrides=key_overrides, strict=strict,
    )


# ---------------------------------------------------------------------------
# inverse direction (for tests and for exporting to torch-compatible dumps)
# ---------------------------------------------------------------------------

def export_torch_state_dict(params, rules, n_scan_layers: int = 0,
                            scan_layer_offset: int = 1):
    """Inverse of convert_params: produce a torch-layout dict from jax params.
    Uses the same rules; transforms are involutions (transpose) so they invert
    themselves."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    sd = {}
    for path, arr in flat.items():
        rule = rules.get(tuple(path))
        if rule is None:
            continue
        arr = np.asarray(arr, dtype=np.float32)
        if len(rule) == 3 and rule[2] == "stack":
            tkey_tmpl, tf, _ = rule
            for i in range(n_scan_layers):
                sd[tkey_tmpl.format(i=i + scan_layer_offset)] = tf(arr[i])
        else:
            tkey, tf = rule
            sd[tkey] = tf(arr)
    return sd
