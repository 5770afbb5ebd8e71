"""Per-layer activation-diff verification of the torch->jax conversion.

Real checkpoints were never available in this environment (ROUND1_NOTES #1),
so the converter must be verifiable the day they arrive.  This module makes
real-weight day a *verification run*, not a debugging session:

  - ``make_reference_trunk_state_dict`` synthesizes a state_dict whose keys
    and shapes mirror the public esm-3.0.4 module tree that the reference
    loads (slm/models/net.py:358-361, slm/utils/checkpoint_utils.py:41-75).
    It is written INDEPENDENTLY of convert.torch_to_jax's rule table, so any
    naming drift between the two shows up as missing/unmapped keys.
  - A pure-torch oracle re-implements each trunk layer's math directly from
    the state_dict tensors (LN+QKV packing, QK-layernorm, rotary, SwiGLU,
    geometric attention, regression heads).  ``verify_trunk`` feeds the same
    probe activations through the torch oracle and through this framework's
    JAX modules loaded with the CONVERTED params, and reports per-layer
    max-abs diffs — any layout/permutation error in conversion (transposes,
    stacking order, channel packing) explodes the diff at the offending
    layer.

CLI:  python -m esmdiff_tpu.convert.verify <ckpt.pt>  [--layers 0:4]
      python -m esmdiff_tpu.convert.verify --fixture   (self-check)
"""

from __future__ import annotations

import argparse
import math

import numpy as np

from esmdiff_tpu.core import constants as C

PROBE_B, PROBE_L = 2, 16


def _record_into(rows):
    """Shared row recorder for every verify_* report (one metric definition
    for all components)."""
    def record(name, jax_out, torch_out):
        a = np.asarray(jax_out, np.float32)
        b = torch_out.detach().numpy() if hasattr(torch_out, "detach") \
            else np.asarray(torch_out, np.float32)
        d = float(np.max(np.abs(a - b)))
        rows.append({"layer": name, "max_abs_diff": d,
                     "rel_diff": d / max(1e-12, float(np.max(np.abs(b))))})
    return record



# ---------------------------------------------------------------------------
# reference-layout synthetic state_dict (public esm-3.0.4 module tree)
# ---------------------------------------------------------------------------

def _trunk_tensor_specs(cfg) -> dict[str, tuple]:
    """name -> shape, following the esm-3.0.4 ESM3 module tree."""
    d = cfg.d_model
    h = cfg.ffn_hidden
    H = cfg.v_heads
    specs: dict[str, tuple] = {
        "encoder.sequence_embedding.weight": (C.SEQUENCE_EMBED_SIZE, d),
        "encoder.structure_tokens_embedding.weight":
            (C.STRUCTURE_VOCAB_SIZE, d),
        "encoder.ss8_embedding.weight": (C.SS8_VOCAB_SIZE, d),
        "encoder.sasa_embedding.weight": (C.SASA_VOCAB_SIZE, d),
        "encoder.plddt_projection.weight": (d, 16),
        "encoder.structure_per_res_plddt_projection.weight": (d, 16),
        "encoder.function_embeddings.weight":
            (C.FUNCTION_VOCAB_SIZE * C.FUNCTION_TOKEN_DEPTH,
             d // C.FUNCTION_TOKEN_DEPTH),
        "encoder.residue_embedding.weight":
            (C.RESIDUE_ANNOTATION_VOCAB_SIZE, d),
        "transformer.norm.weight": (d,),
    }
    for i in range(cfg.n_layers):
        p = f"transformer.blocks.{i}"
        specs.update({
            f"{p}.attn.layernorm_qkv.0.weight": (d,),
            f"{p}.attn.layernorm_qkv.1.weight": (3 * d, d),
            f"{p}.attn.q_ln.weight": (d,),
            f"{p}.attn.k_ln.weight": (d,),
            f"{p}.attn.out_proj.weight": (d, d),
            f"{p}.ffn.0.weight": (d,),
            f"{p}.ffn.1.weight": (2 * h, d),
            f"{p}.ffn.3.weight": (d, h),
        })
        if i < cfg.n_layers_geom:
            specs.update({
                f"{p}.geom_attn.s_norm.weight": (d,),
                f"{p}.geom_attn.proj.weight": (H * 15, d),
                f"{p}.geom_attn.out_proj.weight": (d, H * 3),
                f"{p}.geom_attn.distance_scale_per_head": (H,),
                f"{p}.geom_attn.rotation_scale_per_head": (H,),
            })
    head_names = (
        ["sequence_head", "structure_head", "ss8_head", "sasa_head",
         "function_head", "residue_head"]
        if cfg.head_type == "esm3" else ["structure_head", "sequence_head"])
    head_dims = {
        "sequence_head": 64, "structure_head":
            C.VQVAE_CODEBOOK_SIZE if cfg.head_type == "esm3"
            else cfg.n_structure_heads,
        "ss8_head": C.SS8_VOCAB_SIZE, "sasa_head": C.SASA_VOCAB_SIZE,
        "function_head": C.FUNCTION_VOCAB_SIZE * C.FUNCTION_TOKEN_DEPTH,
        "residue_head": C.RESIDUE_ANNOTATION_VOCAB_SIZE,
    }
    if cfg.head_type == "structure":
        head_dims["sequence_head"] = cfg.n_sequence_heads or 33
    for name in head_names:
        if cfg.head_type == "structure" and name == "sequence_head" \
                and not cfg.n_sequence_heads:
            continue
        out = head_dims[name]
        p = f"output_heads.{name}"
        specs.update({
            f"{p}.0.weight": (d, d), f"{p}.0.bias": (d,),
            f"{p}.2.weight": (d,), f"{p}.2.bias": (d,),
            f"{p}.3.weight": (out, d), f"{p}.3.bias": (out,),
        })
    return specs


def make_reference_trunk_state_dict(cfg, seed: int = 0,
                                    scale: float = 0.05) -> dict:
    """Random-valued state_dict in the reference layout (numpy arrays)."""
    rng = np.random.RandomState(seed)
    sd = {}
    for name, shape in _trunk_tensor_specs(cfg).items():
        if name.endswith((".0.weight", "norm.weight", "q_ln.weight",
                          "k_ln.weight", "s_norm.weight", ".2.weight")) \
                and len(shape) == 1:
            arr = 1.0 + rng.randn(*shape) * 0.02  # LN scales near 1
        else:
            arr = rng.randn(*shape) * scale
        sd[name] = arr.astype(np.float32)
    return sd


# ---------------------------------------------------------------------------
# torch oracle (layer math straight from state_dict tensors)
# ---------------------------------------------------------------------------

def _oracle_ln(x, weight, eps=1e-5):
    import torch

    mean = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=False, keepdim=True)
    return (x - mean) * torch.rsqrt(var + eps) * weight


def _oracle_rotary(x, base=10000.0):
    """x: (B, L, H, Dh) torch tensor; GPT-NeoX half rotation."""
    import torch

    B, L, H, Dh = x.shape
    half = Dh // 2
    inv = 1.0 / (base ** (torch.arange(half, dtype=torch.float32) / half))
    freqs = torch.arange(L, dtype=torch.float32)[:, None] * inv[None]
    emb = torch.cat([freqs, freqs], dim=-1)
    cos = torch.cos(emb)[None, :, None, :]
    sin = torch.sin(emb)[None, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    rot = torch.cat([-x2, x1], dim=-1)
    return x * cos + rot * sin


def oracle_block(sd: dict, prefix: str, x, n_heads: int, scale: float):
    """One pre-norm trunk block (attention + SwiGLU) in torch, full-length
    (no masking) — mirrors esm's UnifiedTransformerBlock math."""
    import torch

    t = lambda k: torch.as_tensor(np.asarray(sd[k]), dtype=torch.float32)
    B, L, D = x.shape
    dh = D // n_heads
    h = _oracle_ln(x, t(f"{prefix}.attn.layernorm_qkv.0.weight"))
    qkv = h @ t(f"{prefix}.attn.layernorm_qkv.1.weight").T
    q, k, v = qkv.chunk(3, dim=-1)
    q = _oracle_ln(q, t(f"{prefix}.attn.q_ln.weight"))
    k = _oracle_ln(k, t(f"{prefix}.attn.k_ln.weight"))
    q = q.reshape(B, L, n_heads, dh)
    k = k.reshape(B, L, n_heads, dh)
    v = v.reshape(B, L, n_heads, dh)
    q = _oracle_rotary(q)
    k = _oracle_rotary(k)
    logits = torch.einsum("blhd,bmhd->bhlm", q, k) / math.sqrt(dh)
    probs = torch.softmax(logits, dim=-1)
    o = torch.einsum("bhlm,bmhd->blhd", probs, v).reshape(B, L, D)
    attn_out = o @ t(f"{prefix}.attn.out_proj.weight").T
    x = x + attn_out / scale
    h = _oracle_ln(x, t(f"{prefix}.ffn.0.weight"))
    up = h @ t(f"{prefix}.ffn.1.weight").T
    a, b = up.chunk(2, dim=-1)
    ff = (torch.nn.functional.silu(a) * b) @ t(f"{prefix}.ffn.3.weight").T
    return x + ff / scale


def oracle_geom_attn(sd: dict, prefix: str, x, rot, trans, affine_mask,
                     v_heads: int):
    """Geometric attention oracle (per-head [qr|kr|qd|kd|val] packing; see
    ROUND1_NOTES #1 — real checkpoints may permute this, which the
    value_transforms hook un-permutes; this oracle pins the FRAMEWORK's
    expected packing so conversion-layer errors are visible)."""
    import torch

    t = lambda k: torch.as_tensor(np.asarray(sd[k]), dtype=torch.float32)
    B, L, D = x.shape
    H = v_heads
    ns = _oracle_ln(x, t(f"{prefix}.geom_attn.s_norm.weight"))
    proj = (ns @ t(f"{prefix}.geom_attn.proj.weight").T).reshape(B, L, H, 15)
    qr, kr, qd, kd, val = torch.split(proj, [3, 3, 3, 3, 3], dim=-1)

    def _r(vv):
        return torch.einsum("blij,blhj->blhi", rot, vv)

    qr_g, kr_g, val_g = _r(qr), _r(kr), _r(val)
    qd_g = _r(qd) + trans[:, :, None]
    kd_g = _r(kd) + trans[:, :, None]
    rs = torch.nn.functional.softplus(
        t(f"{prefix}.geom_attn.rotation_scale_per_head"))
    ds = torch.nn.functional.softplus(
        t(f"{prefix}.geom_attn.distance_scale_per_head"))
    rot_term = torch.einsum("blhc,bmhc->bhlm", qr_g, kr_g) / math.sqrt(3.0)
    diff = qd_g[:, :, None] - kd_g[:, None, :]          # (B, L, L, H, 3)
    dist = torch.sqrt((diff * diff).sum(-1).clamp_min(1e-8))
    dist = dist.permute(0, 3, 1, 2)
    logits = rot_term * rs[None, :, None, None] - dist * ds[None, :, None, None]
    allow = affine_mask[:, None, None, :]
    logits = logits.masked_fill(~allow, -1e9)
    probs = torch.softmax(logits, dim=-1)
    o_g = torch.einsum("bhlm,bmhc->blhc", probs, val_g)
    o_local = torch.einsum("blji,blhj->blhi", rot, o_g).reshape(B, L, H * 3)
    out = o_local @ t(f"{prefix}.geom_attn.out_proj.weight").T
    return out * affine_mask[..., None]


def oracle_regression_head(sd: dict, prefix: str, x):
    import torch

    t = lambda k: torch.as_tensor(np.asarray(sd[k]), dtype=torch.float32)
    h = x @ t(f"{prefix}.0.weight").T + t(f"{prefix}.0.bias")
    h = torch.nn.functional.gelu(h)
    h = _oracle_ln(h, t(f"{prefix}.2.weight")) + t(f"{prefix}.2.bias")
    return h @ t(f"{prefix}.3.weight").T + t(f"{prefix}.3.bias")


# ---------------------------------------------------------------------------
# verification driver
# ---------------------------------------------------------------------------

def verify_trunk(state_dict: dict, cfg=None, layers: slice | None = None,
                 key_overrides=None, value_transforms=None,
                 probe_seed: int = 7) -> list[dict]:
    """Convert ``state_dict`` and diff every trunk layer against the torch
    oracle on a fixed probe batch.  Returns rows of
    {layer, max_abs_diff, rel_diff}; prints a report."""
    import jax
    import jax.numpy as jnp
    import torch

    from esmdiff_tpu.models.esm3 import ESM3, ESM3Config, TransformerBlock
    from esmdiff_tpu.nn.geometric import Affine3D
    from esmdiff_tpu.nn.rotary import rotary_tables
    from .torch_to_jax import convert_params, trunk_rules

    if cfg is None:
        cfg = ESM3Config()
    # fp32 throughout: the diff must reflect layout errors, not bf16 noise
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32",
                       "param_dtype": "float32"})
    net = ESM3(cfg)
    seq = jnp.zeros((1, 8), jnp.int32)
    coords = jnp.zeros((1, 8, 3, 3), jnp.float32)
    template = jax.jit(lambda k: net.init(
        k, sequence_tokens=seq, structure_coords=coords))(
        jax.random.PRNGKey(0))["params"]

    # canonical view: overrides renamed back, value_transforms applied, any
    # still-missing canonical key zero-filled (so the oracle produces a DIFF
    # for drifted checkpoints instead of crashing)
    canon = dict(state_dict)
    for canonical, actual in (key_overrides or {}).items():
        if actual in canon:
            canon[canonical] = canon[actual]
    for key, vt in (value_transforms or {}).items():
        if key in canon:
            canon[key] = vt(canon[key])
    missing_canonical = [
        name for name in _trunk_tensor_specs(cfg) if name not in canon]
    for name in missing_canonical:
        canon[name] = np.zeros(_trunk_tensor_specs(cfg)[name], np.float32)
    state_dict = canon

    rules = trunk_rules(cfg.n_layers, cfg.n_layers_geom, cfg.head_type)
    params, report = convert_params(
        template, state_dict, rules,
        n_scan_layers=cfg.n_layers - cfg.n_layers_geom,
        scan_layer_offset=cfg.n_layers_geom,
        strict=False)
    report["missing"] = sorted(set(report["missing"]) | set(missing_canonical))
    if report["missing"]:
        print(f"[verify] MISSING torch keys ({len(report['missing'])}): "
              + ", ".join(report["missing"][:8])
              + (" ..." if len(report["missing"]) > 8 else ""))
    if report["unmapped"]:
        print(f"[verify] unmapped jax leaves ({len(report['unmapped'])}): "
              + ", ".join(report["unmapped"][:8])
              + (" ..." if len(report["unmapped"]) > 8 else ""))

    rng = np.random.RandomState(probe_seed)
    x_np = rng.randn(PROBE_B, PROBE_L, cfg.d_model).astype(np.float32)
    scale = cfg.residue_scaling_factor
    rot_cos, rot_sin = rotary_tables(PROBE_L, cfg.d_model // cfg.n_heads)

    layer_range = range(cfg.n_layers)
    if layers is not None:
        layer_range = layer_range[layers]

    rows = []

    record = _record_into(rows)

    # frames for the geometric block probe
    bb = rng.randn(PROBE_B, PROBE_L, 3, 3).astype(np.float32) * 3.0
    from esmdiff_tpu.nn.geometric import build_affine3d_from_coordinates

    affine, affine_mask = build_affine3d_from_coordinates(jnp.asarray(bb))

    for i in layer_range:
        x = jnp.asarray(x_np)
        xt = torch.as_tensor(x_np)
        if i < cfg.n_layers_geom:
            blk_params = params["transformer"][f"block{i}"]
            block = TransformerBlock(cfg, use_geom_attn=True)
            jax_out = block.apply({"params": blk_params}, x, rot_cos,
                                  rot_sin, None, affine=affine,
                                  affine_mask=affine_mask)
            p = f"transformer.blocks.{i}"
            t_out = _oracle_block_with_geom(
                state_dict, p, xt, cfg, scale,
                torch.as_tensor(np.asarray(affine.rot)),
                torch.as_tensor(np.asarray(affine.trans)),
                torch.as_tensor(np.asarray(affine_mask)))
            record(f"block{i}(geom)", jax_out, t_out)
        else:
            idx = i - cfg.n_layers_geom
            blk_params = jax.tree.map(
                lambda a: a[idx],
                params["transformer"]["blocks"]["block"])
            block = TransformerBlock(cfg, use_geom_attn=False)
            jax_out = block.apply({"params": blk_params}, x, rot_cos,
                                  rot_sin, None)
            t_out = oracle_block(state_dict, f"transformer.blocks.{i}", xt,
                                 cfg.n_heads, scale)
            record(f"block{i}", jax_out, t_out)

    # final norm + structure head
    from esmdiff_tpu.nn.layers import LayerNorm, RegressionHead

    ln_out = LayerNorm().apply(
        {"params": params["transformer"]["norm"]}, jnp.asarray(x_np))
    t_ln = _oracle_ln(torch.as_tensor(x_np), torch.as_tensor(
        np.asarray(state_dict["transformer.norm.weight"])))
    record("final_norm", ln_out, t_ln)

    head_key = "structure_head"
    if head_key in params["output_heads"]:
        n_out = params["output_heads"][head_key]["out"]["kernel"].shape[-1]
        head = RegressionHead(n_out, dtype=jnp.float32)
        h_out = head.apply(
            {"params": params["output_heads"][head_key]}, jnp.asarray(x_np))
        t_h = oracle_regression_head(
            state_dict, f"output_heads.{head_key}", torch.as_tensor(x_np))
        record(head_key, h_out, t_h)

    print(f"{'layer':<18} {'max_abs_diff':>14} {'rel_diff':>12}")
    worst = 0.0
    for r in rows:
        print(f"{r['layer']:<18} {r['max_abs_diff']:>14.3e} "
              f"{r['rel_diff']:>12.3e}")
        worst = max(worst, r["rel_diff"])
    verdict = "OK" if worst < 1e-4 and not report["missing"] else "MISMATCH"
    print(f"[verify] worst rel diff {worst:.3e}, "
          f"{len(report['missing'])} missing keys -> {verdict}")
    return rows


def _oracle_block_with_geom(sd, prefix, x, cfg, scale, rot, trans, mask):
    """Geometric block oracle: attn residual -> geom residual -> ffn."""
    import torch

    t = lambda k: torch.as_tensor(np.asarray(sd[k]), dtype=torch.float32)
    B, L, D = x.shape
    n_heads = cfg.n_heads
    dh = D // n_heads
    h = _oracle_ln(x, t(f"{prefix}.attn.layernorm_qkv.0.weight"))
    qkv = h @ t(f"{prefix}.attn.layernorm_qkv.1.weight").T
    q, k, v = qkv.chunk(3, dim=-1)
    q = _oracle_ln(q, t(f"{prefix}.attn.q_ln.weight")).reshape(
        B, L, n_heads, dh)
    k = _oracle_ln(k, t(f"{prefix}.attn.k_ln.weight")).reshape(
        B, L, n_heads, dh)
    v = v.reshape(B, L, n_heads, dh)
    q, k = _oracle_rotary(q), _oracle_rotary(k)
    logits = torch.einsum("blhd,bmhd->bhlm", q, k) / math.sqrt(dh)
    probs = torch.softmax(logits, dim=-1)
    o = torch.einsum("bhlm,bmhd->blhd", probs, v).reshape(B, L, D)
    x = x + (o @ t(f"{prefix}.attn.out_proj.weight").T) / scale
    x = x + oracle_geom_attn(sd, prefix, x, rot, trans, mask,
                             cfg.v_heads) / scale
    h = _oracle_ln(x, t(f"{prefix}.ffn.0.weight"))
    up = h @ t(f"{prefix}.ffn.1.weight").T
    a, b = up.chunk(2, dim=-1)
    return x + ((torch.nn.functional.silu(a) * b)
                @ t(f"{prefix}.ffn.3.weight").T) / scale


# ---------------------------------------------------------------------------
# VQ-VAE decoder verification (ROUND1_NOTES #2 risk surface)
# ---------------------------------------------------------------------------

def _decoder_tensor_specs(cfg) -> dict[str, tuple]:
    """StructureTokenDecoder tensor names/shapes per the public esm-3.0.4
    module tree (models/vqvae.py geometry)."""
    from esmdiff_tpu.nn.layers import swiglu_hidden_dim

    d = cfg.d_model
    h = swiglu_hidden_dim(d)
    specs: dict[str, tuple] = {
        "embed.weight": (C.STRUCTURE_VOCAB_SIZE, d),
        "decoder_stack.norm.weight": (d,),
        "affine_output_projection.ffn1.weight": (d, d),
        "affine_output_projection.ffn1.bias": (d,),
        "affine_output_projection.norm.weight": (d,),
        "affine_output_projection.norm.bias": (d,),
        "affine_output_projection.proj.weight": (9, d),
        "affine_output_projection.proj.bias": (9,),
        "plddt_head.0.weight": (d, d), "plddt_head.0.bias": (d,),
        "plddt_head.2.weight": (d,), "plddt_head.2.bias": (d,),
        "plddt_head.3.weight": (cfg.plddt_bins, d),
        "plddt_head.3.bias": (cfg.plddt_bins,),
    }
    for i in range(cfg.n_layers):
        p = f"decoder_stack.blocks.{i}"
        specs.update({
            f"{p}.attn.layernorm_qkv.0.weight": (d,),
            f"{p}.attn.layernorm_qkv.1.weight": (3 * d, d),
            f"{p}.attn.q_ln.weight": (d,),
            f"{p}.attn.k_ln.weight": (d,),
            f"{p}.attn.out_proj.weight": (d, d),
            f"{p}.ffn.0.weight": (d,),
            f"{p}.ffn.1.weight": (2 * h, d),
            f"{p}.ffn.3.weight": (d, h),
        })
    return specs


def make_reference_decoder_state_dict(cfg, seed: int = 0,
                                      scale: float = 0.05) -> dict:
    rng = np.random.RandomState(seed)
    sd = {}
    for name, shape in _decoder_tensor_specs(cfg).items():
        if len(shape) == 1 and name.endswith(
                (".0.weight", "norm.weight", "q_ln.weight", "k_ln.weight")):
            arr = 1.0 + rng.randn(*shape) * 0.02
        else:
            arr = rng.randn(*shape) * scale
        sd[name] = arr.astype(np.float32)
    return sd


def _oracle_dim6rot_head(sd: dict, prefix: str, x, trans_scale: float):
    import torch

    from esmdiff_tpu.core import residue_constants as rc

    t = lambda k: torch.as_tensor(np.asarray(sd[k]), dtype=torch.float32)
    h = x @ t(f"{prefix}.ffn1.weight").T + t(f"{prefix}.ffn1.bias")
    h = torch.nn.functional.gelu(h)
    h = _oracle_ln(h, t(f"{prefix}.norm.weight")) + t(f"{prefix}.norm.bias")
    p = h @ t(f"{prefix}.proj.weight").T + t(f"{prefix}.proj.bias")
    v1, v2, trans = p[..., 0:3], p[..., 3:6], p[..., 6:9]
    e1 = v1 / v1.norm(dim=-1, keepdim=True).clamp_min(1e-8)
    u2 = v2 - e1 * (e1 * v2).sum(-1, keepdim=True)
    e2 = u2 / u2.norm(dim=-1, keepdim=True).clamp_min(1e-8)
    e3 = torch.cross(e1, e2, dim=-1)
    rot = torch.stack([e1, e2, e3], dim=-1)
    trans = trans * trans_scale
    ideal = torch.as_tensor(np.stack(
        [rc.IDEALIZED_N, rc.IDEALIZED_CA, rc.IDEALIZED_C]),
        dtype=torch.float32)
    return torch.einsum("...ij,aj->...ai", rot, ideal) + trans[..., None, :]


def verify_vqvae_decoder(state_dict: dict, cfg=None,
                         key_overrides=None, value_transforms=None,
                         probe_seed: int = 7) -> list[dict]:
    """Per-layer activation diff of a converted StructureTokenDecoder."""
    import jax
    import jax.numpy as jnp
    import torch

    from esmdiff_tpu.models.esm3 import TransformerBlock
    from esmdiff_tpu.models.vqvae import (
        Dim6RotStructureHead, DecoderConfig, StructureTokenDecoder)
    from esmdiff_tpu.nn.rotary import rotary_tables
    from .torch_to_jax import convert_vqvae_decoder

    if cfg is None:
        cfg = DecoderConfig()
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32"})
    dec = StructureTokenDecoder(cfg)
    template = jax.jit(lambda k: dec.init(
        k, jnp.zeros((1, 8), jnp.int32)))(jax.random.PRNGKey(0))["params"]

    canon = dict(state_dict)
    for canonical, actual in (key_overrides or {}).items():
        if actual in canon:
            canon[canonical] = canon[actual]
    for key, vt in (value_transforms or {}).items():
        if key in canon:
            canon[key] = vt(canon[key])
    specs = _decoder_tensor_specs(cfg)
    missing_canonical = [n for n in specs if n not in canon]
    for n in missing_canonical:
        canon[n] = np.zeros(specs[n], np.float32)
    state_dict = canon

    params, report = convert_vqvae_decoder(template, state_dict,
                                           n_layers=cfg.n_layers,
                                           strict=False)
    report["missing"] = sorted(
        set(report["missing"]) | set(missing_canonical))
    if report["missing"]:
        print(f"[verify] MISSING torch keys ({len(report['missing'])}): "
              + ", ".join(report["missing"][:8]))

    rng = np.random.RandomState(probe_seed)
    x_np = rng.randn(PROBE_B, PROBE_L, cfg.d_model).astype(np.float32)
    stack_cfg = cfg.stack_config()
    stack_cfg = type(stack_cfg)(**{**stack_cfg.__dict__, "dtype": "float32",
                                   "param_dtype": "float32"})
    scale = stack_cfg.residue_scaling_factor
    rot_cos, rot_sin = rotary_tables(PROBE_L, cfg.d_model // cfg.n_heads)

    rows = []

    record = _record_into(rows)

    blocks = params["decoder_stack"]["blocks"]["block"] \
        if "blocks" in params["decoder_stack"] else None
    for i in range(cfg.n_layers):
        x = jnp.asarray(x_np)
        xt = torch.as_tensor(x_np)
        if blocks is not None:
            blk_params = jax.tree.map(lambda a: a[i], blocks)
        else:
            blk_params = params["decoder_stack"][f"block{i}"]
        block = TransformerBlock(stack_cfg, use_geom_attn=False)
        jax_out = block.apply({"params": blk_params}, x, rot_cos, rot_sin,
                              None)
        t_out = oracle_block(state_dict, f"decoder_stack.blocks.{i}", xt,
                             cfg.n_heads, scale)
        record(f"dec_block{i}", jax_out, t_out)

    head = Dim6RotStructureHead(cfg.d_model, trans_scale=cfg.trans_scale,
                                dtype=jnp.float32)
    bb, _ = head.apply({"params": params["affine_output_projection"]},
                       jnp.asarray(x_np))
    t_bb = _oracle_dim6rot_head(state_dict, "affine_output_projection",
                                torch.as_tensor(x_np), cfg.trans_scale)
    record("dim6rot_head", bb, t_bb)

    t_pl = oracle_regression_head(state_dict, "plddt_head",
                                  torch.as_tensor(x_np))
    from esmdiff_tpu.nn.layers import RegressionHead

    pl = RegressionHead(cfg.plddt_bins, dtype=jnp.float32).apply(
        {"params": params["plddt_head"]}, jnp.asarray(x_np))
    record("plddt_head", pl, t_pl)

    print(f"{'layer':<18} {'max_abs_diff':>14} {'rel_diff':>12}")
    worst = 0.0
    for r in rows:
        print(f"{r['layer']:<18} {r['max_abs_diff']:>14.3e} "
              f"{r['rel_diff']:>12.3e}")
        worst = max(worst, r["rel_diff"])
    verdict = "OK" if worst < 1e-4 and not report["missing"] else "MISMATCH"
    print(f"[verify] decoder worst rel diff {worst:.3e}, "
          f"{len(report['missing'])} missing keys -> {verdict}")
    return rows


# ---------------------------------------------------------------------------
# VQ-VAE encoder verification (ROUND1_NOTES #2 risk surface, encoder half)
# ---------------------------------------------------------------------------

def _encoder_tensor_specs(cfg) -> dict[str, tuple]:
    """StructureTokenEncoder tensor names/shapes per the public esm-3.0.4
    module tree (the converter's vqvae_encoder_rules expectations; drift on
    real checkpoints is remapped via key_overrides)."""
    from esmdiff_tpu.nn.layers import swiglu_hidden_dim

    d = cfg.d_model
    h = swiglu_hidden_dim(d)
    H = cfg.v_heads
    specs: dict[str, tuple] = {
        "relative_positional_embedding.embedding.weight":
            (2 * cfg.rel_pos_bins + 2, d),
        "pre_vq_proj.weight": (cfg.d_out, d),
        "pre_vq_proj.bias": (cfg.d_out,),
        "codebook.embeddings": (cfg.n_codes, cfg.d_out),
        "transformer.norm.weight": (d,),
    }
    for i in range(cfg.n_layers):
        p = f"transformer.blocks.{i}"
        specs.update({
            f"{p}.attn.layernorm_qkv.0.weight": (d,),
            f"{p}.attn.layernorm_qkv.1.weight": (3 * d, d),
            f"{p}.attn.q_ln.weight": (d,),
            f"{p}.attn.k_ln.weight": (d,),
            f"{p}.attn.out_proj.weight": (d, d),
            f"{p}.ffn.0.weight": (d,),
            f"{p}.ffn.1.weight": (2 * h, d),
            f"{p}.ffn.3.weight": (d, h),
        })
        if i == 0:  # stack_config: n_layers_geom=1
            specs.update({
                f"{p}.geom_attn.s_norm.weight": (d,),
                f"{p}.geom_attn.proj.weight": (H * 15, d),
                f"{p}.geom_attn.out_proj.weight": (d, H * 3),
                f"{p}.geom_attn.distance_scale_per_head": (H,),
                f"{p}.geom_attn.rotation_scale_per_head": (H,),
            })
    return specs


def make_reference_encoder_state_dict(cfg, seed: int = 0,
                                      scale: float = 0.05) -> dict:
    rng = np.random.RandomState(seed)
    sd = {}
    for name, shape in _encoder_tensor_specs(cfg).items():
        if len(shape) == 1 and name.endswith(
                (".0.weight", "norm.weight", "q_ln.weight", "k_ln.weight",
                 "s_norm.weight")):
            arr = 1.0 + rng.randn(*shape) * 0.02
        else:
            arr = rng.randn(*shape) * scale
        sd[name] = arr.astype(np.float32)
    return sd


def verify_vqvae_encoder(state_dict: dict, cfg=None,
                         key_overrides=None, value_transforms=None,
                         probe_seed: int = 7) -> list[dict]:
    """Per-layer activation diff of a converted StructureTokenEncoder:
    rel-pos table, each stack block (block 0 with geometric attention),
    final norm, pre-VQ projection, and codebook distance geometry."""
    import jax
    import jax.numpy as jnp
    import torch

    from esmdiff_tpu.models.esm3 import TransformerBlock
    from esmdiff_tpu.models.vqvae import (EncoderConfig, StructureTokenEncoder,
                                          nearest_code)
    from esmdiff_tpu.nn.geometric import build_affine3d_from_coordinates
    from esmdiff_tpu.nn.rotary import rotary_tables
    from .torch_to_jax import convert_vqvae_encoder

    if cfg is None:
        cfg = EncoderConfig()
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32"})
    enc = StructureTokenEncoder(cfg)
    template = jax.jit(lambda k: enc.init(
        k, jnp.zeros((1, 8, 3, 3), jnp.float32)))(
        jax.random.PRNGKey(0))["params"]

    canon = dict(state_dict)
    for canonical, actual in (key_overrides or {}).items():
        if actual in canon:
            canon[canonical] = canon[actual]
    for key, vt in (value_transforms or {}).items():
        if key in canon:
            canon[key] = vt(canon[key])
    specs = _encoder_tensor_specs(cfg)
    missing_canonical = [n for n in specs if n not in canon]
    for n in missing_canonical:
        canon[n] = np.zeros(specs[n], np.float32)
    state_dict = canon

    params, report = convert_vqvae_encoder(template, state_dict,
                                           n_layers=cfg.n_layers,
                                           strict=False)
    report["missing"] = sorted(
        set(report["missing"]) | set(missing_canonical))
    if report["missing"]:
        print(f"[verify] MISSING torch keys ({len(report['missing'])}): "
              + ", ".join(report["missing"][:8]))

    rng = np.random.RandomState(probe_seed)
    stack_cfg = cfg.stack_config()
    stack_cfg = type(stack_cfg)(**{**stack_cfg.__dict__, "dtype": "float32",
                                   "param_dtype": "float32"})
    scale = stack_cfg.residue_scaling_factor
    rot_cos, rot_sin = rotary_tables(PROBE_L, cfg.d_model // cfg.n_heads)

    rows = []

    record = _record_into(rows)

    # relative-position table lookup
    ids = rng.randint(0, 2 * cfg.rel_pos_bins + 2, (PROBE_B, PROBE_L))
    jax_tab = np.asarray(params["relative_position_embed"]["embedding"])
    t_tab = state_dict["relative_positional_embedding.embedding.weight"]
    record("relpos_embed", jax_tab[ids], torch.as_tensor(t_tab[ids]))

    # stack blocks on a shared probe (block 0 geometric)
    x_np = rng.randn(PROBE_B, PROBE_L, cfg.d_model).astype(np.float32)
    bb = rng.randn(PROBE_B, PROBE_L, 3, 3).astype(np.float32) * 3.0
    affine, affine_mask = build_affine3d_from_coordinates(jnp.asarray(bb))
    for i in range(cfg.n_layers):
        x = jnp.asarray(x_np)
        xt = torch.as_tensor(x_np)
        blk_params = params["transformer"][f"block{i}"]
        if i == 0:
            block = TransformerBlock(stack_cfg, use_geom_attn=True)
            jax_out = block.apply({"params": blk_params}, x, rot_cos,
                                  rot_sin, None, affine=affine,
                                  affine_mask=affine_mask)
            t_out = _oracle_block_with_geom(
                state_dict, f"transformer.blocks.{i}", xt, stack_cfg, scale,
                torch.as_tensor(np.asarray(affine.rot)),
                torch.as_tensor(np.asarray(affine.trans)),
                torch.as_tensor(np.asarray(affine_mask)))
            record(f"enc_block{i}(geom)", jax_out, t_out)
        else:
            block = TransformerBlock(stack_cfg, use_geom_attn=False)
            jax_out = block.apply({"params": blk_params}, x, rot_cos,
                                  rot_sin, None)
            t_out = oracle_block(state_dict, f"transformer.blocks.{i}", xt,
                                 cfg.n_heads, scale)
            record(f"enc_block{i}", jax_out, t_out)

    # final norm
    from esmdiff_tpu.nn.layers import LayerNorm

    ln_out = LayerNorm().apply(
        {"params": params["transformer"]["norm"]}, jnp.asarray(x_np))
    t_ln = _oracle_ln(torch.as_tensor(x_np), torch.as_tensor(
        state_dict["transformer.norm.weight"]))
    record("final_norm", ln_out, t_ln)

    # pre-VQ projection
    t_z = (torch.as_tensor(x_np)
           @ torch.as_tensor(state_dict["pre_vq_proj.weight"]).T
           + torch.as_tensor(state_dict["pre_vq_proj.bias"]))
    j_z = (jnp.asarray(x_np) @ params["pre_vq_proj"]["kernel"]
           + params["pre_vq_proj"]["bias"])
    record("pre_vq_proj", j_z, t_z)

    # codebook: squared-distance geometry + argmin token agreement
    z_np = rng.randn(PROBE_B, PROBE_L, cfg.d_out).astype(np.float32)
    cb_j = np.asarray(params["codebook"], np.float32)
    cb_t = state_dict["codebook.embeddings"]
    d2_t = (np.sum(z_np**2, -1, keepdims=True)
            - 2.0 * z_np @ cb_t.T + np.sum(cb_t**2, -1))
    d2_j = (np.sum(z_np**2, -1, keepdims=True)
            - 2.0 * z_np @ cb_j.T + np.sum(cb_j**2, -1))
    record("codebook_d2", d2_j, torch.as_tensor(d2_t))
    tok_j = np.asarray(nearest_code(jnp.asarray(z_np), jnp.asarray(cb_j)))
    tok_t = np.argmin(d2_t, axis=-1)
    agree = float(np.mean(tok_j == tok_t))
    rows.append({"layer": "codebook_argmin", "max_abs_diff": 1.0 - agree,
                 "rel_diff": 1.0 - agree})

    print(f"{'layer':<18} {'max_abs_diff':>14} {'rel_diff':>12}")
    worst = 0.0
    for r in rows:
        print(f"{r['layer']:<18} {r['max_abs_diff']:>14.3e} "
              f"{r['rel_diff']:>12.3e}")
        worst = max(worst, r["rel_diff"])
    verdict = "OK" if worst < 1e-4 and not report["missing"] else "MISMATCH"
    print(f"[verify] encoder worst rel diff {worst:.3e}, "
          f"{len(report['missing'])} missing keys -> {verdict}")
    return rows


# ---------------------------------------------------------------------------
# function-token decoder verification (ROUND1_NOTES #3 risk surface)
# ---------------------------------------------------------------------------

def _function_decoder_tensor_specs(cfg) -> dict[str, tuple]:
    from esmdiff_tpu.nn.layers import swiglu_hidden_dim

    d = cfg.d_model
    h = swiglu_hidden_dim(d)
    specs: dict[str, tuple] = {
        "embedding.weight":
            (cfg.function_token_depth * cfg.function_token_vocab, d),
        "decoder.norm.weight": (d,),
    }
    for i in range(cfg.n_layers):
        p = f"decoder.blocks.{i}"
        specs.update({
            f"{p}.attn.layernorm_qkv.0.weight": (d,),
            f"{p}.attn.layernorm_qkv.1.weight": (3 * d, d),
            f"{p}.attn.q_ln.weight": (d,),
            f"{p}.attn.k_ln.weight": (d,),
            f"{p}.attn.out_proj.weight": (d, d),
            f"{p}.ffn.0.weight": (d,),
            f"{p}.ffn.1.weight": (2 * h, d),
            f"{p}.ffn.3.weight": (d, h),
        })
    for head, out in (("heads.interpro_logits", cfg.interpro_classes),
                      ("heads.keyword_logits", cfg.keyword_vocab)):
        specs.update({
            f"{head}.0.weight": (d, d), f"{head}.0.bias": (d,),
            f"{head}.2.weight": (d,), f"{head}.2.bias": (d,),
            f"{head}.3.weight": (out, d), f"{head}.3.bias": (out,),
        })
    return specs


def make_reference_function_decoder_state_dict(cfg, seed: int = 0,
                                               scale: float = 0.05) -> dict:
    rng = np.random.RandomState(seed)
    sd = {}
    for name, shape in _function_decoder_tensor_specs(cfg).items():
        if len(shape) == 1 and name.endswith(
                (".0.weight", "norm.weight", "q_ln.weight", "k_ln.weight")):
            arr = 1.0 + rng.randn(*shape) * 0.02
        else:
            arr = rng.randn(*shape) * scale
        sd[name] = arr.astype(np.float32)
    return sd


def verify_function_decoder(state_dict: dict, cfg=None,
                            key_overrides=None, value_transforms=None,
                            probe_seed: int = 7) -> list[dict]:
    """Per-layer activation diff of a converted FunctionTokenDecoder."""
    import jax
    import jax.numpy as jnp
    import torch

    from esmdiff_tpu.models.esm3 import TransformerBlock
    from esmdiff_tpu.models.function_decoder import (FunctionDecoderConfig,
                                                     FunctionTokenDecoder)
    from esmdiff_tpu.nn.layers import LayerNorm, RegressionHead
    from esmdiff_tpu.nn.rotary import rotary_tables
    from .torch_to_jax import convert_function_decoder

    if cfg is None:
        cfg = FunctionDecoderConfig()
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32"})
    dec = FunctionTokenDecoder(cfg)
    template = jax.jit(lambda k: dec.init(
        k, jnp.zeros((1, cfg.function_token_depth), jnp.int32)))(
        jax.random.PRNGKey(0))["params"]

    canon = dict(state_dict)
    for canonical, actual in (key_overrides or {}).items():
        if actual in canon:
            canon[canonical] = canon[actual]
    for key, vt in (value_transforms or {}).items():
        if key in canon:
            canon[key] = vt(canon[key])
    specs = _function_decoder_tensor_specs(cfg)
    missing_canonical = [n for n in specs if n not in canon]
    for n in missing_canonical:
        canon[n] = np.zeros(specs[n], np.float32)
    state_dict = canon

    params, report = convert_function_decoder(template, state_dict,
                                              n_layers=cfg.n_layers,
                                              strict=False)
    report["missing"] = sorted(
        set(report["missing"]) | set(missing_canonical))
    if report["missing"]:
        print(f"[verify] MISSING torch keys ({len(report['missing'])}): "
              + ", ".join(report["missing"][:8]))

    rng = np.random.RandomState(probe_seed)
    D = cfg.function_token_depth
    stack_cfg = cfg.stack_config()
    stack_cfg = type(stack_cfg)(**{**stack_cfg.__dict__, "dtype": "float32",
                                   "param_dtype": "float32"})
    scale = stack_cfg.residue_scaling_factor
    rot_cos, rot_sin = rotary_tables(D, cfg.d_model // cfg.n_heads)

    rows = []

    record = _record_into(rows)

    # depth-offset embedding lookup
    toks = rng.randint(0, cfg.function_token_vocab, (PROBE_B, D))
    flat = toks + np.arange(D) * cfg.function_token_vocab
    record("fn_embed", np.asarray(params["embed"]["embedding"])[flat],
           torch.as_tensor(state_dict["embedding.weight"][flat]))

    x_np = rng.randn(PROBE_B, D, cfg.d_model).astype(np.float32)
    for i in range(cfg.n_layers):
        blk_params = params["decoder"][f"block{i}"]
        block = TransformerBlock(stack_cfg, use_geom_attn=False)
        jax_out = block.apply({"params": blk_params}, jnp.asarray(x_np),
                              rot_cos, rot_sin, None)
        t_out = oracle_block(state_dict, f"decoder.blocks.{i}",
                             torch.as_tensor(x_np), cfg.n_heads, scale)
        record(f"fn_block{i}", jax_out, t_out)

    ln_out = LayerNorm().apply(
        {"params": params["decoder"]["norm"]}, jnp.asarray(x_np))
    record("final_norm", ln_out, _oracle_ln(
        torch.as_tensor(x_np),
        torch.as_tensor(state_dict["decoder.norm.weight"])))

    pooled = x_np.mean(axis=-2)
    for jax_name, torch_name, out in (
            ("interpro_head", "heads.interpro_logits", cfg.interpro_classes),
            ("keyword_head", "heads.keyword_logits", cfg.keyword_vocab)):
        h_out = RegressionHead(out, dtype=jnp.float32).apply(
            {"params": params[jax_name]}, jnp.asarray(pooled))
        record(jax_name, h_out, oracle_regression_head(
            state_dict, torch_name, torch.as_tensor(pooled)))

    print(f"{'layer':<18} {'max_abs_diff':>14} {'rel_diff':>12}")
    worst = 0.0
    for r in rows:
        print(f"{r['layer']:<18} {r['max_abs_diff']:>14.3e} "
              f"{r['rel_diff']:>12.3e}")
        worst = max(worst, r["rel_diff"])
    verdict = "OK" if worst < 1e-4 and not report["missing"] else "MISMATCH"
    print(f"[verify] function decoder worst rel diff {worst:.3e}, "
          f"{len(report['missing'])} missing keys -> {verdict}")
    return rows


# ---------------------------------------------------------------------------
# CLM / JLM — oracle is the REAL HuggingFace torch implementation
# ---------------------------------------------------------------------------
# The reference's CLM/JLM wrap HF T5/GPT-2 (slm/models/net.py:87-295), and
# transformers ships in this environment, so unlike the hand-written oracles
# above these two verify against the actual upstream module — no shared
# architectural assumptions at all (same oracle as
# tests/test_convert_hf_oracle.py, which pins correctness on tiny shapes).


def _report_rows(rows, missing, label):
    print(f"{'checkpoint':<18} {'max_abs_diff':>14} {'rel_diff':>12}")
    worst = 0.0
    for r in rows:
        print(f"{r['layer']:<18} {r['max_abs_diff']:>14.3e} "
              f"{r['rel_diff']:>12.3e}")
        worst = max(worst, r["rel_diff"])
    verdict = "OK" if worst < 1e-4 and not missing else "MISMATCH"
    print(f"[verify] {label} worst rel diff {worst:.3e}, "
          f"{len(missing)} missing keys -> {verdict}")
    return rows


def infer_clm_config(sd):
    """CLMConfig from a CustomedT5-layout state_dict's shapes."""
    from esmdiff_tpu.models.clm import CLMConfig

    V, d = sd["decoder.embed_tokens.weight"].shape
    d_ff = sd["decoder.block.0.layer.2.DenseReluDense.wi_0.weight"].shape[0]
    n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("decoder.block."))
    buckets, H = sd["decoder.block.0.layer.0.SelfAttention."
                    "relative_attention_bias.weight"].shape
    inner = sd["decoder.block.0.layer.0.SelfAttention.q.weight"].shape[0]
    if inner != d:
        raise ValueError(f"T5 inner dim {inner} != d_model {d} "
                         "(non-standard d_kv is not modeled)")
    cond = sd["adapation_layer.weight"].shape[1]
    return CLMConfig(vocab_size=int(V), d_model=int(d), d_ff=int(d_ff),
                     n_layers=int(n_layers), n_heads=int(H),
                     rel_pos_buckets=int(buckets), cond_dim=int(cond),
                     dtype="float32")


def make_reference_clm_state_dict(cfg, seed: int = 0) -> dict:
    """Reference-layout fixture = an ACTUAL random HF T5 state_dict plus the
    CustomedT5 adapter (the strongest possible fixture: the keys/shapes come
    from upstream transformers itself)."""
    import torch
    from transformers import T5Config, T5ForConditionalGeneration

    torch.manual_seed(seed)
    hf = T5ForConditionalGeneration(T5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model,
        d_kv=cfg.d_model // cfg.n_heads, d_ff=cfg.d_ff,
        num_layers=cfg.n_layers, num_heads=cfg.n_heads,
        relative_attention_num_buckets=cfg.rel_pos_buckets,
        relative_attention_max_distance=cfg.rel_pos_max_distance,
        dropout_rate=0.0, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, pad_token_id=cfg.pad_token_id,
        decoder_start_token_id=cfg.decoder_start_token_id))
    sd = {k: v.detach() for k, v in hf.state_dict().items()}
    sd["adapation_layer.weight"] = torch.randn(cfg.d_model, cfg.cond_dim) * 0.1
    return sd


def verify_clm(state_dict: dict, cfg=None, probe_seed: int = 7) -> list[dict]:
    """Convert a CustomedT5 state_dict and diff encoder output / logits /
    loss against the real HF torch T5 on a fixed probe batch."""
    import jax
    import jax.numpy as jnp
    import torch
    from transformers import T5Config, T5ForConditionalGeneration

    from esmdiff_tpu.models.clm import CLM
    from .ar_rules import convert_clm

    if cfg is None:
        cfg = infer_clm_config(state_dict)
    model = CLM(cfg)
    B, L, LS = 2, 6, 7
    emb0 = jnp.zeros((B, L, cfg.cond_dim), jnp.float32)
    lab0 = jnp.zeros((B, LS), jnp.int32)
    template = model.init(jax.random.PRNGKey(0), emb0, lab0)["params"]
    params, report = convert_clm(template, state_dict,
                                 n_layers=cfg.n_layers, strict=False)
    if report["missing"]:
        print(f"[verify] MISSING torch keys ({len(report['missing'])}): "
              + ", ".join(report["missing"][:8]))

    hf = T5ForConditionalGeneration(T5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model,
        d_kv=cfg.d_model // cfg.n_heads, d_ff=cfg.d_ff,
        num_layers=cfg.n_layers, num_heads=cfg.n_heads,
        relative_attention_num_buckets=cfg.rel_pos_buckets,
        relative_attention_max_distance=cfg.rel_pos_max_distance,
        dropout_rate=0.0, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, pad_token_id=cfg.pad_token_id,
        decoder_start_token_id=cfg.decoder_start_token_id)).eval()
    backbone = {k: torch.as_tensor(np.asarray(v))
                for k, v in state_dict.items() if k != "adapation_layer.weight"}
    hf.load_state_dict(backbone, strict=False)
    adapter_w = torch.as_tensor(np.asarray(
        state_dict["adapation_layer.weight"]))

    rng = np.random.RandomState(probe_seed)
    emb = rng.randn(B, L, cfg.cond_dim).astype(np.float32)
    labels = rng.randint(0, min(4096, cfg.vocab_size), (B, LS))

    rows: list[dict] = []
    record = _record_into(rows)
    with torch.no_grad():
        enc_in = torch.as_tensor(emb) @ adapter_w.T
        enc_t = hf.encoder(inputs_embeds=enc_in).last_hidden_state
        out_t = hf(inputs_embeds=enc_in,
                   labels=torch.as_tensor(labels))
    enc_j = model.apply({"params": params}, jnp.asarray(emb),
                        method=lambda m, e: m.encode(e))
    out_j = model.apply({"params": params}, jnp.asarray(emb),
                        jnp.asarray(labels.astype(np.int32)))
    record("encoder", enc_j, enc_t)
    record("logits", out_j["logits"], out_t.logits)
    record("loss", out_j["loss"], out_t.loss)
    return _report_rows(rows, report["missing"], "clm (HF T5 oracle)")


def infer_jlm_config(sd, n_heads=None):
    """JLMConfig from a CustomedGPT2-layout state_dict's shapes.  GPT-2
    state dicts do not encode the head count — pass ``n_heads`` for real
    checkpoints (defaults to JLMConfig's)."""
    from esmdiff_tpu.models.jlm import JLMConfig

    n_pos, d = sd["wpe.weight"].shape
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("h."))
    kw = dict(
        n_embd=int(d), n_layers=int(n_layers), n_positions=int(n_pos),
        struct_embed_dim=int(sd["structure_embed_tokens.weight"].shape[1]),
        cond_dim=int(sd["sequence_adapation_layer.weight"].shape[1]),
        seq_vocab=int(sd["sequence_head.weight"].shape[0]),
        struct_vocab=int(sd["structure_head.weight"].shape[0]),
        sep_strategy="position" if "sep_token" in sd else "sentence",
        dtype="float32")
    if n_heads is not None:
        kw["n_heads"] = int(n_heads)
    return JLMConfig(**kw)


def make_reference_jlm_state_dict(cfg, seed: int = 0) -> dict:
    """Reference-layout fixture from an ACTUAL random HF GPT2Model."""
    import torch
    from transformers import GPT2Config, GPT2Model

    torch.manual_seed(seed)
    gpt = GPT2Model(GPT2Config(
        vocab_size=8, n_positions=cfg.n_positions, n_embd=cfg.n_embd,
        n_layer=cfg.n_layers, n_head=cfg.n_heads, resid_pdrop=0.0,
        embd_pdrop=0.0, attn_pdrop=0.0, activation_function="gelu_new"))
    sd = {k: v.detach() for k, v in gpt.state_dict().items()}
    sd.update({
        "structure_embed_tokens.weight":
            torch.randn(cfg.struct_vocab, cfg.struct_embed_dim) * 0.1,
        "sequence_adapation_layer.weight":
            torch.randn(cfg.n_embd, cfg.cond_dim) * 0.1,
        "structure_adapation_layer.weight":
            torch.randn(cfg.n_embd, cfg.struct_embed_dim) * 0.1,
        "sequence_head.weight": torch.randn(cfg.seq_vocab, cfg.n_embd) * 0.1,
        "structure_head.weight":
            torch.randn(cfg.struct_vocab, cfg.n_embd) * 0.1,
    })
    if cfg.sep_strategy == "position":
        sd["sep_token"] = torch.randn(cfg.n_embd)
    return sd


def verify_jlm(state_dict: dict, cfg=None, n_heads=None,
               probe_seed: int = 7) -> list[dict]:
    """Convert a CustomedGPT2 state_dict and diff both head logits against
    the real HF torch GPT-2 on a fixed probe batch."""
    import jax
    import jax.numpy as jnp
    import torch
    from transformers import GPT2Config, GPT2Model

    from esmdiff_tpu.models.jlm import JLM
    from .ar_rules import convert_jlm

    if cfg is None:
        cfg = infer_jlm_config(state_dict, n_heads=n_heads)
        if n_heads is None:
            print(f"[verify] GPT-2 state dicts don't encode the head count; "
                  f"assuming n_heads={cfg.n_heads} (pass --heads to override)")
        # NB: a wrong head count CANNOT be caught by this diff — both the HF
        # oracle and the JAX model are built with the same value, and the
        # weight layout is head-count-invisible.  The count must match the
        # TRAINING config (reference configs/experiment/jlm.yaml); this
        # harness verifies conversion layout, which is orthogonal.
    model = JLM(cfg)
    B, L, LS = 2, 5, 6
    emb0 = jnp.zeros((B, L, cfg.cond_dim), jnp.float32)
    st0 = jnp.zeros((B, LS), jnp.int32)
    template = model.init(jax.random.PRNGKey(0), emb0, st0)["params"]
    params, report = convert_jlm(template, state_dict,
                                 n_layers=cfg.n_layers, strict=False)
    if report["missing"]:
        print(f"[verify] MISSING torch keys ({len(report['missing'])}): "
              + ", ".join(report["missing"][:8]))

    gpt = GPT2Model(GPT2Config(
        vocab_size=8, n_positions=cfg.n_positions, n_embd=cfg.n_embd,
        n_layer=cfg.n_layers, n_head=cfg.n_heads, resid_pdrop=0.0,
        embd_pdrop=0.0, attn_pdrop=0.0,
        activation_function="gelu_new")).eval()
    t = lambda k: torch.as_tensor(np.asarray(state_dict[k]))
    gpt.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in state_dict.items()
         if k.startswith(("h.", "wte", "wpe", "ln_f"))}, strict=False)

    rng = np.random.RandomState(probe_seed)
    emb = rng.randn(B, L, cfg.cond_dim).astype(np.float32)
    st = rng.randint(0, min(4096, cfg.struct_vocab), (B, LS))

    rows: list[dict] = []
    record = _record_into(rows)
    with torch.no_grad():
        seq_part = torch.as_tensor(emb) @ t("sequence_adapation_layer.weight").T
        str_emb = t("structure_embed_tokens.weight")[torch.as_tensor(st)]
        str_part = str_emb @ t("structure_adapation_layer.weight").T
        if cfg.sep_strategy == "sentence":
            x = torch.cat([seq_part, str_part], dim=1)
            types = torch.cat([torch.zeros(B, L), torch.ones(B, LS)],
                              dim=1).long()
            pos = torch.arange(L + LS)[None].expand(B, -1)
            h = gpt(inputs_embeds=x, position_ids=pos,
                    token_type_ids=types).last_hidden_state
            off = 0
        else:
            sep = t("sep_token")[None, None].expand(B, 1, cfg.n_embd)
            x = torch.cat([seq_part, sep, str_part], dim=1)
            pos = torch.cat([torch.arange(L), torch.zeros(1).long(),
                             torch.arange(LS)])[None].expand(B, -1)
            h = gpt(inputs_embeds=x, position_ids=pos).last_hidden_state
            off = 1
        seq_logits_t = h[:, :L] @ t("sequence_head.weight").T
        str_logits_t = h[:, L + off:] @ t("structure_head.weight").T

    out_j = model.apply({"params": params}, jnp.asarray(emb),
                        jnp.asarray(st.astype(np.int32)))
    record("sequence_logits", out_j["sequence_logits"], seq_logits_t)
    record("structure_logits", out_j["structure_logits"], str_logits_t)
    return _report_rows(rows, report["missing"], "jlm (HF GPT-2 oracle)")


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Per-layer torch-vs-jax activation diff of a converted "
                    "checkpoint.")
    p.add_argument("ckpt", nargs="?", default=None,
                   help="torch checkpoint (.pt/.ckpt); omit with --fixture")
    p.add_argument("--fixture", action="store_true",
                   help="Use a synthetic reference-layout state_dict "
                        "(self-check of converter + oracle).")
    p.add_argument("--scale", type=str, default="full",
                   choices=["full", "tiny"])
    p.add_argument("--layers", type=str, default=None,
                   help="Layer slice, e.g. 0:4")
    p.add_argument("--component", type=str, default="trunk",
                   choices=["trunk", "vqvae_decoder", "vqvae_encoder",
                            "function_decoder", "clm", "jlm"])
    p.add_argument("--heads", type=int, default=None,
                   help="jlm: GPT-2 head count (not encoded in state dicts).")
    args = p.parse_args(argv)

    if args.component in ("clm", "jlm"):
        from .torch_to_jax import load_torch_state_dict, strip_prefix

        if args.fixture or not args.ckpt:
            print("[verify] using HF-layout random fixture")
            if args.component == "clm":
                from esmdiff_tpu.models.clm import CLMConfig

                cfg = (CLMConfig(d_model=32, d_ff=64, n_layers=2, n_heads=4,
                                 cond_dim=48, dtype="float32")
                       if args.scale == "tiny" else
                       CLMConfig(dtype="float32"))
                verify_clm(make_reference_clm_state_dict(cfg), cfg)
            else:
                from esmdiff_tpu.models.jlm import JLMConfig

                cfg = (JLMConfig(n_embd=32, n_layers=2, n_heads=4,
                                 n_positions=64, cond_dim=48,
                                 struct_embed_dim=24, seq_vocab=33,
                                 dtype="float32")
                       if args.scale == "tiny" else JLMConfig(dtype="float32"))
                verify_jlm(make_reference_jlm_state_dict(cfg), cfg)
            return
        sd = load_torch_state_dict(args.ckpt)
        if any(k.startswith("net.") for k in sd):
            sd = strip_prefix(sd, "net.")
        if args.component == "clm":
            verify_clm(sd)
        else:
            verify_jlm(sd, n_heads=args.heads)
        return

    if args.component == "vqvae_encoder":
        from esmdiff_tpu.models.vqvae import EncoderConfig

        cfg = (EncoderConfig(d_model=64, n_heads=2, v_heads=8, n_layers=2,
                             d_out=16, knn=8)
               if args.scale == "tiny" else EncoderConfig())
        if args.fixture or not args.ckpt:
            sd = make_reference_encoder_state_dict(cfg)
            print("[verify] using synthetic reference-layout fixture")
        else:
            from .torch_to_jax import load_torch_state_dict

            sd = load_torch_state_dict(args.ckpt)
        verify_vqvae_encoder(sd, cfg)
        return

    if args.component == "function_decoder":
        from esmdiff_tpu.models.function_decoder import FunctionDecoderConfig

        cfg = (FunctionDecoderConfig(d_model=64, n_heads=4, n_layers=2,
                                     interpro_classes=37, keyword_vocab=53)
               if args.scale == "tiny" else FunctionDecoderConfig())
        if args.fixture or not args.ckpt:
            sd = make_reference_function_decoder_state_dict(cfg)
            print("[verify] using synthetic reference-layout fixture")
        else:
            from .torch_to_jax import load_torch_state_dict

            sd = load_torch_state_dict(args.ckpt)
        verify_function_decoder(sd, cfg)
        return

    if args.component == "vqvae_decoder":
        from esmdiff_tpu.models.vqvae import DecoderConfig

        cfg = (DecoderConfig(d_model=64, n_heads=4, n_layers=3)
               if args.scale == "tiny" else DecoderConfig())
        if args.fixture or not args.ckpt:
            sd = make_reference_decoder_state_dict(cfg)
            print("[verify] using synthetic reference-layout fixture")
        else:
            from .torch_to_jax import load_torch_state_dict

            sd = load_torch_state_dict(args.ckpt)
        verify_vqvae_decoder(sd, cfg)
        return

    from esmdiff_tpu.models.esm3 import ESM3Config, esm3_tiny

    cfg = esm3_tiny() if args.scale == "tiny" else ESM3Config()
    if args.fixture or not args.ckpt:
        sd = make_reference_trunk_state_dict(cfg)
        print("[verify] using synthetic reference-layout fixture")
    else:
        from .torch_to_jax import load_torch_state_dict, strip_prefix

        sd = load_torch_state_dict(args.ckpt)
        if any(k.startswith("net.") for k in sd):
            sd = strip_prefix(sd, "net.")
    layers = None
    if args.layers:
        a, _, b = args.layers.partition(":")
        layers = slice(int(a) if a else None, int(b) if b else None)
    verify_trunk(sd, cfg, layers=layers)


if __name__ == "__main__":
    main()
