"""ESM3 trunk, TPU-native.

A from-scratch flax implementation of the 1.4B multitrack transformer the
reference recomposes from the esm package (``CustomizedESM3``,
slm/models/net.py:322-483): input-track embedding sum, 48 pre-norm blocks
(QK-layernorm + rotary attention, SwiGLU FFN, geometric attention in block 0),
swappable output heads, and optional time-conditioning embeddings added
post-encoder (net.py:465-466).

TPU-first choices:
  - layers 1..n-1 are a single ``nn.scan`` over stacked parameters (one XLA
    while loop -> fast compiles, weight streaming overlap), with optional
    rematerialization for training;
  - rotary cos/sin tables are computed once and broadcast into the scan;
  - all matmuls run in bf16 on the MXU with fp32 layernorm/softmax.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.nn.attention import sequence_id_mask
from esmdiff_tpu.nn.embed import EncodeInputs
from esmdiff_tpu.nn.geometric import (
    Affine3D,
    GeometricAttention,
    build_affine3d_from_coordinates,
)
from esmdiff_tpu.nn.heads import ESMOutput, OutputHeads, StructureOutputHeads
from esmdiff_tpu.nn.layers import (
    LayerNorm,
    MultiHeadAttention,
    SwiGLUFFN,
    swiglu_hidden_dim,
)
from esmdiff_tpu.nn.rotary import rotary_tables


@dataclasses.dataclass(frozen=True)
class ESM3Config:
    d_model: int = C.ESM3_D_MODEL
    n_heads: int = C.ESM3_N_HEADS
    v_heads: int = C.ESM3_V_HEADS
    n_layers: int = C.ESM3_N_LAYERS
    n_layers_geom: int = 1
    expansion_ratio: float = 8 / 3
    mask_and_zero_frameless: bool = True
    # head selection: "esm3" = stock multi-track heads (4096-way structure);
    # "structure" = fine-tune replacement (4101-way + optional sequence head),
    # reference slm/models/net.py:363-366.
    head_type: str = "esm3"
    n_structure_heads: int = C.STRUCTURE_VOCAB_SIZE
    n_sequence_heads: int = 0
    dtype: str = "bfloat16"
    param_dtype: str = "float32"
    scan_layers: bool = True
    scan_unroll: int = 1   # >1 lets XLA pipeline across layer boundaries
    remat: bool = True
    # "nothing" = recompute the whole block in backward (min memory);
    # "dots" = save matmul outputs (jax.checkpoint_policies.dots_saveable):
    # skips the GEMM recompute at ~3 GB extra activation memory for the full
    # trunk at B=4/L=512 — use when HBM headroom allows (e.g. ZeRO-sharded
    # optimizer states on multi-chip meshes).
    remat_policy: str = "nothing"
    attn_backend: str = "auto"
    qkv_backend: str = "xla"  # "fused" = Pallas LN+QKV+QK-LN (ops/fused_qkv)
    # "int8" = W8A8 attention/FFN projections on the MXU's 2x int8 path
    # (ops/quant.py) — inference-only; params converted by
    # quantize_trunk_params.
    quant: str = "none"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def jnp_param_dtype(self):
        return jnp.dtype(self.param_dtype)

    @property
    def residue_scaling_factor(self) -> float:
        return (self.n_layers / 36.0) ** 0.5

    @property
    def ffn_hidden(self) -> int:
        return swiglu_hidden_dim(self.d_model, self.expansion_ratio)


def esm3_open_small(**overrides) -> ESM3Config:
    """Geometry of esm3_sm_open_v1 (reference slm/models/net.py:325-345)."""
    return ESM3Config(**overrides)


def esm3_tiny(**overrides) -> ESM3Config:
    """A small config for tests: same topology, toy widths."""
    kw = dict(d_model=64, n_heads=4, v_heads=8, n_layers=4)
    kw.update(overrides)
    return ESM3Config(**kw)


class TransformerBlock(nn.Module):
    """Pre-norm block: attention (+ optional geometric attention) + SwiGLU,
    residuals scaled by 1/sqrt(n_layers/36)."""

    cfg: ESM3Config
    use_geom_attn: bool = False

    @nn.compact
    def __call__(self, x, rot_cos, rot_sin, mask, lengths=None, affine=None,
                 affine_mask=None, sequence_id=None, chain_id=None,
                 skip_geom: bool = False):
        cfg = self.cfg
        scale = cfg.residue_scaling_factor
        r = MultiHeadAttention(
            d_model=cfg.d_model, n_heads=cfg.n_heads, dtype=cfg.jnp_dtype,
            param_dtype=cfg.jnp_param_dtype, attn_backend=cfg.attn_backend,
            qkv_backend=cfg.qkv_backend, quant=cfg.quant, name="attn",
        )(x, rot_cos, rot_sin, mask=mask, lengths=lengths)
        x = x + r / scale
        # When every frame is masked (no input coordinates — the MDLM
        # training/sampling path), geometric attention contributes exactly 0
        # (mask_and_zero_frameless) but still costs O(L^2 * v_heads) compute
        # and memory.  skip_geom elides it statically; parameters still exist
        # (created at init with dummy coords) so checkpoints are unaffected.
        if self.use_geom_attn and not skip_geom:
            r = GeometricAttention(
                d_model=cfg.d_model, v_heads=cfg.v_heads,
                mask_and_zero_frameless=cfg.mask_and_zero_frameless,
                dtype=cfg.jnp_dtype, param_dtype=cfg.jnp_param_dtype,
                name="geom_attn",
            )(x, affine, affine_mask, sequence_id, chain_id)
            x = x + r / scale
        r = SwiGLUFFN(
            d_model=cfg.d_model, hidden=cfg.ffn_hidden, dtype=cfg.jnp_dtype,
            param_dtype=cfg.jnp_param_dtype, quant=cfg.quant, name="ffn",
        )(x)
        return x + r / scale


class _ScanBlock(nn.Module):
    """Scan-body wrapper: (carry, broadcast inputs) -> (carry, None)."""

    cfg: ESM3Config

    @nn.compact
    def __call__(self, x, rot_cos, rot_sin, mask, lengths):
        x = TransformerBlock(self.cfg, use_geom_attn=False, name="block")(
            x, rot_cos, rot_sin, mask, lengths
        )
        return x, None


class TransformerStack(nn.Module):
    cfg: ESM3Config

    @nn.compact
    def __call__(self, x, sequence_id=None, affine: Optional[Affine3D] = None,
                 affine_mask=None, chain_id=None, skip_geom: bool = False,
                 lengths=None, positions=None):
        cfg = self.cfg
        L = x.shape[1]
        rot_cos, rot_sin = rotary_tables(
            L, cfg.d_model // cfg.n_heads, dtype=jnp.float32,
            positions=positions,
        )
        # Masking contract (see nn/attention.py): ``lengths`` = prefix padding
        # (flash-eligible); ``sequence_id`` = arbitrary packing (XLA mask path
        # only).  Passing both is ambiguous.
        if sequence_id is not None and lengths is not None:
            raise ValueError("pass either sequence_id or lengths, not both")
        mask = sequence_id_mask(sequence_id)
        if sequence_id is None and lengths is not None:
            # geometric attention keys off sequence_id; a prefix-length mask
            # is the equivalent 0/1 id pattern
            sequence_id = (
                jnp.arange(L)[None, :] < lengths[:, None]
            ).astype(jnp.int32)

        for i in range(cfg.n_layers_geom):
            x = TransformerBlock(cfg, use_geom_attn=True, name=f"block{i}")(
                x, rot_cos, rot_sin, mask, lengths, affine, affine_mask,
                sequence_id, chain_id, skip_geom=skip_geom,
            )

        n_rest = cfg.n_layers - cfg.n_layers_geom
        if n_rest > 0:
            if cfg.scan_layers:
                body = _ScanBlock
                if cfg.remat:
                    policy = (jax.checkpoint_policies.dots_saveable
                              if cfg.remat_policy == "dots" else None)
                    body = nn.remat(
                        body, prevent_cse=False,
                        static_argnums=(), policy=policy,
                    )
                blocks = nn.scan(
                    body,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    length=n_rest,
                    in_axes=(nn.broadcast, nn.broadcast, nn.broadcast,
                             nn.broadcast),
                    unroll=cfg.scan_unroll,
                )(cfg, name="blocks")
                x, _ = blocks(x, rot_cos, rot_sin, mask, lengths)
            else:
                for i in range(cfg.n_layers_geom, cfg.n_layers):
                    x = TransformerBlock(cfg, name=f"block{i}")(
                        x, rot_cos, rot_sin, mask, lengths
                    )
        pre_norm = x
        x = LayerNorm(name="norm")(x)
        return x, pre_norm


class ESM3(nn.Module):
    """Trunk with the reference's conformation-generation forward semantics
    (CustomizedESM3.forward, slm/models/net.py:371-483): track defaults,
    structure/sequence special-token tying, affine construction from (possibly
    all-NaN) coordinates, and auxiliary (time-conditioning) embeddings."""

    cfg: ESM3Config

    def setup(self):
        cfg = self.cfg
        self.encoder = EncodeInputs(
            cfg.d_model, dtype=cfg.jnp_dtype, param_dtype=cfg.jnp_param_dtype
        )
        self.transformer = TransformerStack(cfg)
        if cfg.head_type == "structure":
            self.output_heads = StructureOutputHeads(
                cfg.d_model, n_structure_heads=cfg.n_structure_heads,
                n_sequence_heads=cfg.n_sequence_heads, dtype=cfg.jnp_dtype,
                param_dtype=cfg.jnp_param_dtype,
            )
        else:
            self.output_heads = OutputHeads(
                cfg.d_model, dtype=cfg.jnp_dtype,
                param_dtype=cfg.jnp_param_dtype,
            )

    def embed(
        self,
        structure_tokens=None,
        sequence_tokens=None,
        ss8_tokens=None,
        sasa_tokens=None,
        function_tokens=None,
        residue_annotation_tokens=None,
        average_plddt=None,
        per_res_plddt=None,
        structure_coords=None,
        chain_id=None,
        auxiliary_embeddings=None,
    ):
        """Everything before the transformer stack: track defaults,
        structure/sequence special-token tying, affine construction, input
        embedding sum, auxiliary (time-conditioning) add.  Returns
        (x, affine, affine_mask, chain_id, skip_geom) — split out so
        parallel/pp.py can run the stack pipelined while reusing this exact
        front end (applied with ``method=ESM3.embed``)."""
        ref = next(
            t for t in (sequence_tokens, structure_tokens, ss8_tokens,
                        sasa_tokens, structure_coords)
            if t is not None
        )
        B, L = ref.shape[0], ref.shape[1]

        def default_tok(x, tok):
            if x is not None:
                return x
            return jnp.full((B, L), tok, dtype=jnp.int32)

        sequence_tokens = default_tok(sequence_tokens, C.SEQUENCE_MASK_TOKEN)
        structure_tokens = default_tok(structure_tokens, C.STRUCTURE_MASK_TOKEN)
        ss8_tokens = default_tok(ss8_tokens, C.SS8_PAD_TOKEN)
        sasa_tokens = default_tok(sasa_tokens, C.SASA_PAD_TOKEN)
        chain_id = default_tok(chain_id, 0)
        if average_plddt is None:
            average_plddt = jnp.ones((B, L), dtype=jnp.float32)
        if per_res_plddt is None:
            per_res_plddt = jnp.zeros((B, L), dtype=jnp.float32)
        if function_tokens is None:
            function_tokens = jnp.full(
                (B, L, C.FUNCTION_TOKEN_DEPTH), C.INTERPRO_PAD_TOKEN,
                dtype=jnp.int32,
            )
        if residue_annotation_tokens is None:
            residue_annotation_tokens = jnp.full(
                (B, L, C.RESIDUE_ANNOTATION_DEPTH), C.RESIDUE_PAD_TOKEN,
                dtype=jnp.int32,
            )
        # With no input coordinates every frame is masked and geometric
        # attention is an exact no-op — skip it statically (big O(L^2 * 256)
        # saving on the MDLM path; reference runs it anyway, net.py:433-441).
        skip_geom = structure_coords is None
        if structure_coords is None:
            affine = Affine3D(
                rot=jnp.broadcast_to(jnp.eye(3), (B, L, 3, 3)),
                trans=jnp.zeros((B, L, 3)),
            )
            affine_mask = jnp.zeros((B, L), dtype=bool)
        else:
            structure_coords = structure_coords[..., :3, :]
            affine, affine_mask = build_affine3d_from_coordinates(
                structure_coords)

        # Tie structure specials to the sequence specials
        # (reference slm/models/net.py:445-454).
        st = structure_tokens
        st = jnp.where(st == -1, C.STRUCTURE_MASK_TOKEN, st)
        st = jnp.where(
            sequence_tokens == C.SEQUENCE_BOS_TOKEN, C.STRUCTURE_BOS_TOKEN, st)
        st = jnp.where(
            sequence_tokens == C.SEQUENCE_PAD_TOKEN, C.STRUCTURE_PAD_TOKEN, st)
        st = jnp.where(
            sequence_tokens == C.SEQUENCE_EOS_TOKEN, C.STRUCTURE_EOS_TOKEN, st)
        st = jnp.where(
            sequence_tokens == C.SEQUENCE_CHAINBREAK_TOKEN,
            C.STRUCTURE_CHAINBREAK_TOKEN, st)

        x = self.encoder(
            sequence_tokens, st, average_plddt, per_res_plddt, ss8_tokens,
            sasa_tokens, function_tokens, residue_annotation_tokens,
        )
        if auxiliary_embeddings is not None:
            x = x + auxiliary_embeddings.astype(x.dtype)
        return x, affine, affine_mask, chain_id, skip_geom

    def heads(self, x, embedding) -> ESMOutput:
        """Output heads on (post-norm, pre-norm) states (pp back end)."""
        return self.output_heads(x, embedding)

    def __call__(
        self,
        structure_tokens=None,
        sequence_tokens=None,
        ss8_tokens=None,
        sasa_tokens=None,
        function_tokens=None,
        residue_annotation_tokens=None,
        average_plddt=None,
        per_res_plddt=None,
        structure_coords=None,
        chain_id=None,
        sequence_id=None,
        lengths=None,
        positions=None,
        auxiliary_embeddings=None,
    ) -> ESMOutput:
        x, affine, affine_mask, chain_id, skip_geom = self.embed(
            structure_tokens=structure_tokens,
            sequence_tokens=sequence_tokens,
            ss8_tokens=ss8_tokens,
            sasa_tokens=sasa_tokens,
            function_tokens=function_tokens,
            residue_annotation_tokens=residue_annotation_tokens,
            average_plddt=average_plddt,
            per_res_plddt=per_res_plddt,
            structure_coords=structure_coords,
            chain_id=chain_id,
            auxiliary_embeddings=auxiliary_embeddings,
        )
        x, embedding = self.transformer(
            x, sequence_id, affine, affine_mask, chain_id,
            skip_geom=skip_geom, lengths=lengths, positions=positions,
        )
        return self.output_heads(x, embedding)
