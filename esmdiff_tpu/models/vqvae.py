"""VQ-VAE structure tokenizer: geometric encoder + transformer decoder.

TPU-native reimplementation of ESM3's ``StructureTokenEncoder`` /
``StructureTokenDecoder`` (consumed by the reference at slm/models/utils.py:16-19,
45-80 and slm/models/net.py:93,261,348-349):

  encoder — for every residue, a 16-nearest-neighbor local neighborhood (CA
  distance) is encoded by a tiny 2-layer geometric-attention transformer whose
  *only* sequence features are relative-position embeddings (geometry enters
  through the frames); the center-residue output is projected to 128-d and
  vector-quantized against a 4096-code codebook.

  decoder — embeds (4101-way) structure tokens, runs a 30-layer / 1280-wide
  stack, and predicts backbone frames via a 6D-rotation head; pLDDT comes from
  a 50-bin classification head.

TPU notes: the per-residue neighborhoods are encoded as one big batched
(B*L, K, d) transformer call (MXU-friendly, no Python loops); nearest-code
lookup is a single (B*L, d) x (d, n_codes) matmul.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.core import residue_constants as rc
from esmdiff_tpu.nn.geometric import Affine3D, build_affine3d_from_coordinates
from esmdiff_tpu.nn.layers import LayerNorm, RegressionHead
from .esm3 import ESM3Config, TransformerStack


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    d_model: int = 1024
    n_heads: int = 1
    v_heads: int = 128
    n_layers: int = 2
    d_out: int = 128
    n_codes: int = C.VQVAE_CODEBOOK_SIZE
    knn: int = 16
    rel_pos_bins: int = 32
    dtype: str = "float32"

    def stack_config(self) -> ESM3Config:
        return ESM3Config(
            d_model=self.d_model, n_heads=self.n_heads, v_heads=self.v_heads,
            n_layers=self.n_layers, n_layers_geom=1, dtype=self.dtype,
            scan_layers=False, remat=False,
        )


def knn_graph(ca, valid_mask, k: int):
    """k nearest residues by CA distance (self included, nearest-first).

    ca: (B, L, 3); valid_mask: (B, L) bool.  Returns (idx (B, L, k),
    neigh_valid (B, L, k) bool).  Invalid residues fall back to self-index.
    """
    d2 = jnp.sum(
        (ca[:, :, None, :] - ca[:, None, :, :]) ** 2, axis=-1
    )  # (B, L, L)
    big = jnp.asarray(1e9, d2.dtype)
    pair_ok = valid_mask[:, :, None] & valid_mask[:, None, :]
    d2 = jnp.where(pair_ok, d2, big)
    # self always first
    L = ca.shape[1]
    eye = jnp.eye(L, dtype=bool)[None]
    d2 = jnp.where(eye, -1.0, d2)
    neg_d, idx = jax.lax.top_k(-d2, k)  # (B, L, k)
    neigh_valid = (-neg_d) < big / 2
    self_idx = jnp.arange(L)[None, :, None]
    idx = jnp.where(neigh_valid, idx, self_idx)
    return idx, neigh_valid


class StructureTokenEncoder(nn.Module):
    cfg: EncoderConfig = EncoderConfig()

    @nn.compact
    def __call__(self, coords, residue_index=None, valid_mask=None,
                 return_zq: bool = False):
        """coords: (B, L, 3, 3) N/CA/C (NaN where unknown) -> (tokens (B, L)
        int32, z (B, L, d_out), valid (B, L) bool).

        return_zq=True additionally returns the quantized codebook vectors
        z_q = codebook[tokens] (f32, (B, L, d_out)) for VQ-VAE training
        (straight-through estimator + commitment/codebook losses in
        train/vqvae.py); invalid positions carry codebook[0] there and must
        be masked by the caller via ``valid``.
        """
        cfg = self.cfg
        B, L, _, _ = coords.shape
        K = min(cfg.knn, L)
        affine, affine_ok = build_affine3d_from_coordinates(coords)
        if valid_mask is None:
            valid_mask = affine_ok
        else:
            valid_mask = valid_mask & affine_ok
        if residue_index is None:
            residue_index = jnp.broadcast_to(jnp.arange(L)[None], (B, L))

        ca = affine.trans  # (B, L, 3)
        idx, neigh_ok = knn_graph(ca, valid_mask, K)

        # gather neighborhoods with take_along_axis on a flattened K axis
        flat_idx = idx.reshape(B, L * K)
        rot_n = jnp.take_along_axis(
            affine.rot, flat_idx[:, :, None, None], axis=1
        ).reshape(B, L, K, 3, 3)
        trans_n = jnp.take_along_axis(
            affine.trans, flat_idx[:, :, None], axis=1
        ).reshape(B, L, K, 3)
        res_n = jnp.take_along_axis(residue_index, flat_idx, axis=1).reshape(
            B, L, K)

        rel = jnp.clip(
            res_n - residue_index[:, :, None], -cfg.rel_pos_bins,
            cfg.rel_pos_bins,
        ) + cfg.rel_pos_bins
        # invalid neighbors get a dedicated bucket
        rel = jnp.where(neigh_ok, rel, 2 * cfg.rel_pos_bins + 1)
        s = nn.Embed(
            2 * cfg.rel_pos_bins + 2, cfg.d_model,
            dtype=jnp.dtype(cfg.dtype), name="relative_position_embed",
        )(rel)  # (B, L, K, d)

        # fold neighborhoods into the batch axis: (B*L, K, ...)
        s = s.reshape(B * L, K, cfg.d_model)
        local_affine = Affine3D(
            rot=rot_n.reshape(B * L, K, 3, 3),
            trans=trans_n.reshape(B * L, K, 3),
        )
        local_mask = neigh_ok.reshape(B * L, K)
        x, _ = TransformerStack(cfg.stack_config(), name="transformer")(
            s, sequence_id=None, affine=local_affine, affine_mask=local_mask,
        )
        center = x[:, 0, :].reshape(B, L, cfg.d_model)
        z = nn.Dense(
            cfg.d_out, dtype=jnp.dtype(cfg.dtype), name="pre_vq_proj"
        )(center)

        codebook = self.param(
            "codebook", nn.initializers.normal(1.0),
            (cfg.n_codes, cfg.d_out), jnp.float32,
        )
        raw = nearest_code(z.astype(jnp.float32), codebook)
        tokens = jnp.where(valid_mask, raw, C.STRUCTURE_MASK_TOKEN)
        if return_zq:
            z_q = jnp.take(codebook, raw, axis=0)  # (B, L, d_out) f32
            return tokens.astype(jnp.int32), z, valid_mask, z_q
        return tokens.astype(jnp.int32), z, valid_mask


def nearest_code(z, codebook):
    """(..., d) x (n, d) -> (...,) nearest-code indices (single MXU matmul)."""
    dots = jnp.einsum("...d,nd->...n", z, codebook,
                      preferred_element_type=jnp.float32)
    d2 = (
        jnp.sum(z * z, axis=-1, keepdims=True)
        - 2.0 * dots
        + jnp.sum(codebook * codebook, axis=-1)
    )
    return jnp.argmin(d2, axis=-1)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    d_model: int = C.VQVAE_DECODER_D_MODEL  # 1280
    n_heads: int = 20
    n_layers: int = 30
    plddt_bins: int = 50
    pae_bins: int = 64
    trans_scale: float = 10.0
    predict_ptm: bool = True
    dtype: str = "bfloat16"
    scan_layers: bool = True
    # rematerialize blocks in backward — inference leaves it off; decoder
    # TRAINING (scripts/quality_campaign.py) needs it for activation memory
    remat: bool = False
    quant: str = "none"  # "int8" = W8A8 stack projections (ops/quant.py)

    def stack_config(self) -> ESM3Config:
        return ESM3Config(
            d_model=self.d_model, n_heads=self.n_heads, v_heads=0,
            n_layers=self.n_layers, n_layers_geom=0, dtype=self.dtype,
            scan_layers=self.scan_layers, remat=self.remat,
            quant=self.quant,
        )


class Dim6RotStructureHead(nn.Module):
    """Predict per-residue frames as 6D rotations + scaled translations and
    place the idealized backbone (N, CA, C) through them."""

    d_model: int
    trans_scale: float = 10.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.d_model, dtype=self.dtype, name="ffn1")(x)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU() default (exact)
        h = LayerNorm(use_bias=True, name="ln")(h)
        p = nn.Dense(9, dtype=self.dtype, name="proj")(h).astype(jnp.float32)
        v1, v2, trans = p[..., 0:3], p[..., 3:6], p[..., 6:9]
        # Gram-Schmidt 6D -> rotation
        e1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-8)
        u2 = v2 - e1 * jnp.sum(e1 * v2, axis=-1, keepdims=True)
        e2 = u2 / jnp.maximum(jnp.linalg.norm(u2, axis=-1, keepdims=True), 1e-8)
        e3 = jnp.cross(e1, e2)
        rot = jnp.stack([e1, e2, e3], axis=-1)  # columns
        trans = trans * self.trans_scale
        ideal = jnp.stack([
            jnp.asarray(rc.IDEALIZED_N),
            jnp.asarray(rc.IDEALIZED_CA),
            jnp.asarray(rc.IDEALIZED_C),
        ])  # (3, 3)
        bb = jnp.einsum("...ij,aj->...ai", rot, ideal) + trans[..., None, :]
        return bb, Affine3D(rot=rot, trans=trans)


class StructureTokenDecoder(nn.Module):
    cfg: DecoderConfig = DecoderConfig()

    @nn.compact
    def __call__(self, structure_tokens, compute_ptm: bool = True,
                 pack: int = 1, inputs_embeds=None, lengths=None):
        """(B, L) int tokens -> dict(bb_pred (B, L, 3, 3), plddt (B, L),
        ptm (B,)).

        compute_ptm=False skips the pairwise O(B*L^2*bins) aligned-error
        head at call time (params still exist) — coordinate-only decoding of
        long-chain ensembles would otherwise OOM on it.

        inputs_embeds: optional (B, L, d_model) continuous inputs replacing
        the token embedding lookup — the VQ-VAE trainer (train/vqvae.py)
        feeds straight-through codebook vectors here so gradients reach the
        encoder.  In that mode the ``embed`` table is never created; the
        trainer materializes it (codebook @ bridge kernel + special rows) at
        export so the saved checkpoint is this standard layout.

        lengths: optional (B,) int32 valid prefix lengths — positions past a
        row's length are masked OUT of attention (segment mask), so decoding
        L-bucket-padded rows computes the same function for the valid prefix
        as an exact-length program.  This is what lets decode share one
        compiled program across targets of different chain lengths instead
        of minting a (B, L_exact) executable per target.
        """
        cfg = self.cfg
        if inputs_embeds is not None:
            x = inputs_embeds.astype(jnp.dtype(cfg.dtype))
        else:
            x = nn.Embed(
                C.STRUCTURE_VOCAB_SIZE, cfg.d_model,
                dtype=jnp.dtype(cfg.dtype),
                param_dtype=jnp.float32, name="embed",
            )(structure_tokens)
        if pack > 1 or lengths is not None:
            # Sequence-packed stack execution (ops/packing.py): k rows share
            # one device row under a block-diagonal segment mask with
            # per-segment rotary positions.  The unpacked decoder attends
            # unmasked over each full row, and a packed segment attends
            # exactly its own full segment — the same key sets — so this is
            # the same function (bitwise on CPU; tests/test_packing.py).
            # With ``lengths``, pad positions carry a shared -1 id, excluding
            # them from every valid token's key set (k=1 = plain prefix
            # masking).  Heads (incl. the pairwise pTM) always see the
            # unpacked shape.
            from esmdiff_tpu.ops.packing import (
                packed_positions, packed_segment_ids)

            B, L, D = x.shape
            x, _ = TransformerStack(cfg.stack_config(), name="decoder_stack")(
                x.reshape(B // pack, pack * L, D),
                sequence_id=packed_segment_ids(lengths, L, pack),
                positions=packed_positions(L, pack),
            )
            x = x.reshape(B, L, D)
        else:
            x, _ = TransformerStack(cfg.stack_config(),
                                    name="decoder_stack")(x)
        bb_pred, _ = Dim6RotStructureHead(
            cfg.d_model, trans_scale=cfg.trans_scale,
            dtype=jnp.dtype(cfg.dtype), name="affine_output_projection",
        )(x)
        out = {"bb_pred": bb_pred}

        plddt_logits = RegressionHead(
            cfg.plddt_bins, dtype=jnp.dtype(cfg.dtype), name="plddt_head",
        )(x)
        centers = (jnp.arange(cfg.plddt_bins, dtype=jnp.float32) + 0.5) \
            / cfg.plddt_bins
        out["plddt"] = jnp.einsum(
            "blv,v->bl", jax.nn.softmax(plddt_logits, axis=-1), centers)

        if cfg.predict_ptm:
            # pairwise aligned-error logits from low-rank per-residue features,
            # pTM via the AlphaFold TM-score expectation.
            q = nn.Dense(cfg.pae_bins, dtype=jnp.dtype(cfg.dtype),
                         name="pae_q")(x).astype(jnp.float32)
            k = nn.Dense(cfg.pae_bins, dtype=jnp.dtype(cfg.dtype),
                         name="pae_k")(x).astype(jnp.float32)
            if not compute_ptm:
                return out
            pae_logits = q[:, :, None, :] + k[:, None, :, :]  # (B, L, L, bins)
            pae_probs = jax.nn.softmax(pae_logits, axis=-1)
            L = structure_tokens.shape[1]
            max_err = 31.0
            bin_centers = (jnp.arange(cfg.pae_bins) + 0.5) * (
                max_err / cfg.pae_bins)
            d0 = 1.24 * jnp.maximum(L - 15.0, 19.0) ** (1.0 / 3.0) - 1.8
            tm_per_bin = 1.0 / (1.0 + (bin_centers / d0) ** 2)
            ptm_ij = jnp.einsum("blmv,v->blm", pae_probs, tm_per_bin)
            out["ptm"] = ptm_ij.mean(axis=(1, 2))
        return out


def decode_structure_tokens(decoder, params, structure_tokens):
    """Tokens (with BOS/EOS) -> backbone coords with BOS/EOS stripped,
    matching the reference decode contract (slm/models/utils.py:45-80)."""
    out = decoder.apply({"params": params}, structure_tokens)
    return {
        "bb_pred": out["bb_pred"][:, 1:-1],
        "plddt": out["plddt"][:, 1:-1],
        "ptm": out.get("ptm"),
    }
