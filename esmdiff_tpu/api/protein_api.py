"""ESMProtein-style state API over the JAX models.

TPU-native equivalent of the reference's use of ``esm.sdk.api``
(ESMProtein / ESMProteinTensor, slm/sample_esmdiff.py:13-18,56-61;
encode/decode glue slm/models/utils.py:98-164).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.core import protein as protein_io
from esmdiff_tpu.core import residue_constants as rc
from esmdiff_tpu.core.tokenizer import SequenceTokenizer, StructureTokenizer
from esmdiff_tpu.models.esm3 import ESM3, ESM3Config
from esmdiff_tpu.models.vqvae import (
    DecoderConfig,
    EncoderConfig,
    StructureTokenDecoder,
    StructureTokenEncoder,
)
from esmdiff_tpu.nn.layers import TimestepEmbedder


@dataclasses.dataclass
class ESMProtein:
    """Sequence + optional atom37 coordinates."""

    sequence: str
    coordinates: Optional[np.ndarray] = None  # (L, 37, 3), NaN where unknown

    @classmethod
    def from_pdb(cls, path: str | Path, chain_id: str | None = None):
        return cls._from_parsed(
            protein_io.from_pdb_file(path, chain_id=chain_id))

    @classmethod
    def from_pdb_string(cls, pdb_str: str, chain_id: str | None = None):
        return cls._from_parsed(
            protein_io.from_pdb_string(pdb_str, chain_id=chain_id))

    @classmethod
    def _from_parsed(cls, prot):
        if isinstance(prot, list):
            prot = prot[0]
        coords = prot.atom_positions.copy()
        coords[prot.atom_mask < 0.5] = np.nan
        return cls(sequence=prot.sequence, coordinates=coords)

    @classmethod
    def from_npz(cls, path: str | Path):
        """Load a curation-pipeline example (cli/preprocess.py npz layout:
        sequence, atom_positions, atom_mask [, chain_index]) — the
        equivalent of the reference dump's pickled input mode
        (scripts/dump.py:29-44,97-98).

        A multi-chain example (complex-mode preprocess) carries a
        per-residue ``chain_index``; a '|' chainbreak is inserted in the
        sequence at each chain transition with a NaN coordinate row, so the
        encode path emits chainbreak tokens on both tracks (the ESM3
        multichain convention the reference gets from the esm package)."""
        with np.load(path) as z:
            coords = z["atom_positions"].astype(np.float32).copy()
            coords[z["atom_mask"] < 0.5] = np.nan
            seq = str(z["sequence"])
            chain_index = (z["chain_index"] if "chain_index" in z.files
                           else None)
        if chain_index is not None:
            breaks = np.where(np.diff(chain_index) != 0)[0]
            if len(breaks):
                coords = np.insert(coords, breaks + 1, np.nan, axis=0)
                chars = list(seq)
                for b in reversed(breaks.tolist()):
                    chars.insert(b + 1, "|")
                seq = "".join(chars)
        return cls(sequence=seq, coordinates=coords)

    def to_pdb(self, path: str | Path):
        prot = self.to_protein()
        protein_io.to_pdb_file(prot, path)

    def to_protein(self) -> protein_io.Protein:
        L = len(self.sequence)
        if self.coordinates is None:
            raise ValueError("No coordinates to write")
        coords = np.nan_to_num(self.coordinates, nan=0.0)
        mask = np.isfinite(self.coordinates).all(axis=-1).astype(np.float32)
        return protein_io.Protein(
            atom_positions=coords.astype(np.float32),
            atom_mask=mask,
            aatype=rc.sequence_to_restype_indices(self.sequence),
            residue_index=np.arange(1, L + 1, dtype=np.int32),
            b_factors=np.zeros((L, rc.atom_type_num), dtype=np.float32),
        )

    def backbone(self) -> np.ndarray:
        """(L, 3, 3) N/CA/C with NaN where unknown."""
        idx = list(rc.BACKBONE_ATOM_INDICES)
        return self.coordinates[:, idx, :]


@dataclasses.dataclass
class ESMProteinTensor:
    """Tokenized protein (BOS/EOS included on both tracks)."""

    sequence: np.ndarray                      # (L+2,) int32
    structure: Optional[np.ndarray] = None    # (L+2,) int32
    coordinates: Optional[np.ndarray] = None  # (L, 37, 3)


class ESM3Runtime:
    """Bundles the trunk + VQ-VAE modules with their parameters and exposes
    the encode / decode / forward surface the samplers and CLIs use."""

    def __init__(
        self,
        trunk: ESM3,
        trunk_params,
        encoder: StructureTokenEncoder,
        encoder_params,
        decoder: StructureTokenDecoder,
        decoder_params,
        sigma_embedder: Optional[TimestepEmbedder] = None,
        sigma_params=None,
    ):
        self.trunk = trunk
        self.trunk_params = trunk_params
        self.encoder = encoder
        # Commit the VQ-VAE param trees to device ONCE.  Checkpoint loaders
        # hand back host numpy trees, and jit re-uploads host arguments on
        # EVERY call — for the campaign decoder (~360 MB f32) that was
        # 17-27 s per decode_batch over the tunneled runtime, dwarfing the
        # actual forward.  device_put is a no-op for already-committed
        # (incl. sharded) arrays, so mesh/test paths are unchanged.
        self.encoder_params = jax.device_put(encoder_params)
        self.decoder = decoder
        self.decoder_params = jax.device_put(decoder_params)
        self.sigma_embedder = sigma_embedder
        self.sigma_params = sigma_params
        self.seq_tokenizer = SequenceTokenizer()
        self._jit_encode = jax.jit(
            lambda p, bb: self.encoder.apply(p, bb))
        self._jit_decode = jax.jit(
            lambda p, t, pack=1, lengths=None: self.decoder.apply(
                p, t, compute_ptm=False, pack=pack, lengths=lengths),
            static_argnames=("pack",))

    # -- construction ---------------------------------------------------------
    @classmethod
    def random_init(
        cls,
        seed: int = 0,
        trunk_cfg: Optional[ESM3Config] = None,
        encoder_cfg: Optional[EncoderConfig] = None,
        decoder_cfg: Optional[DecoderConfig] = None,
        with_sigma_embedder: bool = True,
        init_len: int = 16,
    ) -> "ESM3Runtime":
        """Random weights — for tests, benchmarks, and pre-conversion dev."""
        trunk_cfg = trunk_cfg or ESM3Config()
        encoder_cfg = encoder_cfg or EncoderConfig()
        decoder_cfg = decoder_cfg or DecoderConfig()
        keys = jax.random.split(jax.random.PRNGKey(seed), 4)
        trunk = ESM3(trunk_cfg)
        seq = jnp.full((1, init_len), 5, dtype=jnp.int32)
        dummy_coords = jnp.zeros((1, init_len, 3, 3), jnp.float32)
        # jit the inits: eager init = thousands of tiny dispatches, which is
        # pathological on high-latency (tunneled) devices
        trunk_params = jax.jit(
            lambda k: trunk.init(k, sequence_tokens=seq,
                                 structure_coords=dummy_coords)
        )(keys[0])["params"]
        encoder = StructureTokenEncoder(encoder_cfg)
        bb = jax.random.normal(keys[1], (1, init_len, 3, 3)) * 3.0
        encoder_params = jax.jit(
            lambda k: encoder.init(k, bb))(keys[1])["params"]
        decoder = StructureTokenDecoder(decoder_cfg)
        toks = jnp.full((1, init_len), 7, dtype=jnp.int32)
        decoder_params = jax.jit(
            lambda k: decoder.init(k, toks))(keys[2])["params"]
        sig = sig_params = None
        if with_sigma_embedder:
            sig = TimestepEmbedder(
                hidden_size=trunk_cfg.d_model, dtype=trunk_cfg.jnp_dtype)
            sig_params = jax.jit(
                lambda k: sig.init(k, jnp.zeros((1,), jnp.float32))
            )(keys[3])["params"]
        return cls(trunk, trunk_params, encoder, encoder_params, decoder,
                   decoder_params, sig, sig_params)

    def quantize(self, mode: str = "int8",
                 include_decoder: bool = False) -> "ESM3Runtime":
        """Return a runtime whose trunk runs W8A8 int8 projections
        (ops/quant.py) — the MXU's 2x int8 path, with int8 weights cutting
        per-step weight HBM traffic 4x vs the fp32 tree.  Inference-only;
        attention cores, LayerNorms, output heads and the kNN encoder stay
        bf16/fp32.

        include_decoder=True additionally quantizes the VQ decoder stack.
        Default OFF: measured coordinate drift on the trained round-3
        campaign decoder was 0.31 A mean / 0.98 A max (PERF.md) — material
        against a sub-A decode target, while decode is a minor share of
        serving wall.  Trunk-only quantization leaves decoded coordinates
        bit-identical given the same sampled tokens."""
        if mode != "int8":
            raise ValueError(f"unknown quantization mode: {mode}")
        from esmdiff_tpu.ops.quant import quantize_trunk_params

        cfg = dataclasses.replace(self.trunk.cfg, quant="int8",
                                  qkv_backend="xla")
        q_params = jax.jit(quantize_trunk_params)(self.trunk_params)
        decoder, decoder_params = self.decoder, self.decoder_params
        if include_decoder:
            dec_cfg = dataclasses.replace(self.decoder.cfg, quant="int8")
            decoder = StructureTokenDecoder(dec_cfg)
            decoder_params = jax.jit(quantize_trunk_params)(
                self.decoder_params)
        return ESM3Runtime(
            ESM3(cfg), q_params, self.encoder, self.encoder_params,
            decoder, decoder_params, self.sigma_embedder,
            self.sigma_params,
        )

    # -- encode ---------------------------------------------------------------
    def encode(self, prot: ESMProtein) -> ESMProteinTensor:
        """Sequence tokens (+ structure tokens from coordinates if present),
        with BOS/EOS — the front door of the reference's protseq_to_data
        (slm/models/utils.py:105-146)."""
        seq_tokens = self.seq_tokenizer.encode(prot.sequence)
        structure = None
        if prot.coordinates is not None:
            bb = prot.backbone()
            # Inf coordinates mark positions to inpaint (reference
            # slm/models/utils.py:117-123): treat non-finite as unknown.
            tokens, _, valid = self._jit_encode(
                {"params": self.encoder_params}, jnp.asarray(bb)[None])
            tokens = np.asarray(tokens[0])
            structure = StructureTokenizer.add_bos_eos(
                tokens.astype(np.int32))
            structure[0] = C.STRUCTURE_BOS_TOKEN
            structure[-1] = C.STRUCTURE_EOS_TOKEN
            # multichain: tie structure chainbreaks to the sequence ones
            # (the esm package's encode does this; the trunk additionally
            # re-ties at embed time, models/esm3.py:309-321)
            structure = np.where(
                seq_tokens == C.SEQUENCE_CHAINBREAK_TOKEN,
                np.int32(C.STRUCTURE_CHAINBREAK_TOKEN), structure)
        return ESMProteinTensor(
            sequence=seq_tokens,
            structure=structure,
            coordinates=prot.coordinates,
        )

    # -- decode ---------------------------------------------------------------
    def decode(self, pt: ESMProteinTensor) -> ESMProtein:
        """Structure tokens -> backbone coords -> atom37 protein with inferred
        oxygen (reference decode, slm/sample_esmdiff.py:41-61 +
        slm/models/utils.py:45-80)."""
        prots = self.decode_batch(
            pt.structure[None], [self.seq_tokenizer.decode(pt.sequence)])
        return prots[0]

    def encode_decode(self, pdb_path: str | Path) -> tuple[np.ndarray, np.ndarray]:
        """Tokenize a structure and decode it back: (coords, coords_pred),
        both (L, 37, 3) — the reference's round-trip fidelity probe
        (slm/models/utils.py:166-193)."""
        prot = ESMProtein.from_pdb(pdb_path)
        pt = self.encode(prot)
        pred = self.decode(pt)
        return prot.coordinates, pred.coordinates

    def decode_batch(self, structure_tokens, sequences,
                     lengths=None) -> list[ESMProtein]:
        """Batched VQ-VAE decode — the reference decodes per sample in a
        Python loop (sample_esmdiff.py:225-230); here one batched device call.

        structure_tokens: (N, L+2) with BOS/EOS; sequences: list of N strings.
        lengths: optional (N,) valid row lengths INCLUDING BOS/EOS — rows may
        be padded past their length (L-bucketed decode programs shared across
        targets); pad positions are masked out of decoder attention and
        stripped from the outputs.
        """
        from esmdiff_tpu.ops.packing import pack_factor

        import os as _os
        import time as _time

        timing = _os.environ.get("ESMDIFF_DECODE_TIMING")
        t0 = _time.time()
        toks = jnp.asarray(structure_tokens)
        lens = None if lengths is None else jnp.asarray(lengths, jnp.int32)
        out = self._jit_decode(
            {"params": self.decoder_params}, toks,
            pack=pack_factor(toks.shape[0], toks.shape[1]),
            lengths=lens)
        if timing:
            out = jax.block_until_ready(out)
            t1 = _time.time()
        bb = np.asarray(out["bb_pred"])[:, 1:]  # strip BOS (EOS per row below)
        t2 = _time.time()
        prots = []
        for i, seq in enumerate(sequences):
            # a mismatched sequence/token pairing would otherwise silently
            # yield truncated or EOS/pad-contaminated coordinates (advisor)
            row_len = int(lengths[i]) if lengths is not None \
                else toks.shape[1]
            if len(seq) + 2 != row_len:
                raise ValueError(
                    f"decode_batch row {i}: sequence has {len(seq)} "
                    f"residues but the token row holds {row_len} positions "
                    f"incl. BOS/EOS (expected {len(seq) + 2})")
            p = protein_io.from_backbone(bb[i, :len(seq)], sequence=seq)
            coords = p.atom_positions.copy()
            coords[p.atom_mask < 0.5] = np.nan
            prots.append(ESMProtein(sequence=seq, coordinates=coords))
        if timing:
            print(f"[decode_batch] shape={tuple(toks.shape)} "
                  f"device={t1 - t0:.2f}s fetch={t2 - t1:.2f}s "
                  f"host={_time.time() - t2:.2f}s", flush=True)
        return prots
