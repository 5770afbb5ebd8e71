"""Ensemble generation engine: batched, jit-cached conformation sampling.

TPU-native replacement for the reference inference CLIs' inner machinery
(slm/sample_esmdiff.py:66-233):

  - the memory-aware batch planner (L^2 * B budget, sample_esmdiff.py:75,
    104-112,181-193) is kept, but batches run as identical jitted programs —
    lengths are padded to buckets so XLA compiles once per bucket;
  - the 25-step denoising loop is a single on-device ``lax.scan``
    (diffusion/mdlm.py), not a host loop;
  - VQ-VAE decoding is batched (one device call for the whole ensemble)
    instead of the reference's per-sample Python loop
    (sample_esmdiff.py:225-230).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.diffusion.gibbs import (
    entropy_bounded_unmask_sample,
    iterative_unmask_sample,
)
from esmdiff_tpu.diffusion.mdlm import MDLM, MDLMConfig, shield_special_tokens
from esmdiff_tpu.diffusion.noise import LogLinearNoise, Noise
from .protein_api import ESM3Runtime, ESMProtein

# Reference inference memory budget (sample_esmdiff.py:75).
N_MAX_RESIDUE_SQUARE = 200 * 200 * 105


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    """Parity with esm.sdk.api.GenerationConfig as used by the reference
    (sample_esmdiff.py:116-119)."""

    track: str = "structure"
    num_steps: int = 16
    temperature: float = 1.4
    top_p: float = 0.9


def plan_batches(length_with_specials: int, num_samples: int,
                 budget: int = N_MAX_RESIDUE_SQUARE,
                 max_batch: Optional[int] = None,
                 granularity: int = 1,
                 batch_bucket: int = 32,
                 policy: str = "ladder") -> list[int]:
    """Split num_samples into batches with L^2 * B <= budget
    (reference sample_esmdiff.py:104-112,181-193).

    Batch sizes are drawn from the power-of-two bucket ladder (>= 8, mesh
    ``granularity``-aligned, capped by the memory budget) so XLA compiles one
    program per bucket — and those buckets are SHARED across targets/requests,
    so the compile cost amortizes corpus-wide.

    Two policies trade surplus device work against program count:

    - ``"ladder"`` walks the ladder greedily downward (100 -> 64+32+8 = 104,
      not a single 128), bounding over-generation by the smallest bucket.
      Right when the shapes are already warm (serving, bench steady state).
    - ``"single"`` uses ONE ladder size for every batch (50 -> [32, 32],
      100 -> [64, 64] — pow2 FLOOR of the request), so a request
      compiles/loads exactly one program per L-bucket.  Right for corpus sweeps: on this runtime each extra program
      costs ~10-30 s of compile or persistent-cache retrieval over the
      tunnel (PERF.md gotcha #8) while the surplus rows cost well under a
      second of device time.  Row RNG keys are per-sample, so both policies
      draw identical randomness for a given seed; sampled tokens agree up
      to trunk fp reduction order, which can differ between the policies'
      compiled batch shapes (see :func:`request_row_keys`).

    Callers trim the surplus rows in either policy.
    """
    per = max(1, budget // (length_with_specials * length_with_specials))
    if max_batch is not None:
        per = min(per, max_batch)
    g = max(1, granularity)
    per = max(g, (per // g) * g)
    min_b = max(8, g)
    min_b = ((min_b + g - 1) // g) * g
    if per >= min_b:
        # keep the memory cap itself on the pow2 ladder so budget-capped
        # batches reuse a ladder shape instead of minting a new one
        per = max(min_b, (1 << (per.bit_length() - 1)) // g * g)

    def cap(v: int) -> int:
        return min(v, max(per, g))  # memory budget always wins

    if policy == "single":
        # pow2 FLOOR of n: total surplus rows match the roundup choice
        # (pow2 arithmetic) while the smaller B is a more canonical bucket,
        # shared across targets with differing sample counts
        b = 1 << max(1, num_samples).bit_length() - 1
        b = cap(max(min_b, (b // g) * g))
        return [b] * (-(-num_samples // b))
    if policy != "ladder":
        raise ValueError(f"unknown plan policy: {policy!r}")

    sizes = []
    left = num_samples
    while left > 0:
        if left >= min_b:
            b = 1 << (left.bit_length() - 1)  # largest pow2 <= left
            b = max(min_b, (b // g) * g)
        else:
            b = min_b  # final round-up: waste < min_b
        sizes.append(cap(b))  # memory budget applied last, always wins
        left -= sizes[-1]
    return sizes


def bucket_length(n: int, multiple: int = 32) -> int:
    """Pad length to a bucket so jit caches stay warm across targets."""
    return ((n + multiple - 1) // multiple) * multiple


def request_row_keys(seed: int, count: int) -> np.ndarray:
    """(count, 2) uint32 PRNG keys for one request's sample rows.

    Row j's key is ``fold_in(PRNGKey(seed), j)`` — a pure function of the
    OWNING request's seed and the row's index within that request.  The
    samplers draw all randomness for a row from its key + the step index, so
    a request's Gumbel/noise draws are bit-identical whether it runs alone
    or coalesced into a shared serving batch with arbitrary co-batched
    traffic (cli/serve.py; VERDICT round-3 weak #2).  One caveat: the
    coalesced batch may compile a different (B, pack) shape than the solo
    run, and XLA's fp reduction order can differ across shapes — sampled
    tokens are identical up to last-ulp trunk logit ties (the same caveat
    as :meth:`MDLM.ddpm_sample` across batch plans).  Re-running the SAME
    traffic mix is always bit-reproducible."""
    base = jax.random.PRNGKey(int(seed))
    return np.asarray(
        jax.vmap(lambda j: jax.random.fold_in(base, j))(jnp.arange(count)))


class EnsembleSampler:
    """Runs ddpm (fine-tuned MDLM) or gibbs (pretrained iterative-unmask)
    ensemble generation over an :class:`ESM3Runtime`."""

    def __init__(self, runtime: ESM3Runtime,
                 noise: Optional[Noise] = None,
                 mdlm_cfg: MDLMConfig = MDLMConfig(),
                 mesh=None,
                 plan_policy: str = "ladder"):
        """mesh: optional jax Mesh with a 'data' axis — the sample batch is
        sharded across it (params replicated), so an ensemble generates in
        parallel across chips (the TPU analogue of the reference's
        single-GPU micro-batching loop).

        plan_policy: batch planning for every ensemble call — "ladder"
        (minimum surplus rows; right for warm serving) or "single" (one
        program per L-bucket; right for corpus sweeps — see plan_batches).
        Both draw identical per-row randomness for a given seed (identical
        ensembles up to trunk fp reduction order across batch shapes)."""
        self.runtime = runtime
        self.plan_policy = plan_policy
        self.noise = noise or LogLinearNoise()
        self.mdlm_cfg = mdlm_cfg
        self.mesh = mesh
        self.mdlm = MDLM(
            runtime.trunk,
            runtime.sigma_embedder,
            noise=self.noise,
            cfg=mdlm_cfg,
        )
        self._mdlm_params = {
            "net": runtime.trunk_params,
            "sigma_embedder": runtime.sigma_params,
        }
        if mesh is not None:
            from esmdiff_tpu.parallel import mesh as pmesh

            rep = pmesh.replicated(mesh)
            self._mdlm_params = jax.device_put(
                self._mdlm_params,
                jax.tree.map(lambda _: rep, self._mdlm_params))
            self._trunk_params_sharded = jax.device_put(
                runtime.trunk_params,
                jax.tree.map(lambda _: rep, runtime.trunk_params))
        self._ddpm_jit_cache: dict = {}
        self._gibbs_jit_cache: dict = {}

    def _gibbs_params(self):
        if self.mesh is not None:
            return self._trunk_params_sharded
        return self.runtime.trunk_params

    def _n_shards(self) -> int:
        return 1 if self.mesh is None else int(self.mesh.devices.size)

    def _device_batch(self, arrays: dict) -> dict:
        """Place per-call batch arrays (replicating or sharding on 'data')."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in arrays.items()}
        from esmdiff_tpu.parallel import mesh as pmesh

        return {
            k: jax.device_put(np.asarray(v),
                              pmesh.data_sharding(self.mesh, np.ndim(v)))
            for k, v in arrays.items()
        }

    # -- shared helpers -------------------------------------------------------
    def _multi_rows(self, sequences: Sequence[str], counts: Sequence[int]):
        """Per-request padded sequence rows, replicated to each request's
        sample count, concatenated into one (N, Lpad) array.  All sequences
        must land in the same length bucket (the serving coalescer groups by
        bucket, so this is an invariant there, an error here)."""
        padded, lws = [], []
        for s in sequences:
            row, lw = self._padded_tokens(s, None)
            padded.append(row)
            lws.append(lw)
        Lpad = len(padded[0])
        if any(len(p) != Lpad for p in padded):
            raise ValueError(
                "coalesced sequences must share a length bucket: got pads "
                f"{sorted({len(p) for p in padded})}")
        seq_rows = np.concatenate(
            [np.tile(p[None], (c, 1)) for p, c in zip(padded, counts)])
        return seq_rows, lws, Lpad

    @staticmethod
    def _split_rows(all_tokens: np.ndarray, lws: Sequence[int],
                    counts: Sequence[int]) -> list[np.ndarray]:
        """Split (N, Lpad) batch rows back per request, trimming each to its
        own interior length (strip BOS/EOS + bucket padding)."""
        out, r = [], 0
        for lw, c in zip(lws, counts):
            out.append(all_tokens[r:r + c, 1:lw - 1])
            r += c
        return out

    def _padded_tokens(self, sequence: str, pad_to: Optional[int]):
        seq_tokens = self.runtime.seq_tokenizer.encode(sequence)
        Lw = len(seq_tokens)
        Lpad = bucket_length(Lw) if pad_to is None else pad_to
        padded = np.full((Lpad,), C.SEQUENCE_PAD_TOKEN, dtype=np.int32)
        padded[:Lw] = seq_tokens
        return padded, Lw

    def _pack(self, B: int, L: int) -> int:
        """Sequence-packing factor for short buckets (ops/packing.py):
        k same-length rows share one device row with a block-diagonal
        segment mask, turning the MXU-underfed short-L attention matmuls
        into MXU-shaped ones (1.46x at the canonical L=64 bucket, PERF.md
        round-3).  Sampler state/RNG stay at (B, L) so results for a given
        seed are unchanged.  Under a data mesh, k is derived from the
        PER-SHARD batch so the packed reshape stays shard-local.
        """
        from esmdiff_tpu.ops.packing import pack_factor

        return pack_factor(B // self._n_shards(), L)

    def _trunk_forward(self, pack: int = 1):
        """(params, tokens, seq_tokens, lengths) -> fp32 shielded logits,
        optionally via the sequence-packed view (callers keep (B, L))."""
        stock_head = self.runtime.trunk.cfg.head_type == "esm3"
        trunk = self.runtime.trunk

        def forward(params, tokens, seq_tokens, lengths):
            if pack > 1:
                from esmdiff_tpu.ops.packing import (
                    packed_positions, packed_segment_ids)

                B, L = tokens.shape
                out = trunk.apply(
                    {"params": params},
                    structure_tokens=tokens.reshape(B // pack, pack * L),
                    sequence_tokens=seq_tokens.reshape(B // pack, pack * L),
                    sequence_id=packed_segment_ids(lengths, L, pack),
                    positions=packed_positions(L, pack),
                )
                logits = out.structure_logits.reshape(B, L, -1)
            else:
                out = trunk.apply(
                    {"params": params},
                    structure_tokens=tokens,
                    sequence_tokens=seq_tokens,
                    lengths=lengths,
                )
                logits = out.structure_logits
            logits = logits.astype(jnp.float32)
            if not stock_head:
                logits = shield_special_tokens(logits)
            return logits

        return forward

    # -- ddpm -----------------------------------------------------------------
    def _ddpm_fn(self, B: int, L: int, num_steps: int, eps: float,
                 sample_max_t: float, use_prior: bool):
        pack = self._pack(B, L)

        def fn(params, row_keys, seq_tokens, lengths, prior):
            sampler = MDLM(
                self.runtime.trunk, self.runtime.sigma_embedder,
                noise=self.noise, cfg=self.mdlm_cfg)
            return sampler.ddpm_sample(
                params, None, seq_tokens,
                num_steps=num_steps, eps=eps,
                input_prior=prior if use_prior else None,
                sample_max_t=sample_max_t,
                lengths=lengths,
                pack=pack,
                row_keys=row_keys,
            )

        return jax.jit(fn)

    def ddpm_ensemble(
        self,
        sequence: str,
        num_samples: int,
        num_steps: int = 25,
        eps: float = 1e-5,
        seed: int = 0,
        mask_ids: Optional[Sequence[int]] = None,
        filled_ids: Optional[Sequence[int]] = None,
        structure_tokens: Optional[np.ndarray] = None,
        sample_max_t: float = 1.0,
        budget: int = N_MAX_RESIDUE_SQUARE,
        max_batch: Optional[int] = None,
        ref_compat: bool = False,
    ) -> np.ndarray:
        """Generate ``num_samples`` structure-token strings for ``sequence``.

        Returns (num_samples, L) int32 tokens, BOS/EOS stripped — ready for
        decode.  When mask_ids/filled_ids are given, ``structure_tokens``
        (with BOS/EOS) provides the inpainting prior
        (reference sample_esmdiff.py:196-209).

        ref_compat: the reference masks TOKEN position ``idx`` in the BOS-led
        array (sample_esmdiff.py:201-202), i.e. RESIDUE ``idx-1`` — an
        apparent off-by-one vs its own gibbs-mode sequence-char masking.  The
        default here masks residue ``idx`` (consistent semantics);
        ``ref_compat=True`` reproduces the reference's indexing bit-for-bit
        for output-level parity runs.
        """
        use_prior = mask_ids is not None or filled_ids is not None
        if not use_prior:
            # the multi engine with one request is bitwise-identical (same
            # rows, same per-batch key splits) — keep ONE code path warm
            return self.ddpm_ensemble_multi(
                [sequence], [num_samples], num_steps=num_steps, eps=eps,
                seed=seed, sample_max_t=sample_max_t, budget=budget,
                max_batch=max_batch)[0]
        seq_padded, Lw = self._padded_tokens(sequence, None)
        Lpad = len(seq_padded)

        off = 0 if ref_compat else 1  # +1 maps residue idx -> token idx
        prior_row = np.full((Lpad,), C.STRUCTURE_PAD_TOKEN, dtype=np.int32)
        assert structure_tokens is not None
        prior_row[:Lw] = structure_tokens
        if mask_ids is not None:
            for idx in mask_ids:
                prior_row[idx + off] = C.STRUCTURE_MASK_TOKEN
        else:
            keep = set(filled_ids)
            for idx in range(Lw - 2):
                if idx not in keep:
                    prior_row[idx + off] = C.STRUCTURE_MASK_TOKEN

        sizes = plan_batches(Lw, num_samples, budget, max_batch,
                             granularity=self._n_shards(),
                             policy=self.plan_policy)
        row_keys = request_row_keys(seed, num_samples)
        outs = []
        start = 0
        for bi, B in enumerate(sizes):
            cache_key = (B, Lpad, num_steps, eps, sample_max_t)
            if cache_key not in self._ddpm_jit_cache:
                self._ddpm_jit_cache[cache_key] = self._ddpm_fn(
                    B, Lpad, num_steps, eps, sample_max_t, True)
            fn = self._ddpm_jit_cache[cache_key]
            # surplus rows (plan round-up) clamp to the last sample's key;
            # they are trimmed below
            kidx = np.minimum(np.arange(start, start + B), num_samples - 1)
            batch = self._device_batch({
                "seq": np.tile(seq_padded[None], (B, 1)),
                "prior": np.tile(prior_row[None], (B, 1)),
                "keys": row_keys[kidx],
            })
            seq_b = batch["seq"]
            # padding is a contiguous suffix by _padded_tokens construction,
            # so prefix lengths fully describe the mask (flash-eligible)
            lengths = jnp.sum(seq_b != C.SEQUENCE_PAD_TOKEN, axis=-1,
                              dtype=jnp.int32)
            toks = fn(self._mdlm_params, batch["keys"], seq_b, lengths,
                      batch["prior"])
            outs.append(np.asarray(toks)[:, :Lw])
            start += B
        tokens = np.concatenate(outs, axis=0)[:num_samples]
        return tokens[:, 1:-1]  # strip BOS/EOS (reference :220-221)

    def ddpm_ensemble_multi(
        self,
        sequences: Sequence[str],
        counts: Sequence[int],
        num_steps: int = 25,
        eps: float = 1e-5,
        seed: int = 0,
        sample_max_t: float = 1.0,
        budget: int = N_MAX_RESIDUE_SQUARE,
        max_batch: Optional[int] = None,
        seeds: Optional[Sequence[int]] = None,
    ) -> list[np.ndarray]:
        """Coalesced ddpm generation: several same-bucket requests share one
        batch plan and the SAME warm per-bucket executables (the programs take
        sequence tokens per row, so nothing recompiles).  Returns one
        (counts[i], L_i) interior-token array per request.  No inpainting —
        the serving layer routes prior-conditioned requests to
        :meth:`ddpm_ensemble`.

        seeds: one PRNG seed PER REQUEST (defaults to ``seed + i``).  Row
        keys derive from the owning request's seed + row index
        (:func:`request_row_keys`), so each request's randomness is
        independent of co-batched traffic; its ensemble matches a solo run
        with the same seed up to trunk fp reduction order across the two
        batch shapes (see request_row_keys)."""
        seq_rows, lws, Lpad = self._multi_rows(sequences, counts)
        N = seq_rows.shape[0]
        if seeds is None:
            seeds = [seed + i for i in range(len(sequences))]
        key_rows = np.concatenate([
            request_row_keys(s, c) for s, c in zip(seeds, counts)])
        prior_rows = np.full((N, Lpad), C.STRUCTURE_PAD_TOKEN, dtype=np.int32)
        r = 0
        for lw, c in zip(lws, counts):
            prior_rows[r:r + c, :lw] = C.STRUCTURE_MASK_TOKEN
            r += c

        sizes = plan_batches(max(lws), N, budget, max_batch,
                             granularity=self._n_shards(),
                             policy=self.plan_policy)
        outs = []
        start = 0
        for B in sizes:
            cache_key = (B, Lpad, num_steps, eps, sample_max_t)
            if cache_key not in self._ddpm_jit_cache:
                self._ddpm_jit_cache[cache_key] = self._ddpm_fn(
                    B, Lpad, num_steps, eps, sample_max_t, True)
            fn = self._ddpm_jit_cache[cache_key]
            # the plan's final round-up batch may exceed the remaining rows:
            # clamp the cursor (surplus rows re-sample the last request and
            # are trimmed by _split_rows)
            idx = np.minimum(np.arange(start, start + B), N - 1)
            batch = self._device_batch({
                "seq": seq_rows[idx], "prior": prior_rows[idx],
                "keys": key_rows[idx]})
            seq_b = batch["seq"]
            lengths = jnp.sum(seq_b != C.SEQUENCE_PAD_TOKEN, axis=-1,
                              dtype=jnp.int32)
            toks = fn(self._mdlm_params, batch["keys"], seq_b, lengths,
                      batch["prior"])
            outs.append(np.asarray(toks))
            start += B
        return self._split_rows(np.concatenate(outs, axis=0), lws, counts)

    # -- cross-length packed ddpm ----------------------------------------------
    # Measured per-row step cost of the full-size int8 trunk on v5e
    # (PERF.md length matrix: ms/step / rows at T=64..1024).  Slightly
    # SUPERLINEAR in row width — packing two 124-token segments into one
    # 256-wide row costs 4.99 ms vs 2 x 2.02 ms as native 128 rows — so
    # max-width packing is NOT universally faster; the router below picks
    # per-bucket batching vs heterogeneous packing by modeled cost.  Only
    # the SHAPE of this curve matters (routing threshold), so it is safe
    # for other model sizes up to routing suboptimality, never correctness.
    _ROW_COST_POINTS = ((64, 1.12), (128, 2.02), (256, 4.99),
                        (512, 10.8), (1024, 21.5))

    @classmethod
    def _row_step_cost(cls, T: int) -> float:
        pts = cls._ROW_COST_POINTS
        if T <= pts[0][0]:
            return pts[0][1] * T / pts[0][0]
        for (t0, c0), (t1, c1) in zip(pts, pts[1:]):
            if T <= t1:
                return c0 + (c1 - c0) * (T - t0) / (t1 - t0)
        t1, c1 = pts[-1]
        return c1 * T / t1

    def _mixed_route(self, lws: Sequence[int], counts: Sequence[int],
                     T: int) -> tuple[str, float, float]:
        """('packed'|'split', packed_cost, split_cost) for a mixed group.

        split: each bucket runs its own native batch; same-bucket packing to
        PACK_TARGET_LEN (ops/packing.py) means a segment of bucket Lb shares
        a W=max(Lb, 128)-wide row with W//Lb peers.
        packed: FFD layout into T-wide rows.
        """
        from esmdiff_tpu.ops.packing import PACK_TARGET_LEN, plan_segment_rows

        split = 0.0
        for lw, c in zip(lws, counts):
            Lb = bucket_length(lw)
            W = max(Lb, PACK_TARGET_LEN)
            split += c * self._row_step_cost(W) / max(1, W // Lb)
        seg_lens = [lw for lw, c in zip(lws, counts) for _ in range(c)]
        packed = len(plan_segment_rows(seg_lens, T)) * self._row_step_cost(T)
        return ("packed" if packed < split * 0.98 else "split",
                packed, split)

    def ddpm_ensemble_mixed(
        self,
        sequences: Sequence[str],
        counts: Sequence[int],
        num_steps: int = 25,
        eps: float = 1e-5,
        seeds: Optional[Sequence[int]] = None,
        max_batch: Optional[int] = None,
        budget: int = N_MAX_RESIDUE_SQUARE,
    ) -> list[np.ndarray]:
        """Cost-routed mixed-length coalescing (the serving entry point for
        groups spanning length buckets).

        Routes to :meth:`ddpm_ensemble_packed` (one heterogeneous (R, T)
        program) when the modeled device cost beats per-bucket batching —
        true for low-occupancy mixes where native buckets would run ragged
        underfilled batches — and otherwise runs each bucket's sub-group
        through :meth:`ddpm_ensemble_multi` (native row widths are cheaper
        per token at high occupancy: the measured row cost is superlinear in
        width).  Either way the whole group is planned together, so every
        request's result lands when the group finishes.  Per-request seeds
        keep draws traffic-independent in both routes."""
        if seeds is None:
            seeds = list(range(len(sequences)))
        lws = [len(self.runtime.seq_tokenizer.encode(s)) for s in sequences]
        T = max(128, bucket_length(max(lws), 64))
        route, _, _ = self._mixed_route(lws, counts, T)
        if route == "packed":
            return self.ddpm_ensemble_packed(
                sequences, counts, num_steps=num_steps, eps=eps,
                seeds=seeds, budget=budget)
        results: list = [None] * len(sequences)
        by_bucket: dict[int, list[int]] = {}
        for i, lw in enumerate(lws):
            by_bucket.setdefault(bucket_length(lw), []).append(i)
        for _, idxs in sorted(by_bucket.items()):
            outs = self.ddpm_ensemble_multi(
                [sequences[i] for i in idxs], [counts[i] for i in idxs],
                num_steps=num_steps, eps=eps,
                seeds=[seeds[i] for i in idxs], max_batch=max_batch,
                budget=budget)
            for i, o in zip(idxs, outs):
                results[i] = o
        return results

    def _ddpm_packed_fn(self, R: int, T: int, num_steps: int, eps: float,
                        sample_max_t: float):
        cache_key = ("packed", R, T, num_steps, eps, sample_max_t)
        if cache_key not in self._ddpm_jit_cache:
            def fn(params, pos_keys, seq_tokens, seg_ids, positions, prior):
                sampler = MDLM(
                    self.runtime.trunk, self.runtime.sigma_embedder,
                    noise=self.noise, cfg=self.mdlm_cfg)
                return sampler.ddpm_sample(
                    params, None, seq_tokens, num_steps=num_steps, eps=eps,
                    input_prior=prior, sample_max_t=sample_max_t,
                    sequence_id=seg_ids, positions=positions,
                    pos_keys=pos_keys)
            self._ddpm_jit_cache[cache_key] = jax.jit(fn)
        return self._ddpm_jit_cache[cache_key]

    def ddpm_ensemble_packed(
        self,
        sequences: Sequence[str],
        counts: Sequence[int],
        num_steps: int = 25,
        eps: float = 1e-5,
        sample_max_t: float = 1.0,
        budget: int = N_MAX_RESIDUE_SQUARE,
        seeds: Optional[Sequence[int]] = None,
        row_width: Optional[int] = None,
    ) -> list[np.ndarray]:
        """Cross-length coalesced ddpm: requests from DIFFERENT length
        buckets share device rows.

        Each sample is a segment; segments pack first-fit-decreasing into
        rows of fixed width T (>= the largest bucket) with a block-diagonal
        segment mask and per-segment rotary restart — the machinery
        ops/packing.py already proved bitwise-exact for uniform segments,
        generalized to a ragged layout.  This closes the round-4 serve SLO
        gap: mixed 58/120/250 traffic previously serialized one executable
        per bucket (PERF.md round-4 SLO: 11.7 conf/s aggregate); here it
        runs as ONE (R, T) program.  The reference's ragged one-batch
        inference: slm/sample_esmdiff.py:181-193.

        Determinism: every draw for a sample position uses the key
        ``fold_in(fold_in(PRNGKey(request_seed), sample_idx), pos)`` —
        identical to the solo/same-bucket paths (mdlm.position_keys), so a
        request's randomness never depends on co-batched traffic; token
        outputs are additionally bitwise-invariant to the CONTENT of
        co-packed segments at a fixed layout (masked attention contributes
        exact zeros), and match a solo run up to trunk fp reduction order
        across layouts (tests/test_packed_multi.py).

        Returns one (counts[i], L_i) interior-token array per request.
        """
        from esmdiff_tpu.diffusion.mdlm import position_keys
        from esmdiff_tpu.ops.packing import plan_segment_rows

        if seeds is None:
            seeds = list(range(len(sequences)))
        seq_toks, lws = [], []
        for s in sequences:
            t = np.asarray(self.runtime.seq_tokenizer.encode(s), np.int32)
            seq_toks.append(t)
            lws.append(len(t))
        # (request, sample) -> one segment each, in request-major order
        segs = [(i, j) for i, c in enumerate(counts) for j in range(c)]
        seg_lens = [lws[i] for i, _ in segs]
        T = row_width or max(128, bucket_length(max(lws), 64))
        rows = plan_segment_rows(seg_lens, T)
        R = len(rows)
        # rows per program: memory budget (reference L^2*B bound) on the
        # packed width, pow2-bucketed, mesh-granular
        g = self._n_shards()
        max_rows = max(g, (budget // (T * T)) // g * g)
        pow2_floor = 1 << max(0, max_rows.bit_length() - 1)
        # pow2 ladder with the same min as plan_batches: serving groups of
        # varying size land on a handful of shared (Rb, T) programs
        Rb = min(pow2_floor, max(8, _pow2_at_least(R)))
        Rb = max(g, Rb // g * g)

        # per-request (count, lw, 2) position keys — the SAME fold chain the
        # unpacked paths derive on device (mdlm.position_keys)
        pkeys_req = [
            np.asarray(position_keys(
                jnp.asarray(request_row_keys(seeds[i], c)), lws[i]))
            for i, c in enumerate(counts)
        ]

        out_per_seg: list = [None] * len(segs)
        fn = self._ddpm_packed_fn(Rb, T, num_steps, eps, sample_max_t)
        for start in range(0, R, Rb):
            chunk = rows[start:start + Rb]
            seq_a = np.full((Rb, T), C.SEQUENCE_PAD_TOKEN, np.int32)
            prior = np.full((Rb, T), C.STRUCTURE_PAD_TOKEN, np.int32)
            segid = np.full((Rb, T), -1, np.int32)
            posit = np.zeros((Rb, T), np.int32)
            pkeys = np.zeros((Rb, T, 2), np.uint32)
            placed = []                      # (global_seg, row, offset, lw)
            for r, row in enumerate(chunk):
                off = 0
                for s_local, gseg in enumerate(row):
                    i, j = segs[gseg]
                    lw = lws[i]
                    seq_a[r, off:off + lw] = seq_toks[i]
                    prior[r, off:off + lw] = C.STRUCTURE_MASK_TOKEN
                    segid[r, off:off + lw] = s_local
                    posit[r, off:off + lw] = np.arange(lw)
                    pkeys[r, off:off + lw] = pkeys_req[i][j]
                    placed.append((gseg, r, off, lw))
                    off += lw
            batch = self._device_batch({
                "seq": seq_a, "prior": prior, "segid": segid,
                "pos": posit, "keys": pkeys})
            toks = np.asarray(fn(
                self._mdlm_params, batch["keys"], batch["seq"],
                batch["segid"], batch["pos"], batch["prior"]))
            for gseg, r, off, lw in placed:
                out_per_seg[gseg] = toks[r, off + 1:off + lw - 1]
        res, k = [], 0
        for c in counts:
            res.append(np.stack(out_per_seg[k:k + c]))
            k += c
        return res

    # -- gibbs ----------------------------------------------------------------
    def _gibbs_fn(self, B: int, Lpad: int, config: GenerationConfig):
        """Jitted per-bucket iterative-unmask program (shared by the single
        and coalesced paths; cached by (B, Lpad, steps, T, top_p))."""
        cache_key = (B, Lpad, config.num_steps, config.temperature,
                     config.top_p)
        if cache_key not in self._gibbs_jit_cache:
            # pack is a pure function of (B, Lpad), both in cache_key
            forward = self._trunk_forward(self._pack(B, Lpad))

            # NB: params must be a jit ARGUMENT — closing over them bakes
            # GBs of weights into the HLO as constants (see PERF.md).
            def fn(params, row_keys, init, dmask, seq_tokens, lengths,
                   _fwd=forward, _steps=config.num_steps,
                   _t=config.temperature, _p=config.top_p):
                return iterative_unmask_sample(
                    lambda toks: _fwd(params, toks, seq_tokens, lengths),
                    None, init, dmask, num_steps=_steps,
                    temperature=_t, top_p=_p, row_keys=row_keys,
                )
            self._gibbs_jit_cache[cache_key] = jax.jit(fn)
        return self._gibbs_jit_cache[cache_key]

    def gibbs_ensemble(
        self,
        sequence: str,
        num_samples: int,
        config: GenerationConfig = GenerationConfig(),
        seed: int = 0,
        coordinates: Optional[np.ndarray] = None,
        mask_ids: Optional[Sequence[int]] = None,
        budget: int = N_MAX_RESIDUE_SQUARE,
        max_batch: Optional[int] = None,
    ) -> np.ndarray:
        """Iterative confidence-ranked unmasking with the (pretrained) trunk
        (reference minibatch_gibbs_by_esm, sample_esmdiff.py:66-130).

        Returns (num_samples, L) int32 structure tokens, BOS/EOS stripped.
        """
        if mask_ids is not None:
            assert coordinates is not None, "inpainting needs coordinates"
            sequence = "".join(
                "_" if i in set(mask_ids) else ch
                for i, ch in enumerate(sequence)
            )
            coordinates = coordinates.copy()
            coordinates[list(mask_ids)] = np.inf

        if coordinates is None:
            # no prior: the multi engine with one request is bitwise-identical
            return self.gibbs_ensemble_multi(
                [sequence], [num_samples], config=config, seed=seed,
                budget=budget, max_batch=max_batch)[0]

        seq_padded, Lw = self._padded_tokens(sequence, None)
        Lpad = len(seq_padded)

        init_row = np.full((Lpad,), C.STRUCTURE_PAD_TOKEN, dtype=np.int32)
        init_row[:Lw] = C.STRUCTURE_MASK_TOKEN
        decode_row = np.zeros((Lpad,), dtype=bool)
        decode_row[1:Lw - 1] = True
        if coordinates is not None:
            # known (finite) coordinates become a fixed prior via the encoder
            prot = ESMProtein(sequence=sequence, coordinates=coordinates)
            pt = self.runtime.encode(prot)
            if pt.structure is not None:
                # judge validity on the backbone slots only — unused atom37
                # slots are NaN for every residue
                known = np.isfinite(coordinates[:, :3]).all(axis=(-1, -2))
                init_row[1:Lw - 1] = np.where(
                    known, pt.structure[1:-1], C.STRUCTURE_MASK_TOKEN)
                decode_row[1:Lw - 1] = ~known

        sizes = plan_batches(Lw, num_samples, budget, max_batch,
                             granularity=self._n_shards(),
                             policy=self.plan_policy)
        row_keys = request_row_keys(seed, num_samples)
        outs = []
        start = 0
        for B in sizes:
            fn = self._gibbs_fn(B, Lpad, config)
            kidx = np.minimum(np.arange(start, start + B), num_samples - 1)
            batch = self._device_batch({
                "seq": np.tile(seq_padded[None], (B, 1)),
                "init": np.tile(init_row[None], (B, 1)),
                "dmask": np.tile(decode_row[None], (B, 1)),
                "keys": row_keys[kidx],
            })
            seq_b = batch["seq"]
            lengths = jnp.sum(seq_b != C.SEQUENCE_PAD_TOKEN, axis=-1,
                              dtype=jnp.int32)
            toks = fn(self._gibbs_params(), batch["keys"], batch["init"],
                      batch["dmask"], seq_b, lengths)
            outs.append(np.asarray(toks)[:, :Lw])
            start += B
        tokens = np.concatenate(outs, axis=0)[:num_samples]
        return tokens[:, 1:-1]

    def gibbs_ensemble_multi(
        self,
        sequences: Sequence[str],
        counts: Sequence[int],
        config: GenerationConfig = GenerationConfig(),
        seed: int = 0,
        budget: int = N_MAX_RESIDUE_SQUARE,
        max_batch: Optional[int] = None,
        seeds: Optional[Sequence[int]] = None,
    ) -> list[np.ndarray]:
        """Coalesced gibbs generation (see :meth:`ddpm_ensemble_multi`):
        same-bucket requests share one batch plan + warm executables.
        Returns one (counts[i], L_i) interior-token array per request.

        seeds: one PRNG seed PER REQUEST (defaults to ``seed + i``); row
        keys derive from the owning request's seed + row index, making each
        request's ensemble independent of co-batched traffic."""
        seq_rows, lws, Lpad = self._multi_rows(sequences, counts)
        N = seq_rows.shape[0]
        if seeds is None:
            seeds = [seed + i for i in range(len(sequences))]
        key_rows = np.concatenate([
            request_row_keys(s, c) for s, c in zip(seeds, counts)])
        init_rows = np.full((N, Lpad), C.STRUCTURE_PAD_TOKEN, dtype=np.int32)
        dmask_rows = np.zeros((N, Lpad), dtype=bool)
        r = 0
        for lw, c in zip(lws, counts):
            init_rows[r:r + c, :lw] = C.STRUCTURE_MASK_TOKEN
            dmask_rows[r:r + c, 1:lw - 1] = True
            r += c

        sizes = plan_batches(max(lws), N, budget, max_batch,
                             granularity=self._n_shards(),
                             policy=self.plan_policy)
        outs = []
        start = 0
        for B in sizes:
            fn = self._gibbs_fn(B, Lpad, config)
            idx = np.minimum(np.arange(start, start + B), N - 1)
            batch = self._device_batch({
                "seq": seq_rows[idx], "init": init_rows[idx],
                "dmask": dmask_rows[idx], "keys": key_rows[idx]})
            seq_b = batch["seq"]
            lengths = jnp.sum(seq_b != C.SEQUENCE_PAD_TOKEN, axis=-1,
                              dtype=jnp.int32)
            toks = fn(self._gibbs_params(), batch["keys"], batch["init"],
                      batch["dmask"], seq_b, lengths)
            outs.append(np.asarray(toks))
            start += B
        return self._split_rows(np.concatenate(outs, axis=0), lws, counts)

    def gibbs_ensemble_mixed(
        self,
        sequences: Sequence[str],
        counts: Sequence[int],
        config: GenerationConfig = GenerationConfig(),
        seeds: Optional[Sequence[int]] = None,
        max_batch: Optional[int] = None,
        budget: int = N_MAX_RESIDUE_SQUARE,
    ) -> list[np.ndarray]:
        """Mixed-length gibbs coalescing: per-bucket sub-groups planned as
        one group (requests spanning buckets no longer split into separate
        serving groups).  Gibbs keeps the per-bucket route unconditionally:
        the measured row-cost curve already favors native widths at
        saturation (see ddpm_ensemble_mixed), and the confidence-ranked
        unmask quotas are per ROW — a heterogeneous packed variant would
        need per-segment quota bookkeeping for a regime the router would
        rarely choose."""
        if seeds is None:
            seeds = list(range(len(sequences)))
        results: list = [None] * len(sequences)
        by_bucket: dict[int, list[int]] = {}
        for i, s in enumerate(sequences):
            lw = len(self.runtime.seq_tokenizer.encode(s))
            by_bucket.setdefault(bucket_length(lw), []).append(i)
        for _, idxs in sorted(by_bucket.items()):
            outs = self.gibbs_ensemble_multi(
                [sequences[i] for i in idxs], [counts[i] for i in idxs],
                config=config, seeds=[seeds[i] for i in idxs],
                max_batch=max_batch, budget=budget)
            for i, o in zip(idxs, outs):
                results[i] = o
        return results

    # -- entropy-bounded adaptive unmasking ------------------------------------
    def eb_ensemble(
        self,
        sequence: str,
        num_samples: int,
        entropy_budget: float = 1.0,
        temperature: float = 1.0,
        top_p: float = 1.0,
        max_steps: int = 64,
        seed: int = 0,
        budget: int = N_MAX_RESIDUE_SQUARE,
        max_batch: Optional[int] = None,
    ) -> np.ndarray:
        """Adaptive-step unmasking (diffusion/gibbs.py::
        entropy_bounded_unmask_sample): commits as many low-entropy tokens
        per trunk forward as the entropy budget allows.  Returns (N, L)
        interior tokens."""
        seq_padded, Lw = self._padded_tokens(sequence, None)
        Lpad = len(seq_padded)
        init_row = np.full((Lpad,), C.STRUCTURE_PAD_TOKEN, dtype=np.int32)
        init_row[:Lw] = C.STRUCTURE_MASK_TOKEN
        decode_row = np.zeros((Lpad,), dtype=bool)
        decode_row[1:Lw - 1] = True

        sizes = plan_batches(Lw, num_samples, budget, max_batch,
                             granularity=self._n_shards(),
                             policy=self.plan_policy)
        row_keys = request_row_keys(seed, num_samples)
        outs = []
        start = 0
        for B in sizes:
            cache_key = ("eb", B, Lpad, entropy_budget, temperature, top_p,
                         max_steps)
            if cache_key not in self._gibbs_jit_cache:
                forward = self._trunk_forward(self._pack(B, Lpad))

                def fn(params, row_keys, init, dmask, seq_tokens, lengths,
                       _fwd=forward, _eb=entropy_budget, _t=temperature,
                       _p=top_p, _ms=max_steps):
                    return entropy_bounded_unmask_sample(
                        lambda toks: _fwd(params, toks, seq_tokens,
                                          lengths),
                        None, init, dmask, entropy_budget=_eb,
                        temperature=_t, top_p=_p, max_steps=_ms,
                        row_keys=row_keys)
                self._gibbs_jit_cache[cache_key] = jax.jit(fn)
            fn = self._gibbs_jit_cache[cache_key]
            kidx = np.minimum(np.arange(start, start + B), num_samples - 1)
            batch = self._device_batch({
                "seq": np.tile(seq_padded[None], (B, 1)),
                "init": np.tile(init_row[None], (B, 1)),
                "dmask": np.tile(decode_row[None], (B, 1)),
                "keys": row_keys[kidx],
            })
            seq_b = batch["seq"]
            lengths = jnp.sum(seq_b != C.SEQUENCE_PAD_TOKEN, axis=-1,
                              dtype=jnp.int32)
            toks, n_steps = fn(self._gibbs_params(), batch["keys"],
                               batch["init"], batch["dmask"], seq_b, lengths)
            outs.append(np.asarray(toks)[:, :Lw])
            start += B
        tokens = np.concatenate(outs, axis=0)[:num_samples]
        return tokens[:, 1:-1]

    # -- decode to proteins -----------------------------------------------------
    def decode_ensemble(self, sequence: str, tokens: np.ndarray,
                        decode_batch: int = 32) -> list[ESMProtein]:
        return decode_tokens_to_proteins(self.runtime, sequence, tokens,
                                         decode_batch)

    def decode_ensemble_multi(self, sequences: Sequence[str],
                              tokens_list: Sequence[np.ndarray],
                              decode_batch: int = 32,
                              ) -> list[list[ESMProtein]]:
        """Coalesced VQ decode: rows from several requests share device
        batches (grouped by LENGTH BUCKET — rows are padded to the bucket
        and pad is masked out of decoder attention), so small concurrent
        requests stop paying per-request decode dispatches and different
        chain lengths within a bucket share one compiled program."""
        from esmdiff_tpu.core.tokenizer import StructureTokenizer

        results: list[list] = [[None] * t.shape[0] for t in tokens_list]
        by_bucket: dict[int, list] = {}
        for i, (seq, toks) in enumerate(zip(sequences, tokens_list)):
            for j in range(toks.shape[0]):
                row = StructureTokenizer.add_bos_eos(toks[j].astype(np.int32))
                by_bucket.setdefault(bucket_length(len(row)), []).append(
                    (i, j, row, seq))
        for Lpad, rows in by_bucket.items():
            for s in range(0, len(rows), decode_batch):
                chunk = rows[s:s + decode_batch]
                # pow2 batch bucket: a lone serve-path row decodes at B=1
                # instead of paying a fixed 32-row forward (advisor); full
                # sweep chunks still land on the one B=decode_batch program
                B = min(decode_batch, _pow2_at_least(len(chunk)))
                prots = _decode_padded_chunk(
                    self.runtime, [r[2] for r in chunk],
                    [r[3] for r in chunk], Lpad, B)
                for (i, j, _, _), p in zip(chunk, prots):
                    results[i][j] = p
        return results


def _pow2_at_least(n: int) -> int:
    """Smallest power of two >= n (batch-dimension bucketing for decodes)."""
    return 1 << max(0, n - 1).bit_length()


def _decode_padded_chunk(runtime: ESM3Runtime, rows: list, seqs: list,
                         Lpad: int, decode_batch: int) -> list[ESMProtein]:
    """Decode ≤``decode_batch`` token rows at the fixed (decode_batch, Lpad)
    program shape shared by every decode in a sweep: each row pads to Lpad
    with STRUCTURE_PAD_TOKEN (masked out of decoder attention via
    ``lengths``), surplus rows repeat the last real row, and the output is
    trimmed back to the real row count.  Single home for the pad/fill/trim
    semantics used by both the single-sequence and the coalesced decode."""
    n = len(rows)
    toks_pad = np.full((decode_batch, Lpad), C.STRUCTURE_PAD_TOKEN,
                       dtype=np.int32)
    lens = np.zeros((decode_batch,), np.int32)
    seqs_pad = list(seqs) + [seqs[-1]] * (decode_batch - n)
    for r, row in enumerate(rows):
        toks_pad[r, :len(row)] = row
        lens[r] = len(row)
    for r in range(n, decode_batch):
        toks_pad[r] = toks_pad[n - 1]
        lens[r] = lens[n - 1]
    return runtime.decode_batch(toks_pad, seqs_pad, lengths=lens)[:n]


def decode_tokens_to_proteins(runtime: ESM3Runtime, sequence: str,
                              tokens: np.ndarray,
                              decode_batch: int = 32) -> list[ESMProtein]:
    """Batched VQ-VAE decode of (N, L) interior tokens (one device call per
    chunk — the reference decodes per sample, sample_esmdiff.py:225-230).

    Both decode dims are bucketed so one compiled decode program serves a
    whole corpus sweep: rows are padded to the 32-multiple length bucket
    (pad masked out of attention via ``lengths``) and the final partial
    chunk is padded up to ``decode_batch`` with repeated rows (trimmed)."""
    from esmdiff_tpu.core.tokenizer import StructureTokenizer

    N = tokens.shape[0]
    rows = [StructureTokenizer.add_bos_eos(tokens[i].astype(np.int32))
            for i in range(N)]
    Lpad = bucket_length(len(rows[0]))
    prots: list[ESMProtein] = []
    for s in range(0, N, decode_batch):
        chunk = rows[s:s + decode_batch]
        prots.extend(_decode_padded_chunk(
            runtime, chunk, [sequence] * len(chunk), Lpad, decode_batch))
    return prots
