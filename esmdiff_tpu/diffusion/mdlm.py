"""Masked Diffusion Language Modeling (ESMDiff) — objective and sampler.

TPU-native re-design of the reference ``MaskedDiffusionLanguageModeling``
(slm/models/model.py:316-607).  Differences from the torch original are
structural, not behavioral:

  - everything is a pure function over an explicit param pytree;
  - the ancestral sampler (reference ddpm_sample/_ddpm_update,
    model.py:543-607 — a Python loop of 25 full-trunk forwards) compiles to a
    SINGLE jitted ``lax.scan``, so a whole denoising trajectory runs on-device
    with no host round-trips;
  - Gumbel categorical sampling uses jax.random (distributional parity, not
    bitwise RNG parity — see SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from esmdiff_tpu.core import constants as C
from .noise import LogLinearNoise, Noise

NEG_INFINITY = -1e6


@dataclasses.dataclass(frozen=True)
class MDLMConfig:
    time_conditioning: bool = True
    change_of_variables: bool = False
    importance_sampling: bool = False
    antithetic_sampling: bool = True
    noise_removal: bool = True
    structure_only: bool = False
    sequence_prediction: bool = False
    condition_dropout: float = 0.0
    condition_mask_rate: float = 0.0
    coupled_condition_mask: bool = False
    sampling_eps: float = 1e-3
    T: int = 0  # 0 = continuous time
    mask_index: int = C.STRUCTURE_MASK_TOKEN
    condition_mask_index: int = C.SEQUENCE_MASK_TOKEN
    vocab_size: int = C.STRUCTURE_VOCAB_SIZE


# A trunk closure: (params, structure_tokens, sequence_tokens, aux_embeddings)
# -> (structure_logits, sequence_logits)
TrunkFn = Callable[..., tuple[jnp.ndarray, Optional[jnp.ndarray]]]


def sample_t(key, n: int, cfg: MDLMConfig, noise: Noise):
    """Antithetic low-discrepancy time sampling (reference model.py:517-525)."""
    eps_t = jax.random.uniform(key, (n,))
    if cfg.antithetic_sampling:
        offset = jnp.arange(n, dtype=jnp.float32) / n
        eps_t = (eps_t / n + offset) % 1.0
    t = (1 - cfg.sampling_eps) * eps_t + cfg.sampling_eps
    if cfg.importance_sampling:
        t = noise.importance_sampling_transformation(t)
    return t


def packed_segment_times(key, B: int, S: int, cfg: MDLMConfig, noise: Noise):
    """(B, S) per-segment diffusion times for packed training.

    Antithetic strata over all B*S slots, then PERMUTED across slots:
    row-major assignment would pin stratum r*S to every row's first
    segment, so rows holding fewer than S segments would only ever train
    at S-spaced noise levels (observed: a 1-segment row at slot 0 drew
    t~0.01 every step).  The permutation keeps batch-level stratification
    while decorrelating slot index from stratum.
    """
    k_t, k_perm = jax.random.split(key)
    t = sample_t(k_t, B * S, cfg, noise)
    return jax.random.permutation(k_perm, t).reshape(B, S)


def q_xt(key, x0, move_chance, cfg: MDLMConfig, condition_seq=None,
         non_moving_mask=None):
    """Forward diffusion: mask each token with prob move_chance
    (reference model.py:494-512)."""
    move = jax.random.uniform(key, x0.shape) < move_chance
    if non_moving_mask is not None:
        move = move & (~non_moving_mask.astype(bool))
    xt = jnp.where(move, cfg.mask_index, x0)
    if cfg.coupled_condition_mask and condition_seq is not None:
        condition_seq = jnp.where(move, cfg.condition_mask_index, condition_seq)
    return xt, condition_seq


def logits_parameterization(logits, xt, cfg: MDLMConfig):
    """SUBS parameterization (reference model.py:527-533): zero probability on
    the mask token; unmasked positions carry themselves over with prob 1."""
    mask_onehot = jax.nn.one_hot(
        jnp.asarray(cfg.mask_index), logits.shape[-1], dtype=logits.dtype
    )
    logits = logits + mask_onehot * NEG_INFINITY
    logits = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    unmasked = xt != cfg.mask_index
    carry = jnp.where(
        jax.nn.one_hot(xt, logits.shape[-1], dtype=jnp.bool_),
        0.0, NEG_INFINITY,
    ).astype(logits.dtype)
    return jnp.where(unmasked[..., None], carry, logits)


def shield_special_tokens(logits):
    """Suppress the 5 structure special tokens during sampling
    (reference model.py:484-486)."""
    shield = jnp.concatenate([
        jnp.zeros((C.VQVAE_CODEBOOK_SIZE,), logits.dtype),
        jnp.full((C.STRUCTURE_NUM_SPECIAL_TOKENS,), NEG_INFINITY, logits.dtype),
    ])
    return logits + shield


def position_keys(row_keys, L: int):
    """(B, 2) per-row keys -> (B, L, 2) per-position keys.

    ``pos_keys[b, p] = fold_in(row_keys[b], p)`` — the canonical key layout
    every ddpm path shares, so a sample's draws are invariant to how its
    positions are laid out on device (solo row, same-bucket coalesced row,
    or a segment inside a heterogeneous packed row)."""
    pos = jnp.arange(L, dtype=jnp.int32)
    return jax.vmap(
        lambda rk: jax.vmap(lambda p: jax.random.fold_in(rk, p))(pos)
    )(row_keys)


def sample_categorical(key, probs):
    """Gumbel-max categorical over unnormalized probs (reference model.py:24-28)."""
    gumbel_norm = 1e-10 - jnp.log(
        jax.random.uniform(key, probs.shape) + 1e-10
    )
    return jnp.argmax(probs / gumbel_norm, axis=-1)


class MDLM:
    """Bundles trunk apply-fn, sigma embedder, noise schedule and config.

    ``params`` pytrees look like {"net": ..., "sigma_embedder": ...}.
    """

    def __init__(self, net, sigma_embedder, noise: Optional[Noise] = None,
                 cfg: MDLMConfig = MDLMConfig()):
        self.net = net              # flax ESM3 module
        self.sigma_embedder = sigma_embedder  # flax TimestepEmbedder
        self.noise = noise if noise is not None else LogLinearNoise()
        self.cfg = cfg
        # optional trunk-forward override (trunk_params, **net_kwargs) ->
        # ESMOutput; set by trainer.strategy=ppS|dpNxppS to route the scanned
        # stack through the GPipe pipeline (parallel/pp.mdlm_pp_trunk_apply)
        self.trunk_apply = None

    # -- init ---------------------------------------------------------------
    def init(self, key, batch_size: int = 1, length: int = 8):
        k1, k2 = jax.random.split(key)
        seq = jnp.full((batch_size, length), C.SEQUENCE_MASK_TOKEN, jnp.int32)
        # dummy coords so geometric-attention params are created even though
        # the MDLM forward path skips the geometric block (exact no-op there);
        # init is jitted: eager init dispatches thousands of tiny ops, which
        # is pathological on high-latency (tunneled) devices
        coords = jnp.zeros((batch_size, length, 3, 3), jnp.float32)
        net_params = jax.jit(
            lambda k: self.net.init(k, sequence_tokens=seq,
                                    structure_coords=coords)
        )(k1)["params"]
        se_params = jax.jit(
            lambda k: self.sigma_embedder.init(
                k, jnp.zeros((batch_size,), jnp.float32))
        )(k2)["params"]
        return {"net": net_params, "sigma_embedder": se_params}

    # -- forward ------------------------------------------------------------
    def _process_sigma(self, sigma):
        if sigma.ndim > 1:
            sigma = sigma.squeeze(-1)
        if not self.cfg.time_conditioning:
            sigma = jnp.zeros_like(sigma)
        return sigma

    def forward_logits(self, params, xt, condition_seq, sigma,
                       shield_specials: bool = False, sequence_id=None,
                       lengths=None, parameterize: bool = True,
                       pack: int = 1, positions=None):
        """Full conditioned forward -> parameterized log-probs
        (reference _model_wrapper, model.py:464-492).

        ``parameterize=False`` skips the SUBS log-softmax/carry-over and
        returns raw fp32 logits with only the mask-token and (optionally)
        special-token shields applied — enough for Gumbel-max sampling,
        which is invariant to the log-softmax normalization.  The sampler
        uses this to avoid materializing two extra (B, L, V) arrays per
        step; the carry-over rule is applied on the token level instead.

        ``pack`` > 1 runs the trunk on a sequence-packed view — k rows per
        device row with a block-diagonal segment mask (ops/packing.py);
        same function, MXU-shaped attention at short L.  Requires
        ``sequence_id is None`` and B % pack == 0.
        """
        B, L = xt.shape
        if sigma is not None:
            sigma = self._process_sigma(sigma)
            cond = self.sigma_embedder.apply(
                {"params": params["sigma_embedder"]}, sigma)
            aux = jnp.tile(cond[:, None, :], (1, xt.shape[1], 1))
        else:
            aux = None
        if pack > 1:
            if sequence_id is not None:
                raise ValueError("pack > 1 is incompatible with an explicit "
                                 "sequence_id (already-packed input)")
            from esmdiff_tpu.ops.packing import (
                packed_positions, packed_segment_ids)

            sequence_id = packed_segment_ids(lengths, L, pack)
            positions = packed_positions(L, pack)
            lengths = None
            xt = xt.reshape(B // pack, pack * L)
            condition_seq = condition_seq.reshape(B // pack, pack * L)
            if aux is not None:
                aux = aux.reshape(B // pack, pack * L, -1)
        if self.trunk_apply is not None:
            out = self.trunk_apply(
                params["net"], structure_tokens=xt,
                sequence_tokens=condition_seq, sequence_id=sequence_id,
                lengths=lengths, positions=positions,
                auxiliary_embeddings=aux)
        else:
            out = self.net.apply(
                {"params": params["net"]},
                structure_tokens=xt,
                sequence_tokens=condition_seq,
                sequence_id=sequence_id,
                lengths=lengths,
                positions=positions,
                auxiliary_embeddings=aux,
            )
        raw = out.structure_logits
        if pack > 1:
            raw = raw.reshape(B, L, raw.shape[-1])
            xt = xt.reshape(B, L)
        if parameterize:
            logits = logits_parameterization(raw, xt, self.cfg)
        else:
            mask_onehot = jax.nn.one_hot(
                jnp.asarray(self.cfg.mask_index),
                raw.shape[-1], dtype=jnp.float32)
            logits = raw.astype(jnp.float32) + mask_onehot * NEG_INFINITY
        if shield_specials:
            logits = shield_special_tokens(logits)
        seq_logits = out.sequence_logits if self.cfg.sequence_prediction else None
        if pack > 1 and seq_logits is not None:
            seq_logits = seq_logits.reshape(B, L, seq_logits.shape[-1])
        return logits, seq_logits

    # -- training objective ---------------------------------------------------
    def loss(self, params, batch: dict, key, training: bool = True):
        """Continuous-time NELBO (reference model_step, model.py:386-462).

        batch: structure_tokens (B, L) int, sequence_tokens (B, L) int,
        mask (B, L), optional non_moving_mask.
        Returns (loss, dict of breakdown metrics).
        """
        cfg = self.cfg
        x0 = batch["structure_tokens"]
        labels = x0
        condition_seq = batch["sequence_tokens"]
        B, L = x0.shape
        k_drop, k_cmask, k_t, k_q = jax.random.split(key, 4)

        if cfg.condition_dropout > 0 and training:
            drop = jax.random.uniform(k_drop) < cfg.condition_dropout
            condition_seq = jnp.where(
                drop, jnp.full_like(condition_seq, C.SEQUENCE_MASK_TOKEN),
                condition_seq)
        if cfg.condition_mask_rate > 0 and training:
            m = (
                jax.random.uniform(k_cmask, condition_seq.shape)
                < cfg.condition_mask_rate
            ) & (condition_seq != C.SEQUENCE_PAD_TOKEN)
            condition_seq = jnp.where(m, C.SEQUENCE_MASK_TOKEN, condition_seq)
        if cfg.structure_only:
            condition_seq = jnp.full_like(condition_seq, C.SEQUENCE_MASK_TOKEN)

        loss_mask = batch["mask"] * (labels != C.STRUCTURE_PAD_TOKEN)

        t = sample_t(k_t, B, cfg, self.noise)
        if cfg.T > 0:
            t = (t * cfg.T).astype(jnp.int32).astype(jnp.float32) / cfg.T
            t = t + 1.0 / cfg.T

        if cfg.change_of_variables:
            net_conditioning = t[:, None]
            f_T = jnp.log1p(-jnp.exp(-self.noise.sigma_max))
            f_0 = jnp.log1p(-jnp.exp(-self.noise.sigma_min))
            move_chance = jnp.exp(f_0 + t * (f_T - f_0))[:, None]
            dsigma = sigma = None
        else:
            sigma, dsigma = self.noise(t)
            net_conditioning = sigma[:, None]
            move_chance = (1 - jnp.exp(-sigma))[:, None]

        xt, condition_seq = q_xt(
            k_q, x0, move_chance, cfg, condition_seq=condition_seq,
            non_moving_mask=batch.get("non_moving_mask"),
        )
        logits, seq_logits = self.forward_logits(
            params, xt, condition_seq, net_conditioning)

        log_p_theta = jnp.take_along_axis(
            logits, x0[:, :, None], axis=-1
        ).squeeze(-1)

        if cfg.change_of_variables or cfg.importance_sampling:
            per_tok = log_p_theta * jnp.log1p(-jnp.exp(-self.noise.sigma_min))
        else:
            per_tok = -log_p_theta * (dsigma / jnp.expm1(sigma))[:, None]

        denom = jnp.maximum(loss_mask.sum(), 1.0)
        loss = (per_tok * loss_mask).sum() / denom
        breakdown = {"nelbo": loss}

        if cfg.sequence_prediction:
            seq_lp = jax.nn.log_softmax(
                seq_logits.astype(jnp.float32), axis=-1)
            seq_nll = -jnp.take_along_axis(
                seq_lp, batch["sequence_tokens"][:, :, None], axis=-1
            ).squeeze(-1)
            seq_nll = jnp.where(
                batch["sequence_tokens"] == C.SEQUENCE_PAD_TOKEN, 0.0, seq_nll)
            seq_nll = (seq_nll * loss_mask).sum() / denom
            loss = loss + seq_nll
            breakdown["seq_nll"] = seq_nll
        return loss, breakdown

    # -- packed training objective --------------------------------------------
    def loss_packed(self, params, batch: dict, key, max_segments: int,
                    training: bool = True, t_override=None):
        """NELBO over sequence-packed rows (train/data.py::packed_batches).

        Same per-sequence objective as :meth:`loss` — diffusion time is
        sampled PER SEGMENT (each packed chain gets its own t, as each row
        does in the unpacked reference semantics, model.py:404), attention
        is segment-masked, and rotary positions restart per segment.  The
        pytree layout, RNG structure, and loss normalization (sum over
        valid tokens / count) match the unpacked path; parity vs per-row
        masked forwards is pinned by tests/test_pack_train.py.

        batch: structure_tokens / sequence_tokens / mask (B, P), plus
        segment_ids (B, P) int32 with -1 on padding and positions (B, P).
        max_segments: static S — per-row segment-slot cap used for the
        (B, S) time draw; must be >= the collator's cap.
        """
        cfg = self.cfg
        x0 = batch["structure_tokens"]
        labels = x0
        condition_seq = batch["sequence_tokens"]
        seg = batch["segment_ids"]
        B, P = x0.shape
        S = int(max_segments)
        valid = seg >= 0
        segc = jnp.clip(seg, 0, S - 1)
        k_drop, k_cmask, k_t, k_q = jax.random.split(key, 4)

        if cfg.condition_dropout > 0 and training:
            drop = jax.random.uniform(k_drop) < cfg.condition_dropout
            condition_seq = jnp.where(
                drop, jnp.full_like(condition_seq, C.SEQUENCE_MASK_TOKEN),
                condition_seq)
        if cfg.condition_mask_rate > 0 and training:
            m = (
                jax.random.uniform(k_cmask, condition_seq.shape)
                < cfg.condition_mask_rate
            ) & (condition_seq != C.SEQUENCE_PAD_TOKEN)
            condition_seq = jnp.where(m, C.SEQUENCE_MASK_TOKEN, condition_seq)
        if cfg.structure_only:
            condition_seq = jnp.full_like(condition_seq, C.SEQUENCE_MASK_TOKEN)

        loss_mask = (batch["mask"] * (labels != C.STRUCTURE_PAD_TOKEN)
                     * valid.astype(jnp.float32))

        # per-segment time (B, S) — permuted antithetic strata (see
        # packed_segment_times for why the permutation is load-bearing)
        if t_override is None:
            t = packed_segment_times(k_t, B, S, cfg, self.noise)
        else:
            t = t_override
        if cfg.T > 0:
            t = (t * cfg.T).astype(jnp.int32).astype(jnp.float32) / cfg.T
            t = t + 1.0 / cfg.T

        if cfg.change_of_variables:
            cond_seg = t                                   # (B, S)
            f_T = jnp.log1p(-jnp.exp(-self.noise.sigma_max))
            f_0 = jnp.log1p(-jnp.exp(-self.noise.sigma_min))
            move_seg = jnp.exp(f_0 + t * (f_T - f_0))
            dsig_tok = sig_tok = None
        else:
            sigma_seg, dsigma_seg = self.noise(t)          # (B, S) each
            cond_seg = sigma_seg
            move_seg = 1 - jnp.exp(-sigma_seg)
            sig_tok = jnp.take_along_axis(sigma_seg, segc, axis=1)
            dsig_tok = jnp.take_along_axis(dsigma_seg, segc, axis=1)
        move_tok = jnp.take_along_axis(move_seg, segc, axis=1)  # (B, P)

        # keep padding slots un-noised (they're outside attention and loss,
        # but MASK embeddings there would be gratuitous input drift)
        nmm = ~valid
        if batch.get("non_moving_mask") is not None:
            nmm = nmm | batch["non_moving_mask"].astype(bool)
        xt, condition_seq = q_xt(k_q, x0, move_tok, cfg,
                                 condition_seq=condition_seq,
                                 non_moving_mask=nmm)

        # per-segment sigma embedding, gathered to tokens (the unpacked
        # path's per-row tile, generalized to ragged rows)
        if not cfg.time_conditioning:
            cond_seg = jnp.zeros_like(cond_seg)
        emb = self.sigma_embedder.apply(
            {"params": params["sigma_embedder"]}, cond_seg.reshape(B * S))
        emb = emb.reshape(B, S, -1)
        aux = jnp.take_along_axis(emb, segc[:, :, None], axis=1)  # (B, P, D)

        out = self.net.apply(
            {"params": params["net"]},
            structure_tokens=xt,
            sequence_tokens=condition_seq,
            sequence_id=seg,
            positions=batch["positions"],
            auxiliary_embeddings=aux,
        )
        logits = logits_parameterization(out.structure_logits, xt, cfg)
        log_p_theta = jnp.take_along_axis(
            logits, x0[:, :, None], axis=-1).squeeze(-1)

        if cfg.change_of_variables or cfg.importance_sampling:
            per_tok = log_p_theta * jnp.log1p(-jnp.exp(-self.noise.sigma_min))
        else:
            per_tok = -log_p_theta * (dsig_tok / jnp.expm1(sig_tok))

        denom = jnp.maximum(loss_mask.sum(), 1.0)
        loss = (per_tok * loss_mask).sum() / denom
        breakdown = {"nelbo": loss}

        if cfg.sequence_prediction:
            seq_logits = out.sequence_logits
            seq_lp = jax.nn.log_softmax(
                seq_logits.astype(jnp.float32), axis=-1)
            seq_nll = -jnp.take_along_axis(
                seq_lp, batch["sequence_tokens"][:, :, None], axis=-1
            ).squeeze(-1)
            seq_nll = jnp.where(
                batch["sequence_tokens"] == C.SEQUENCE_PAD_TOKEN, 0.0, seq_nll)
            seq_nll = (seq_nll * loss_mask).sum() / denom
            loss = loss + seq_nll
            breakdown["seq_nll"] = seq_nll
        return loss, breakdown

    # -- ancestral sampler ----------------------------------------------------
    def ddpm_sample(
        self,
        params,
        key,
        sequence_tokens,
        num_steps: int = 25,
        eps: float = 1e-5,
        input_prior=None,
        sample_max_t: float = 1.0,
        shield_specials: bool = True,
        sequence_id=None,
        lengths=None,
        pack: int = 1,
        row_keys=None,
        positions=None,
        pos_keys=None,
    ):
        """25-step ancestral denoising as one ``lax.scan``
        (reference ddpm_sample/_ddpm_update, model.py:543-607).

        sequence_tokens: (B, L) int conditioning (with BOS/EOS).
        input_prior: optional (B, L) partially-masked tokens for inpainting.
        pack: sequence-packing factor for the trunk forwards (ops/packing.py)
        — sampler state and RNG draws stay at (B, L), so results for a given
        seed are unchanged (up to trunk fp reduction order).
        row_keys: optional (B, 2) uint32 per-row PRNG keys.  When None, keys
        derive from ``key`` via ``jax.random.split(key, B)``.
        positions: optional explicit rotary positions (passed with
        ``sequence_id`` by the cross-length packed engine,
        api/generation.py — segments restart at 0).
        pos_keys: optional (B, L, 2) uint32 PER-POSITION PRNG keys; default
        ``fold_in(row_keys[b], p)``.  Every random draw for position (b, p)
        depends ONLY on its key and the step index — NOT on batch size, row
        placement, or co-batched traffic — so a request draws bit-identical
        randomness whether it runs solo, same-bucket coalesced, or packed
        into shared heterogeneous rows (cli/serve.py determinism; the
        cross-length engine scatters ``fold_in(row_key, pos_in_segment)``
        into its packed layout to reproduce exactly these keys).
        Returns (B, L) int32 structure tokens (with BOS/EOS slots).
        """
        cfg = self.cfg
        B, L = sequence_tokens.shape
        if pos_keys is None:
            if row_keys is None:
                row_keys = jax.random.split(key, B)
            pos_keys = position_keys(row_keys, L)
        if input_prior is None:
            x = jnp.full((B, L), cfg.mask_index, dtype=jnp.int32)
        else:
            x = input_prior.astype(jnp.int32)

        timesteps = jnp.linspace(sample_max_t, eps, num_steps + 1)
        dt = (1 - eps) / num_steps

        # The final noise-removal denoise runs INSIDE the scan (as an extra
        # step selecting argmax) so the 1.4B trunk appears once in the HLO —
        # the reference's separate final forward (model.py:575-579) would
        # double XLA compile time.
        n_iters = num_steps + (1 if cfg.noise_removal else 0)
        ts = timesteps[:n_iters]
        is_final = jnp.arange(n_iters) == num_steps

        fold2 = jax.vmap(jax.vmap(jax.random.fold_in))

        def step(x, inp):
            t, final, step_i = inp
            step_ix = jnp.broadcast_to(step_i, (B, L))
            ks = fold2(pos_keys, step_ix)                    # (B, L, 2)
            k_tok = fold2(ks, jnp.zeros((B, L), jnp.int32))
            k_stay = fold2(ks, jnp.ones((B, L), jnp.int32))
            tb = jnp.full((B,), t, dtype=jnp.float32)
            sigma_t = self.noise.total_noise(tb)
            sigma_s = self.noise.total_noise(tb - dt)
            mc_t = (1 - jnp.exp(-sigma_t))[:, None]  # (B, 1)
            mc_s = (1 - jnp.exp(-sigma_s))[:, None]
            z, _ = self.forward_logits(
                params, x, sequence_tokens, sigma_t[:, None],
                shield_specials=shield_specials, sequence_id=sequence_id,
                lengths=lengths, parameterize=False, pack=pack,
                positions=positions,
            )
            # Two-stage factorization of the reference posterior sample
            # (model.py:602-604): q_xs = p(x0)*(mc_t-mc_s) with mass mc_s on
            # MASK.  Since p(x0) sums to 1, a masked position stays masked
            # w.p. mc_s/mc_t and otherwise draws x0 ~ softmax(z) — identical
            # distribution, without materializing log_softmax/q_xs (two
            # (B, L, V) arrays per step).  Gumbel-max needs no normalization.
            # Verified against the direct q_xs formula in
            # tests/test_diffusion.py::test_ddpm_two_stage_update_equivalence.
            g = jax.vmap(jax.vmap(
                lambda rk, zr: jax.random.gumbel(rk, zr.shape, jnp.float32)
            ))(k_tok, z)
            x_new = jnp.argmax(z + g, axis=-1).astype(jnp.int32)
            stay_u = jax.vmap(jax.vmap(
                lambda rk: jax.random.uniform(rk, ())))(k_stay)
            stay = stay_u * mc_t < mc_s
            x_new = jnp.where(stay, cfg.mask_index, x_new)
            copy = x != cfg.mask_index
            x_upd = jnp.where(copy, x, x_new)
            # noise removal: argmax of p(x0) at still-masked positions;
            # unmasked positions carry over (the SUBS rule on token level)
            x_denoised = jnp.where(
                copy, x, jnp.argmax(z, axis=-1).astype(jnp.int32))
            x = jnp.where(final, x_denoised, x_upd)
            return x, None

        x, _ = jax.lax.scan(
            step, x, (ts, is_final, jnp.arange(n_iters)))
        return x
