"""Confidence-ranked iterative unmasking (ESM3 "Gibbs" inpainting sampler).

TPU-native reproduction of the observable contract of
``esm.utils.generation.iterative_sampling_raw`` as used by the reference's
gibbs mode (slm/sample_esmdiff.py:66-130: track="structure", num_steps,
temperature, top_p):

  each step runs one full trunk forward, samples structure tokens at masked
  positions with temperature/top-p, and commits the most confident ones so the
  total unmasked count follows a cosine schedule over ``num_steps``.

The whole loop is a single jitted ``lax.scan``; batch elements may have
different masked counts (inpainting), handled with per-element dynamic
unmasking quotas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from esmdiff_tpu.core import constants as C


def top_p_filter(logits, top_p: float, exact: bool = False):
    """Nucleus filtering: suppress tokens outside the smallest set with
    cumulative probability >= top_p.

    Default is a sort-free bisection on the probability threshold (24 fixed
    halvings, each an O(V) masked sum): a vocab-wide jnp.sort inside a
    sampling scan is brutal for XLA/TPU compile time.  ``exact=True`` keeps
    the reference sort-based semantics for verification.
    """
    if exact:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jnp.exp(jax.nn.log_softmax(sorted_logits, axis=-1))
        cum = jnp.cumsum(probs, axis=-1)
        keep_sorted = (cum - probs) < top_p
        thresh = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1,
            keepdims=True)
        return jnp.where(logits >= thresh, logits, -1e9)

    probs = jnp.exp(jax.nn.log_softmax(logits, axis=-1))
    # find tau with mass(p >= tau) ~ top_p; keep p >= tau (mass >= top_p)
    lo = jnp.zeros(logits.shape[:-1] + (1,), logits.dtype)
    hi = jnp.max(probs, axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) * 0.5
        mass = jnp.sum(jnp.where(probs >= mid, probs, 0.0), axis=-1,
                       keepdims=True)
        too_much = mass > top_p
        return jnp.where(too_much, mid, lo), jnp.where(too_much, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 24, body, (lo, hi))
    return jnp.where(probs >= lo, logits, -1e9)


def select_top_by_confidence(conf, eligible, n_new):
    """Boolean mask of (up to) the n_new most confident eligible positions.

    Sort-free: bisects a per-row confidence threshold (sorts/argsorts inside
    a sampling scan explode XLA/TPU compile time — see PERF.md).  Returns at
    least one position per row when n_new > 0 (the max-confidence one).

    conf: (B, L) float; eligible: (B, L) bool; n_new: (B,) int.
    """
    neg = jnp.asarray(-1e30, conf.dtype)
    c = jnp.where(eligible, conf, neg)
    lo = jnp.min(jnp.where(eligible, conf, jnp.inf), axis=-1, keepdims=True)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0) - 1.0
    hi = jnp.max(c, axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) * 0.5
        cnt = jnp.sum(c >= mid, axis=-1, keepdims=True)
        too_many = cnt > n_new[:, None]
        return jnp.where(too_many, mid, lo), jnp.where(too_many, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 30, body, (lo, hi))
    commit = eligible & (c >= hi)
    # guarantee progress: always include the per-row max when n_new > 0
    is_max = c >= jnp.max(c, axis=-1, keepdims=True)
    commit = commit | (eligible & is_max)
    return commit & (n_new[:, None] > 0)


def cosine_unmask_schedule(num_steps: int):
    """Fraction of initially-masked tokens that must be unmasked after each
    step k (monotone to 1.0 at the final step)."""
    k = jnp.arange(1, num_steps + 1, dtype=jnp.float32)
    return 1.0 - jnp.cos(k / num_steps * jnp.pi / 2.0) ** 2


def iterative_unmask_sample(
    forward_logits_fn,
    key,
    initial_tokens,
    decode_mask,
    num_steps: int = 16,
    temperature: float = 1.4,
    top_p: float = 0.9,
    row_keys=None,
):
    """Run the iterative unmasking loop.

    forward_logits_fn: (tokens (B, L)) -> (B, L, V) raw structure logits
        (specials should already be shielded by the caller if V == 4101).
    initial_tokens: (B, L) int32; positions to generate hold STRUCTURE_MASK.
    decode_mask: (B, L) bool — positions eligible for generation (True where
        initially masked and not BOS/EOS/PAD).
    row_keys: optional (B, 2) uint32 per-row PRNG keys — row b's draws
        depend only on ``row_keys[b]`` + the step index, not on batch size
        or placement (coalesced-serving determinism, cli/serve.py).  When
        None, derived from ``key`` via ``jax.random.split(key, B)``.
    Returns (B, L) int32 tokens with all decode positions committed.
    """
    B, L = initial_tokens.shape
    if row_keys is None:
        row_keys = jax.random.split(key, B)
    decode_mask = decode_mask & (initial_tokens == C.STRUCTURE_MASK_TOKEN)
    n_init = jnp.sum(decode_mask, axis=-1)  # (B,)
    quotas = jnp.ceil(
        cosine_unmask_schedule(num_steps)[None, :] * n_init[:, None]
    ).astype(jnp.int32)  # (B, num_steps)

    def step(x, inputs):
        quota, step_i = inputs  # quota: (B,) unmasked-count target after step
        k_samp = jax.vmap(
            lambda rk: jax.random.fold_in(rk, step_i))(row_keys)
        logits = forward_logits_fn(x).astype(jnp.float32)
        scaled = logits / jnp.maximum(temperature, 1e-4)
        scaled = top_p_filter(scaled, top_p)
        u = jax.vmap(
            lambda rk, sr: jax.random.uniform(rk, sr.shape))(k_samp, scaled)
        gumbel = -jnp.log(-jnp.log(u + 1e-20) + 1e-20)
        sampled = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        conf = jnp.take_along_axis(logp, sampled[..., None], axis=-1)[..., 0]

        still_masked = (x == C.STRUCTURE_MASK_TOKEN) & decode_mask
        already = jnp.sum(decode_mask & (x != C.STRUCTURE_MASK_TOKEN), axis=-1)
        n_new = jnp.maximum(quota - already, 0)  # (B,)
        commit = select_top_by_confidence(conf, still_masked, n_new)
        x = jnp.where(commit, sampled, x)
        return x, None

    x, _ = jax.lax.scan(
        step, initial_tokens.astype(jnp.int32),
        (quotas.T, jnp.arange(num_steps)),
    )
    return x


def entropy_bounded_unmask_sample(
    forward_logits_fn,
    key,
    initial_tokens,
    decode_mask,
    entropy_budget: float = 1.0,
    temperature: float = 1.0,
    top_p: float = 1.0,
    max_steps: int = 64,
    row_keys=None,
):
    """Adaptive unmasking: per step, commit the largest low-entropy set whose
    cumulative predictive entropy stays under ``entropy_budget`` (nats).

    Beyond-parity sampler following the entropy-bounded unmasking idea
    (PAPERS.md: arXiv 2505.24857): easy regions decode in few steps, hard
    regions get more; the number of trunk forwards adapts per input.  Runs as
    a ``lax.while_loop`` so finished batches stop paying for forwards.

    row_keys: optional (B, 2) uint32 per-row keys (see
    :func:`iterative_unmask_sample`); derived from ``key`` when None.

    Returns (tokens (B, L) int32, n_steps_used (int32)).
    """
    B, L = initial_tokens.shape
    if row_keys is None:
        row_keys = jax.random.split(key, B)
    decode_mask = decode_mask & (initial_tokens == C.STRUCTURE_MASK_TOKEN)

    def cond(carry):
        x, steps = carry
        masked = jnp.any((x == C.STRUCTURE_MASK_TOKEN) & decode_mask)
        return masked & (steps < max_steps)

    def body(carry):
        x, steps = carry
        k_samp = jax.vmap(
            lambda rk: jax.random.fold_in(rk, steps))(row_keys)
        logits = forward_logits_fn(x).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        entropy = -jnp.sum(jnp.exp(logp) * logp, axis=-1)  # (B, L)

        scaled = logits / jnp.maximum(temperature, 1e-4)
        if top_p < 1.0:
            scaled = top_p_filter(scaled, top_p)
        u = jax.vmap(
            lambda rk, sr: jax.random.uniform(rk, sr.shape))(k_samp, scaled)
        gumbel = -jnp.log(-jnp.log(u + 1e-20) + 1e-20)
        sampled = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)

        still = (x == C.STRUCTURE_MASK_TOKEN) & decode_mask
        # largest tau with sum(entropy[entropy <= tau]) <= budget, found by
        # bisection (sort-free: see select_top_by_confidence / PERF.md)
        masked_ent = jnp.where(still, entropy, jnp.inf)
        lo = jnp.zeros((B, 1), jnp.float32)
        hi = jnp.max(jnp.where(still, entropy, 0.0), axis=-1,
                     keepdims=True) + 1e-6

        def bisect(_, carry):
            lo, hi = carry
            mid = (lo + hi) * 0.5
            mass = jnp.sum(
                jnp.where(still & (entropy <= mid), entropy, 0.0),
                axis=-1, keepdims=True)
            over = mass > entropy_budget
            return jnp.where(over, lo, mid), jnp.where(over, mid, hi)

        lo, hi = jax.lax.fori_loop(0, 30, bisect, (lo, hi))
        commit = still & (entropy <= lo)
        # always commit at least the lowest-entropy position — exactly one
        # (argmin one-hot): an `<= min` mask commits every tied position,
        # making the per-step commit count nondeterministic under ties
        is_min = jax.nn.one_hot(jnp.argmin(masked_ent, axis=-1), L,
                                dtype=jnp.bool_)
        commit = commit | (still & is_min)
        x = jnp.where(commit, sampled, x)
        return x, steps + 1

    x, steps = jax.lax.while_loop(
        cond, body, (initial_tokens.astype(jnp.int32),
                     jnp.zeros((), jnp.int32)))
    return x, steps
