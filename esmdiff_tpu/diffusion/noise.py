"""Masked-diffusion noise schedules: sigma(t) and d sigma(t)/dt.

JAX port of the schedule family in the reference (slm/utils/noise_utils.py:99-213):
LogLinear (the MDLM default, configs/experiment/mdlm.yaml:35-36), Cosine,
CosineSqr, Linear, Geometric — stateless pure functions, jit/vmap/scan-safe.
Also the BERT-style MLM corruption helper (noise_utils.py:11-63).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from esmdiff_tpu.core import constants as C


@dataclasses.dataclass(frozen=True)
class Noise:
    """Base schedule.  ``__call__(t) -> (total_noise sigma(t), rate dsigma(t))``."""

    def total_noise(self, t):
        raise NotImplementedError

    def rate_noise(self, t):
        raise NotImplementedError

    def __call__(self, t):
        t = jnp.asarray(t, dtype=jnp.float32)
        return self.total_noise(t), self.rate_noise(t)

    @property
    def sigma_min(self):
        return self.total_noise(jnp.float32(0.0))

    @property
    def sigma_max(self):
        return self.total_noise(jnp.float32(1.0))


@dataclasses.dataclass(frozen=True)
class LogLinearNoise(Noise):
    """sigma(t) = -log1p(-(1-eps) t); move chance 1-exp(-sigma) = (1-eps) t."""

    eps: float = 1e-3

    def total_noise(self, t):
        return -jnp.log1p(-(1 - self.eps) * t)

    def rate_noise(self, t):
        return (1 - self.eps) / (1 - (1 - self.eps) * t)

    def importance_sampling_transformation(self, t):
        f_T = jnp.log1p(-jnp.exp(-self.sigma_max))
        f_0 = jnp.log1p(-jnp.exp(-(self.eps + 0.0)))
        sigma_t = -jnp.log1p(-jnp.exp(t * f_T + (1 - t) * f_0))
        return -jnp.expm1(-sigma_t) / (1 - self.eps)


@dataclasses.dataclass(frozen=True)
class CosineNoise(Noise):
    eps: float = 1e-3

    def total_noise(self, t):
        cos = jnp.cos(t * jnp.pi / 2)
        return -jnp.log(self.eps + (1 - self.eps) * cos)

    def rate_noise(self, t):
        cos = (1 - self.eps) * jnp.cos(t * jnp.pi / 2)
        sin = (1 - self.eps) * jnp.sin(t * jnp.pi / 2)
        return (jnp.pi / 2) * sin / (cos + self.eps)


@dataclasses.dataclass(frozen=True)
class CosineSqrNoise(Noise):
    eps: float = 1e-3

    def total_noise(self, t):
        cos = jnp.cos(t * jnp.pi / 2) ** 2
        return -jnp.log(self.eps + (1 - self.eps) * cos)

    def rate_noise(self, t):
        cos = (1 - self.eps) * jnp.cos(t * jnp.pi / 2) ** 2
        sin = (1 - self.eps) * jnp.sin(t * jnp.pi)
        return (jnp.pi / 2) * sin / (cos + self.eps)


@dataclasses.dataclass(frozen=True)
class LinearNoise(Noise):
    sigma_min_v: float = 0.0
    sigma_max_v: float = 10.0

    def total_noise(self, t):
        return self.sigma_min_v + t * (self.sigma_max_v - self.sigma_min_v)

    def rate_noise(self, t):
        return jnp.full_like(t, self.sigma_max_v - self.sigma_min_v)

    def importance_sampling_transformation(self, t):
        f_T = jnp.log1p(-jnp.exp(-self.sigma_max_v))
        f_0 = jnp.log1p(-jnp.exp(-self.sigma_min_v))
        sigma_t = -jnp.log1p(-jnp.exp(t * f_T + (1 - t) * f_0))
        return (sigma_t - self.sigma_min_v) / (self.sigma_max_v - self.sigma_min_v)


@dataclasses.dataclass(frozen=True)
class GeometricNoise(Noise):
    sigma_min_v: float = 1e-3
    sigma_max_v: float = 1.0

    def total_noise(self, t):
        return self.sigma_min_v ** (1 - t) * self.sigma_max_v ** t

    def rate_noise(self, t):
        return self.total_noise(t) * (
            math.log(self.sigma_max_v) - math.log(self.sigma_min_v)
        )


NOISE_REGISTRY = {
    "loglinear": LogLinearNoise,
    "cosine": CosineNoise,
    "cosinesqr": CosineSqrNoise,
    "linear": LinearNoise,
    "geometric": GeometricNoise,
}


def get_noise(name: str, **kwargs) -> Noise:
    return NOISE_REGISTRY[name](**kwargs)


# ---------------------------------------------------------------------------
# BERT-style MLM corruption (reference get_inputs_for_mlm, noise_utils.py:38-63)
# ---------------------------------------------------------------------------

def sample_mask_rate(key, schedule: str = "beta"):
    """Scalar mask-rate sampler matching the reference schedules."""
    k1, k2 = jax.random.split(key)
    if schedule == "beta":
        return jax.random.beta(k1, 3.0, 9.0) * 0.80 + jax.random.uniform(k2) * 0.20
    if schedule == "linear":
        return jax.random.uniform(k1)
    if schedule == "cosine":
        return jnp.cos(jax.random.uniform(k1) * jnp.pi * 0.5)
    if schedule == "constant":
        return jnp.float32(0.15)
    raise ValueError(f"Unknown mask-rate schedule: {schedule}")


def get_inputs_for_mlm(key, inputs, mask_rate):
    """80/10/10 BERT corruption over structure tokens; specials shielded.

    Returns (corrupted_inputs, labels (-100 on uncounted), masked_indices).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    special = inputs >= C.VQVAE_CODEBOOK_SIZE
    prob = jnp.where(special, 0.0, mask_rate)
    masked = jax.random.uniform(k1, inputs.shape) < prob
    labels = jnp.where(masked, inputs, -100)
    replaced = (jax.random.uniform(k2, inputs.shape) < 0.8) & masked
    out = jnp.where(replaced, C.STRUCTURE_MASK_TOKEN, inputs)
    randomized = (
        (jax.random.uniform(k3, inputs.shape) < 0.5) & masked & ~replaced
    )
    rand_tokens = jax.random.randint(
        k4, inputs.shape, 0, C.VQVAE_CODEBOOK_SIZE, dtype=inputs.dtype
    )
    out = jnp.where(randomized, rand_tokens, out)
    return out, labels, masked
