"""Fused SwiGLU FFN kernel vs the unfused reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.ops.fused_ffn import fused_swiglu_ffn


def _ref(x, scale, w_up, w_down):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale
    up = xn.astype(x.dtype) @ w_up
    a, b = jnp.split(up.astype(jnp.float32), 2, axis=-1)
    hid = (jax.nn.silu(a) * b).astype(x.dtype)
    return (hid @ w_down).astype(x.dtype)


@pytest.mark.parametrize("M,D,H,bm,bh", [
    (256, 128, 256, 128, 128),
    (300, 128, 256, 128, 128),   # non-multiple M (padding path)
    (512, 256, 512, 256, 256),
])
def test_matches_reference(M, D, H, bm, bh):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (M, D), jnp.float32)
    scale = jax.random.normal(ks[1], (D,)) * 0.1 + 1.0
    w_up = jax.random.normal(ks[2], (D, 2 * H), jnp.float32) * 0.05
    w_down = jax.random.normal(ks[3], (H, D), jnp.float32) * 0.05
    ref = _ref(x, scale, w_up, w_down)
    out = fused_swiglu_ffn(x, scale, w_up, w_down, block_m=bm, block_h=bh,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_bf16():
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    M, D, H = 256, 128, 256
    x = jax.random.normal(ks[0], (M, D), jnp.bfloat16)
    scale = jnp.ones((D,), jnp.float32)
    w_up = (jax.random.normal(ks[2], (D, 2 * H)) * 0.05).astype(jnp.bfloat16)
    w_down = (jax.random.normal(ks[3], (H, D)) * 0.05).astype(jnp.bfloat16)
    ref = _ref(x, scale, w_up, w_down)
    out = fused_swiglu_ffn(x, scale, w_up, w_down, block_m=128, block_h=128,
                           interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2)
