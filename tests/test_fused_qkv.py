"""Fused LN+QKV+QK-LN Pallas kernel vs the XLA composition (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.ops.fused_qkv import _reference_ln_qkv, fused_ln_qkv


def _inputs(B=2, L=48, D=128, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (B, L, D), dtype)
    ln = 1.0 + 0.1 * jax.random.normal(ks[1], (D,), jnp.float32)
    w = jax.random.normal(ks[2], (D, 3 * D), dtype) * 0.05
    qs = 1.0 + 0.1 * jax.random.normal(ks[3], (D,), jnp.float32)
    kss = 1.0 + 0.1 * jax.random.normal(ks[4], (D,), jnp.float32)
    return x, ln, w, qs, kss


def test_matches_reference_fp32():
    x, ln, w, qs, ks = _inputs()
    ref = _reference_ln_qkv(x, ln, w, qs, ks)
    out = fused_ln_qkv(x, ln, w, qs, ks, block_m=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_matches_reference_bf16_and_padding():
    # T=2*50=100 not a multiple of block_m=32 -> exercises the pad path
    x, ln, w, qs, ks = _inputs(B=2, L=50, dtype=jnp.bfloat16)
    ref = _reference_ln_qkv(x, ln, w, qs, ks)
    out = fused_ln_qkv(x, ln, w, qs, ks, block_m=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2)


def test_grad_flows():
    x, ln, w, qs, ks = _inputs(B=1, L=16, D=64)

    def loss(w):
        return jnp.sum(fused_ln_qkv(x, ln, w, qs, ks, block_m=16,
                                    interpret=True) ** 2)

    def loss_ref(w):
        return jnp.sum(_reference_ln_qkv(x, ln, w, qs, ks) ** 2)

    g = jax.grad(loss)(w)
    g_ref = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3,
                               rtol=1e-4)


def test_module_fused_backend_matches_xla():
    """MultiHeadAttention(qkv_backend='fused') — identical param tree and
    identical outputs to the XLA path."""
    from esmdiff_tpu.nn.layers import MultiHeadAttention
    from esmdiff_tpu.nn.rotary import rotary_tables

    B, L, D, H = 2, 24, 64, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, D), jnp.float32)
    cos, sin = rotary_tables(L, D // H)
    mha_x = MultiHeadAttention(d_model=D, n_heads=H, dtype=jnp.float32,
                               qkv_backend="xla")
    mha_f = MultiHeadAttention(d_model=D, n_heads=H, dtype=jnp.float32,
                               qkv_backend="fused")
    px = mha_x.init(jax.random.PRNGKey(1), x, cos, sin)["params"]
    pf = mha_f.init(jax.random.PRNGKey(1), x, cos, sin)["params"]
    assert jax.tree.structure(px) == jax.tree.structure(pf)
    for a, b in zip(jax.tree.leaves(px), jax.tree.leaves(pf)):
        assert a.shape == b.shape
    out_x = mha_x.apply({"params": px}, x, cos, sin)
    out_f = mha_f.apply({"params": px}, x, cos, sin)  # same params!
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=2e-5)
