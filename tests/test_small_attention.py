"""Fused short-L rotary+attention kernel (ops/small_attention.py): parity
with the XLA formulation.  The kernel is OPT-IN (attn_backend='small') —
measured slower than XLA in-scan on v5e (PERF.md round 3) — but it must
stay numerically exact for when it's re-evaluated on future hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.nn.rotary import rotary_tables
from esmdiff_tpu.ops.small_attention import _xla_reference, small_attention


@pytest.mark.parametrize("L,lengths", [(64, (64, 50, 17)),
                                       (128, (128, 100, 3))])
def test_forward_parity(L, lengths):
    rng = np.random.RandomState(0)
    B, H, Dh = 3, 4, 64
    q, k, v = (jnp.asarray(rng.randn(B, L, H, Dh), jnp.float32)
               for _ in range(3))
    cos, sin = rotary_tables(L, Dh)
    lens = jnp.asarray(lengths, jnp.int32)
    out = small_attention(q, k, v, cos, sin, lens)
    ref = _xla_reference(q, k, v, cos, sin, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradient_parity():
    rng = np.random.RandomState(1)
    B, L, H, Dh = 2, 64, 2, 64
    q, k, v = (jnp.asarray(rng.randn(B, L, H, Dh), jnp.float32)
               for _ in range(3))
    cos, sin = rotary_tables(L, Dh)
    lens = jnp.asarray([64, 30], jnp.int32)

    def loss_a(q, k, v):
        return jnp.sum(small_attention(q, k, v, cos, sin, lens) ** 2)

    def loss_b(q, k, v):
        return jnp.sum(_xla_reference(q, k, v, cos, sin, lens) ** 2)

    ga = jax.grad(loss_a, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss_b, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_opt_in_dispatch_only():
    """'auto' must NOT select the kernel (it loses to XLA); 'small' must."""
    from esmdiff_tpu.nn.layers import MultiHeadAttention

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 32, 64), jnp.float32)
    cos, sin = rotary_tables(32, 16)
    for backend in ("auto", "small"):
        mha = MultiHeadAttention(d_model=64, n_heads=4, dtype=jnp.float32,
                                 attn_backend=backend)
        params = mha.init(jax.random.PRNGKey(0), x, cos, sin)
        out = mha.apply(params, x, cos, sin)
        assert np.isfinite(np.asarray(out)).all()
    # both paths agree numerically
    mha_a = MultiHeadAttention(d_model=64, n_heads=4, dtype=jnp.float32,
                               attn_backend="auto")
    p = mha_a.init(jax.random.PRNGKey(0), x, cos, sin)
    out_a = mha_a.apply(p, x, cos, sin)
    mha_s = MultiHeadAttention(d_model=64, n_heads=4, dtype=jnp.float32,
                               attn_backend="small")
    out_s = mha_s.apply(p, x, cos, sin)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_s),
                               atol=2e-5)
