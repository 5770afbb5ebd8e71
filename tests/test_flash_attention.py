"""Pallas attention kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.nn.attention import _xla_attention, sequence_id_mask
from esmdiff_tpu.ops.flash_attention import flash_attention


def _qkv(B=2, L=256, H=4, Dh=64, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, L, H, Dh)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


def test_matches_xla_full_length():
    q, k, v = _qkv()
    ref = _xla_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_matches_xla_with_lengths():
    B, L = 2, 256
    q, k, v = _qkv(B=B, L=L)
    lengths = jnp.asarray([100, 256], jnp.int32)
    seq_id = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.int32)
    mask = sequence_id_mask(seq_id)
    ref = _xla_attention(q, k, v, mask=mask)
    out = flash_attention(q, k, v, lengths=lengths, interpret=True)
    # compare only valid positions (pad rows are garbage in both paths)
    for b in range(B):
        Lb = int(lengths[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :Lb], np.asarray(ref)[b, :Lb], atol=2e-5)


def test_non_multiple_block():
    q, k, v = _qkv(L=300)
    ref = _xla_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_rejects_masks():
    """The flash kernel only supports prefix ``lengths``; handing it any
    mask (which could be non-prefix, e.g. packed multi-chain blocks) must be
    a loud error, not silent mis-attention."""
    B, L = 2, 256
    q, k, v = _qkv(B=B, L=L)
    lengths = jnp.asarray([64, 256], jnp.int32)
    seq_id = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.int32)
    mask = sequence_id_mask(seq_id)
    with pytest.raises(TypeError):
        flash_attention(q, k, v, mask=mask, interpret=True)
    from esmdiff_tpu.nn.attention import dot_product_attention

    with pytest.raises(ValueError, match="flash path accepts only"):
        dot_product_attention(q, k, v, mask=mask, backend="flash")
    with pytest.raises(ValueError, match="not both"):
        dot_product_attention(q, k, v, mask=mask, lengths=lengths)


def test_dispatch_lengths_paths_agree():
    """dot_product_attention: lengths via XLA == lengths via flash."""
    from esmdiff_tpu.nn.attention import dot_product_attention

    B, L = 2, 256
    q, k, v = _qkv(B=B, L=L)
    lengths = jnp.asarray([100, 256], jnp.int32)
    ref = dot_product_attention(q, k, v, lengths=lengths, backend="xla")
    out = dot_product_attention(q, k, v, lengths=lengths, backend="flash")
    for b in range(B):
        Lb = int(lengths[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :Lb], np.asarray(ref)[b, :Lb], atol=2e-5)


def test_bf16():
    q, k, v = _qkv(dtype=jnp.bfloat16)
    ref = _xla_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2)


def test_group_parity_and_ragged_rows():
    """G>1 grouping (the L=256-512 amortization) is bitwise-equivalent to
    G=1 per-slice programs, including when B*H is not a multiple of G
    (pad rows are all-masked and discarded)."""
    # B*H = 3*5 = 15, not a multiple of 4
    q, k, v = _qkv(B=3, L=128, H=5, seed=3)
    lengths = jnp.asarray([128, 77, 130], jnp.int32)  # one > L clamps to L
    base = flash_attention(q, k, v, lengths=lengths, group=1, interpret=True)
    grouped = flash_attention(q, k, v, lengths=lengths, group=4,
                              interpret=True)
    for b in range(3):
        Lb = min(int(lengths[b]), 128)
        np.testing.assert_array_equal(
            np.asarray(base)[b, :Lb], np.asarray(grouped)[b, :Lb])


def test_auto_group_sizing():
    from esmdiff_tpu.ops.flash_attention import _pick_group

    # measured on-chip winners at the bench-matrix shapes (H=24)
    assert _pick_group(256, 256, 64 * 24) == 24
    assert _pick_group(512, 512, 16 * 24) == 8
    assert _pick_group(512, 1024, 4 * 24) == 4
    assert _pick_group(1024, 4096, 24) == 1
    # bh with no small divisor falls back to a padded power of two
    assert _pick_group(256, 256, 7) == 16
