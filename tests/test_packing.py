"""Sequence-packed trunk execution (ops/packing.py).

The packed forward must compute the SAME function as the unpacked
``lengths``-masked forward: identical attention key sets (block-diagonal
segment mask vs prefix mask) and per-segment rotary positions.  On CPU the
results are bitwise identical; the ddpm sampler with ``pack>1`` must emit
the same tokens as pack=1 for the same seed (RNG shapes are unchanged —
state stays (B, L)).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.diffusion.mdlm import MDLM, MDLMConfig
from esmdiff_tpu.diffusion.noise import LogLinearNoise
from esmdiff_tpu.models.esm3 import ESM3, esm3_tiny
from esmdiff_tpu.nn.layers import TimestepEmbedder
from esmdiff_tpu.ops.packing import (
    pack_factor,
    packed_positions,
    packed_segment_ids,
)


def test_pack_factor_ladder():
    assert pack_factor(64, 64, target=128) == 2
    assert pack_factor(64, 64, target=256) == 4
    assert pack_factor(64, 256, target=256) == 1
    assert pack_factor(1, 64, target=512) == 1   # B not divisible
    assert pack_factor(6, 64, target=512) == 2   # 6 % 4 != 0
    assert pack_factor(64, 32, target=512, max_pack=8) == 8


def test_packed_segment_ids_semantics():
    lengths = jnp.asarray([3, 4, 2, 4], jnp.int32)
    ids = np.asarray(packed_segment_ids(lengths, L=4, k=2))
    # two packed rows of 2 segments x 4 slots each
    assert ids.shape == (2, 8)
    np.testing.assert_array_equal(ids[0], [0, 0, 0, -1, 1, 1, 1, 1])
    np.testing.assert_array_equal(ids[1], [0, 0, -1, -1, 1, 1, 1, 1])
    pos = np.asarray(packed_positions(4, 2))
    np.testing.assert_array_equal(pos, [0, 1, 2, 3, 0, 1, 2, 3])


@pytest.fixture(scope="module")
def tiny_trunk():
    cfg = esm3_tiny(head_type="structure")
    net = ESM3(cfg)
    L = 16
    params = net.init(
        jax.random.PRNGKey(0),
        sequence_tokens=jnp.zeros((1, L), jnp.int32),
        structure_coords=jnp.zeros((1, L, 3, 3)),
    )["params"]
    return net, params, L


def test_packed_forward_bitwise_on_cpu(tiny_trunk):
    net, params, L = tiny_trunk
    B, k = 8, 4
    rng = np.random.RandomState(0)
    seq = jnp.asarray(rng.randint(4, 24, (B, L)), jnp.int32)
    toks = jnp.asarray(rng.randint(0, 4096, (B, L)), jnp.int32)
    ell = L - 3
    lengths = jnp.full((B,), ell, jnp.int32)

    ref = net.apply({"params": params}, structure_tokens=toks,
                    sequence_tokens=seq, lengths=lengths).structure_logits
    pk = net.apply(
        {"params": params},
        structure_tokens=toks.reshape(B // k, k * L),
        sequence_tokens=seq.reshape(B // k, k * L),
        sequence_id=packed_segment_ids(lengths, L, k),
        positions=packed_positions(L, k),
    ).structure_logits.reshape(B, L, -1)
    a = np.asarray(ref)[:, :ell]
    b = np.asarray(pk)[:, :ell]
    np.testing.assert_array_equal(a, b)


def test_packed_forward_ragged_lengths(tiny_trunk):
    """Per-row lengths differing WITHIN a packed row still mask exactly."""
    net, params, L = tiny_trunk
    B, k = 4, 2
    rng = np.random.RandomState(1)
    seq = jnp.asarray(rng.randint(4, 24, (B, L)), jnp.int32)
    toks = jnp.asarray(rng.randint(0, 4096, (B, L)), jnp.int32)
    lengths = jnp.asarray([L - 1, L - 5, L - 2, L - 7], jnp.int32)

    ref = net.apply({"params": params}, structure_tokens=toks,
                    sequence_tokens=seq, lengths=lengths).structure_logits
    pk = net.apply(
        {"params": params},
        structure_tokens=toks.reshape(B // k, k * L),
        sequence_tokens=seq.reshape(B // k, k * L),
        sequence_id=packed_segment_ids(lengths, L, k),
        positions=packed_positions(L, k),
    ).structure_logits.reshape(B, L, -1)
    for i in range(B):
        ell = int(lengths[i])
        np.testing.assert_array_equal(
            np.asarray(ref)[i, :ell], np.asarray(pk)[i, :ell])


@pytest.fixture(scope="module")
def tiny_mdlm():
    cfg = esm3_tiny(head_type="structure")
    net = ESM3(cfg)
    se = TimestepEmbedder(hidden_size=cfg.d_model)
    mdlm = MDLM(net, se, noise=LogLinearNoise(), cfg=MDLMConfig())
    params = mdlm.init(jax.random.PRNGKey(1), batch_size=1, length=16)
    return mdlm, params


def test_ddpm_sample_pack_identical_tokens(tiny_mdlm):
    """pack>1 leaves RNG keys untouched -> same seed, same samples at every
    VALID position (bitwise on CPU).  Positions beyond ``lengths`` are
    meaningless (pads attend differently between pack layouts and every
    caller strips them — generation.py trims to the tokenized length)."""
    mdlm, params = tiny_mdlm
    B, L = 8, 16
    ell = L - 2
    rng = np.random.RandomState(2)
    seq = jnp.asarray(rng.randint(4, 24, (B, L)), jnp.int32)
    lengths = jnp.full((B,), ell, jnp.int32)
    key = jax.random.PRNGKey(7)
    t1 = mdlm.ddpm_sample(params, key, seq, num_steps=4, lengths=lengths,
                          pack=1)
    t2 = mdlm.ddpm_sample(params, key, seq, num_steps=4, lengths=lengths,
                          pack=2)
    np.testing.assert_array_equal(np.asarray(t1)[:, :ell],
                                  np.asarray(t2)[:, :ell])


def test_decoder_packed_parity_on_cpu():
    """The VQ decoder attends unmasked over each row; a packed segment
    attends exactly its own full segment — the same function up to fp
    reduction grouping (XLA tiles the packed matmul shapes differently, so
    unlike the masked trunk case this is not bitwise)."""
    from esmdiff_tpu.models.vqvae import DecoderConfig, StructureTokenDecoder

    cfg = DecoderConfig(d_model=64, n_heads=2, n_layers=2, dtype="float32",
                        scan_layers=False)
    dec = StructureTokenDecoder(cfg)
    rng = np.random.RandomState(3)
    toks = jnp.asarray(rng.randint(0, 4096, (4, 12)), jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), toks[:1])["params"]
    ref = dec.apply({"params": params}, toks, compute_ptm=False)
    pk = dec.apply({"params": params}, toks, compute_ptm=False, pack=2)
    np.testing.assert_allclose(np.asarray(ref["bb_pred"]),
                               np.asarray(pk["bb_pred"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ref["plddt"]),
                               np.asarray(pk["plddt"]), atol=1e-4)


def test_forward_logits_pack_rejects_explicit_sequence_id(tiny_mdlm):
    mdlm, params = tiny_mdlm
    B, L = 4, 8
    toks = jnp.zeros((B, L), jnp.int32)
    seq = jnp.zeros((B, L), jnp.int32)
    sid = jnp.zeros((B, L), jnp.int32)
    with pytest.raises(ValueError):
        mdlm.forward_logits(params, toks, seq, jnp.ones((B, 1)),
                            sequence_id=sid, pack=2)
