import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.core import protein
from esmdiff_tpu.models.vqvae import (
    DecoderConfig,
    EncoderConfig,
    StructureTokenDecoder,
    StructureTokenEncoder,
    decode_structure_tokens,
    knn_graph,
    nearest_code,
)

pytestmark = pytest.mark.slow  # multi-minute compile-heavy module

from esmdiff_tpu.utils.fixtures import bpti_pdb
BPTI = str(bpti_pdb())


def tiny_encoder():
    return StructureTokenEncoder(
        EncoderConfig(d_model=32, n_heads=2, v_heads=4, n_layers=2, d_out=8,
                      n_codes=64, knn=8)
    )


def tiny_decoder():
    return StructureTokenDecoder(
        DecoderConfig(d_model=32, n_heads=2, n_layers=2, dtype="float32",
                      scan_layers=False)
    )


def test_knn_graph_self_first():
    ca = jnp.asarray(np.random.RandomState(0).randn(1, 10, 3) * 10)
    valid = jnp.ones((1, 10), dtype=bool)
    idx, ok = knn_graph(ca, valid, 4)
    np.testing.assert_array_equal(np.asarray(idx[0, :, 0]), np.arange(10))
    assert np.asarray(ok).all()


def test_knn_graph_invalid_residues():
    ca = jnp.asarray(np.random.RandomState(0).randn(1, 6, 3) * 10)
    valid = jnp.ones((1, 6), dtype=bool).at[0, 3].set(False)
    idx, ok = knn_graph(ca, valid, 4)
    # residue 3 never appears as a (valid) neighbor of others
    neigh = np.asarray(idx)[0, [0, 1, 2, 4, 5]]
    okk = np.asarray(ok)[0, [0, 1, 2, 4, 5]]
    assert not (neigh[okk] == 3).any()


def test_nearest_code_exact():
    cb = jnp.asarray(np.random.RandomState(0).randn(16, 4).astype(np.float32))
    z = cb[jnp.asarray([3, 7, 11])]
    idx = nearest_code(z, cb)
    np.testing.assert_array_equal(np.asarray(idx), [3, 7, 11])


def test_encoder_on_bpti():
    prot = protein.from_pdb_file(BPTI)
    if isinstance(prot, list):
        prot = prot[0]
    bb = jnp.asarray(prot.backbone_coords())[None]  # (1, L, 3, 3)
    enc = tiny_encoder()
    params = enc.init(jax.random.PRNGKey(0), bb)
    tokens, z, valid = enc.apply(params, bb)
    L = bb.shape[1]
    assert tokens.shape == (1, L)
    assert np.asarray(valid).all()
    assert (np.asarray(tokens) < 64).all()
    # encoding is deterministic
    tokens2, _, _ = enc.apply(params, bb)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens2))


def test_encoder_equivariance():
    """Structure tokens must be invariant to global rotation+translation."""
    prot = protein.from_pdb_file(BPTI)
    if isinstance(prot, list):
        prot = prot[0]
    bb = prot.backbone_coords()
    enc = tiny_encoder()
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(bb)[None])
    t1, _, _ = enc.apply(params, jnp.asarray(bb)[None])

    # random rigid transform
    rng = np.random.RandomState(1)
    A = rng.randn(3, 3)
    q, _ = np.linalg.qr(A)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    bb2 = bb @ q.T + np.asarray([5.0, -3.0, 11.0], dtype=np.float32)
    t2, _, _ = enc.apply(params, jnp.asarray(bb2)[None])
    match = (np.asarray(t1) == np.asarray(t2)).mean()
    assert match > 0.95, f"tokens not rigid-invariant (match={match})"


def test_encoder_masked_residue():
    prot = protein.from_pdb_file(BPTI)
    if isinstance(prot, list):
        prot = prot[0]
    bb = prot.backbone_coords().copy()
    bb[5] = np.nan
    enc = tiny_encoder()
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(bb)[None])
    tokens, _, valid = enc.apply(params, jnp.asarray(bb)[None])
    assert np.asarray(tokens)[0, 5] == C.STRUCTURE_MASK_TOKEN
    assert not np.asarray(valid)[0, 5]


def test_decoder_shapes():
    dec = tiny_decoder()
    B, L = 2, 12
    toks = jnp.full((B, L), 7, dtype=jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), toks)
    out = dec.apply(params, toks)
    assert out["bb_pred"].shape == (B, L, 3, 3)
    assert out["plddt"].shape == (B, L)
    assert out["ptm"].shape == (B,)
    assert np.isfinite(np.asarray(out["bb_pred"])).all()
    assert (np.asarray(out["plddt"]) >= 0).all()
    assert (np.asarray(out["plddt"]) <= 1).all()
    assert (np.asarray(out["ptm"]) >= 0).all() and (np.asarray(out["ptm"]) <= 1).all()


def test_decode_strips_bos_eos():
    dec = tiny_decoder()
    B, L = 1, 10
    toks = jnp.full((B, L), 7, dtype=jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), toks)
    out = decode_structure_tokens(dec, params["params"], toks)
    assert out["bb_pred"].shape == (B, L - 2, 3, 3)
    assert out["plddt"].shape == (B, L - 2)


def test_encode_decode_roundtrip_shapes():
    """Full encode->decode pipeline produces a valid Protein."""
    prot = protein.from_pdb_file(BPTI)
    if isinstance(prot, list):
        prot = prot[0]
    bb = jnp.asarray(prot.backbone_coords())[None]
    enc, dec = tiny_encoder(), tiny_decoder()
    ep = enc.init(jax.random.PRNGKey(0), bb)
    tokens, _, _ = enc.apply(ep, bb)
    from esmdiff_tpu.core.tokenizer import StructureTokenizer
    wrapped = jnp.asarray(
        StructureTokenizer.add_bos_eos(np.asarray(tokens)[0]))[None]
    dp = dec.init(jax.random.PRNGKey(1), wrapped)
    out = decode_structure_tokens(dec, dp["params"], wrapped)
    bb_pred = np.asarray(out["bb_pred"])[0]
    assert bb_pred.shape == prot.backbone_coords().shape
    rebuilt = protein.from_backbone(bb_pred, sequence=prot.sequence)
    assert rebuilt.sequence == prot.sequence
