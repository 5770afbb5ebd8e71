import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.models.esm3 import ESM3, esm3_tiny
from esmdiff_tpu.nn.geometric import build_affine3d_from_coordinates

pytestmark = pytest.mark.slow  # multi-minute compile-heavy module


@pytest.fixture(scope="module")
def tiny_model():
    cfg = esm3_tiny(dtype="float32")
    model = ESM3(cfg)
    B, L = 2, 16
    seq = jnp.ones((B, L), dtype=jnp.int32) * 5
    params = model.init(jax.random.PRNGKey(0), sequence_tokens=seq,
                        structure_coords=jnp.zeros((*seq.shape, 3, 3)))
    return model, params, cfg


def test_forward_shapes(tiny_model):
    model, params, cfg = tiny_model
    B, L = 2, 16
    seq = jnp.ones((B, L), dtype=jnp.int32) * 5
    out = model.apply(params, sequence_tokens=seq)
    assert out.structure_logits.shape == (B, L, C.VQVAE_CODEBOOK_SIZE)
    assert out.sequence_logits.shape == (B, L, C.SEQUENCE_EMBED_SIZE)
    assert out.embeddings.shape == (B, L, cfg.d_model)
    assert np.isfinite(np.asarray(out.structure_logits)).all()


def test_structure_head_variant():
    cfg = esm3_tiny(dtype="float32", head_type="structure",
                    n_structure_heads=C.STRUCTURE_VOCAB_SIZE)
    model = ESM3(cfg)
    B, L = 1, 8
    seq = jnp.ones((B, L), dtype=jnp.int32) * 5
    params = model.init(jax.random.PRNGKey(0), sequence_tokens=seq,
                        structure_coords=jnp.zeros((*seq.shape, 3, 3)))
    out = model.apply(params, sequence_tokens=seq)
    assert out.structure_logits.shape == (B, L, 4101)
    # dummy tracks are zeros
    assert np.asarray(out.sasa_logits).sum() == 0.0


def test_special_token_tying(tiny_model):
    """Structure tokens at sequence BOS/EOS/PAD positions must be overridden,
    so logits are invariant to the input structure token there."""
    model, params, cfg = tiny_model
    B, L = 1, 8
    seq = jnp.full((B, L), 5, dtype=jnp.int32)
    seq = seq.at[0, 0].set(C.SEQUENCE_BOS_TOKEN)
    seq = seq.at[0, -1].set(C.SEQUENCE_EOS_TOKEN)
    st1 = jnp.full((B, L), 7, dtype=jnp.int32)
    st2 = st1.at[0, 0].set(100).at[0, -1].set(200)
    out1 = model.apply(params, sequence_tokens=seq, structure_tokens=st1)
    out2 = model.apply(params, sequence_tokens=seq, structure_tokens=st2)
    np.testing.assert_allclose(
        np.asarray(out1.structure_logits), np.asarray(out2.structure_logits),
        atol=1e-5,
    )


def test_minus_one_maps_to_mask(tiny_model):
    model, params, cfg = tiny_model
    B, L = 1, 8
    seq = jnp.full((B, L), 5, dtype=jnp.int32)
    st_m1 = jnp.full((B, L), -1, dtype=jnp.int32)
    st_mask = jnp.full((B, L), C.STRUCTURE_MASK_TOKEN, dtype=jnp.int32)
    out1 = model.apply(params, sequence_tokens=seq, structure_tokens=st_m1)
    out2 = model.apply(params, sequence_tokens=seq, structure_tokens=st_mask)
    np.testing.assert_allclose(
        np.asarray(out1.structure_logits), np.asarray(out2.structure_logits),
        atol=1e-5,
    )


def test_auxiliary_embeddings_change_output(tiny_model):
    model, params, cfg = tiny_model
    B, L = 1, 8
    seq = jnp.full((B, L), 5, dtype=jnp.int32)
    # NB: a feature-constant vector would be invisible to the pre-norm
    # LayerNorms, so use a random embedding.
    aux = jax.random.normal(jax.random.PRNGKey(1), (B, L, cfg.d_model))
    out1 = model.apply(params, sequence_tokens=seq)
    out2 = model.apply(params, sequence_tokens=seq, auxiliary_embeddings=aux)
    assert np.abs(
        np.asarray(out1.structure_logits) - np.asarray(out2.structure_logits)
    ).max() > 1e-4


def test_affine_from_coordinates():
    coords = np.random.RandomState(0).randn(1, 6, 3, 3).astype(np.float32) * 5
    coords[0, 2] = np.nan  # frameless residue
    affine, mask = build_affine3d_from_coordinates(jnp.asarray(coords))
    mask = np.asarray(mask)
    assert mask.shape == (1, 6)
    assert not mask[0, 2] and mask[0, 0]
    rot = np.asarray(affine.rot)
    # rotations are orthonormal
    eye = np.einsum("blij,blkj->blik", rot, rot)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)
    # frameless slot is identity
    np.testing.assert_allclose(rot[0, 2], np.eye(3), atol=1e-6)
    # det = +1 (proper rotation)
    det = np.linalg.det(rot)
    np.testing.assert_allclose(det, 1.0, atol=1e-4)


def test_all_nan_coords_default_path(tiny_model):
    """The training path passes no coords -> all-NaN -> masked frames.  Must
    produce finite logits (mask_and_zero_frameless)."""
    model, params, cfg = tiny_model
    B, L = 1, 8
    seq = jnp.full((B, L), 5, dtype=jnp.int32)
    coords = jnp.full((B, L, 3, 3), jnp.nan)
    out = model.apply(params, sequence_tokens=seq, structure_coords=coords)
    assert np.isfinite(np.asarray(out.structure_logits)).all()


def test_scan_equals_loop():
    """Scanned layer stack must equal the unrolled loop given the same params."""
    cfg_scan = esm3_tiny(dtype="float32", scan_layers=True, remat=False)
    cfg_loop = esm3_tiny(dtype="float32", scan_layers=False, remat=False)
    B, L = 1, 8
    seq = jnp.full((B, L), 5, dtype=jnp.int32)
    m_scan, m_loop = ESM3(cfg_scan), ESM3(cfg_loop)
    p_scan = m_scan.init(jax.random.PRNGKey(0), sequence_tokens=seq,
                         structure_coords=jnp.zeros((*seq.shape, 3, 3)))

    # repack stacked scan params into per-layer loop params
    import flax
    flat = flax.traverse_util.flatten_dict(p_scan["params"])
    new = {}
    for k, v in flat.items():
        if k[0] == "transformer" and k[1] == "blocks":
            for i in range(v.shape[0]):
                nk = ("transformer", f"block{i + 1}") + k[3:]
                new[nk] = v[i]
        else:
            new[k] = v
    p_loop = {"params": flax.traverse_util.unflatten_dict(new)}

    out_scan = m_scan.apply(p_scan, sequence_tokens=seq)
    out_loop = m_loop.apply(p_loop, sequence_tokens=seq)
    np.testing.assert_allclose(
        np.asarray(out_scan.structure_logits),
        np.asarray(out_loop.structure_logits), atol=1e-4,
    )
