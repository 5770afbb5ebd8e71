"""Entropy-bounded adaptive unmasking sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.diffusion.gibbs import entropy_bounded_unmask_sample
from esmdiff_tpu.diffusion.mdlm import MDLM
from esmdiff_tpu.models.esm3 import ESM3, esm3_tiny
from esmdiff_tpu.nn.layers import TimestepEmbedder

B, L = 2, 12


@pytest.fixture(scope="module")
def model():
    cfg = esm3_tiny(dtype="float32", head_type="structure",
                    n_structure_heads=C.STRUCTURE_VOCAB_SIZE)
    net = ESM3(cfg)
    se = TimestepEmbedder(hidden_size=cfg.d_model, dtype=jnp.float32)
    mdlm = MDLM(net, se)
    params = mdlm.init(jax.random.PRNGKey(0))
    seq = jnp.full((B, L), 5, jnp.int32)

    def fwd(tokens):
        logits, _ = mdlm.forward_logits(params, tokens, seq, sigma=None,
                                        shield_specials=True)
        return logits

    return fwd


def _run(fwd, budget, max_steps=32):
    init = jnp.full((B, L), C.STRUCTURE_MASK_TOKEN, jnp.int32)
    dmask = jnp.ones((B, L), bool).at[:, 0].set(False).at[:, -1].set(False)
    return entropy_bounded_unmask_sample(
        fwd, jax.random.PRNGKey(1), init, dmask, entropy_budget=budget,
        max_steps=max_steps)


def test_commits_everything(model):
    x, steps = jax.jit(lambda: _run(model, 2.0))()
    s = np.asarray(x)
    assert (s[:, 1:-1] != C.STRUCTURE_MASK_TOKEN).all()
    assert (s[:, 1:-1] < C.VQVAE_CODEBOOK_SIZE).all()
    assert 1 <= int(steps) <= 32


def test_budget_controls_step_count(model):
    _, steps_small = jax.jit(lambda: _run(model, 0.5, max_steps=64))()
    _, steps_big = jax.jit(lambda: _run(model, 1e9))()
    assert int(steps_big) == 1  # infinite budget -> everything in one step
    assert int(steps_small) >= int(steps_big)


def test_max_steps_bound(model):
    x, steps = jax.jit(lambda: _run(model, 1e-9, max_steps=3))()
    assert int(steps) == 3  # one token per step, bounded
    # exactly 3 tokens committed per batch row
    committed = (np.asarray(x)[:, 1:-1] != C.STRUCTURE_MASK_TOKEN).sum(-1)
    np.testing.assert_array_equal(committed, [3, 3])
