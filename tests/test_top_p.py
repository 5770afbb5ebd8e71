"""Sort-free top-p bisection vs the exact sort-based reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.diffusion.gibbs import top_p_filter


@pytest.mark.parametrize("top_p", [0.5, 0.9, 0.95])
def test_bisect_matches_exact(top_p):
    logits = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 512)) * 3.0
    exact = np.asarray(top_p_filter(logits, top_p, exact=True))
    fast = np.asarray(top_p_filter(logits, top_p))
    keep_exact = exact > -1e8
    keep_fast = fast > -1e8
    # identical keep sets except possibly at the exact boundary token
    disagree = (keep_exact != keep_fast).sum(axis=-1)
    assert disagree.max() <= 1
    # kept mass is >= top_p in both
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    mass_fast = (probs * keep_fast).sum(-1)
    assert (mass_fast >= top_p - 1e-3).all()


def test_top_p_one_keeps_everything():
    logits = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64))
    out = np.asarray(top_p_filter(logits, 1.0))
    assert (out > -1e8).all()
