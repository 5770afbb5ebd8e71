"""Golden-activation regression tests.

No pretrained weights exist in this environment, so golden files are
generated from fixed-seed tiny models (committed under tests/golden/).  They
pin the numerical behavior of the trunk forward, the MDLM loss, and the
sampler trajectory across refactors — the in-repo analogue of the
reference-activation parity tests planned in SURVEY.md §4.

Regenerate (only after an intentional semantic change):
    python tests/test_golden.py regen
"""

import pathlib
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute compile-heavy module

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def _build():
    import jax
    import jax.numpy as jnp

    from esmdiff_tpu.core import constants as C
    from esmdiff_tpu.diffusion.mdlm import MDLM, MDLMConfig
    from esmdiff_tpu.diffusion.noise import LogLinearNoise
    from esmdiff_tpu.models.esm3 import ESM3, esm3_tiny
    from esmdiff_tpu.nn.layers import TimestepEmbedder

    cfg = esm3_tiny(dtype="float32", head_type="structure",
                    n_structure_heads=C.STRUCTURE_VOCAB_SIZE)
    net = ESM3(cfg)
    se = TimestepEmbedder(hidden_size=cfg.d_model, dtype=jnp.float32)
    mdlm = MDLM(net, se, noise=LogLinearNoise(), cfg=MDLMConfig())
    params = mdlm.init(jax.random.PRNGKey(1234))

    B, L = 2, 12
    seq = jnp.arange(B * L, dtype=jnp.int32).reshape(B, L) % 20 + 4
    xt = (jnp.arange(B * L, dtype=jnp.int32).reshape(B, L) * 37) % 4096
    xt = xt.at[:, ::3].set(C.STRUCTURE_MASK_TOKEN)
    sigma = jnp.asarray([[0.3], [0.9]])

    logits, _ = mdlm.forward_logits(params, xt, seq, sigma,
                                    shield_specials=True)
    batch = {
        "structure_tokens": (xt * 7) % 4096,
        "sequence_tokens": seq,
        "mask": jnp.ones((B, L), jnp.float32),
    }
    loss, _ = mdlm.loss(params, batch, jax.random.PRNGKey(7))
    sample = mdlm.ddpm_sample(params, jax.random.PRNGKey(9), seq, num_steps=6)

    # gibbs + eb trajectories through the same trunk
    from esmdiff_tpu.diffusion.gibbs import (
        entropy_bounded_unmask_sample, iterative_unmask_sample)

    def fwd(tokens):
        lg, _ = mdlm.forward_logits(params, tokens, seq, sigma=None,
                                    shield_specials=True)
        return lg

    init = jnp.full((B, L), C.STRUCTURE_MASK_TOKEN, jnp.int32)
    dmask = jnp.ones((B, L), bool).at[:, 0].set(False).at[:, -1].set(False)
    gibbs_sample = iterative_unmask_sample(
        fwd, jax.random.PRNGKey(11), init, dmask, num_steps=4,
        temperature=1.4, top_p=0.9)
    eb_sample, eb_steps = entropy_bounded_unmask_sample(
        fwd, jax.random.PRNGKey(13), init, dmask, entropy_budget=3.0,
        max_steps=16)
    return {
        "logits_slice": np.asarray(logits[:, :4, :8], np.float32),
        "loss": np.asarray(loss, np.float32),
        "sample": np.asarray(sample, np.int32),
        "gibbs_sample": np.asarray(gibbs_sample, np.int32),
        "eb_sample": np.asarray(eb_sample, np.int32),
        "eb_steps": np.asarray(eb_steps, np.int32),
    }


def test_golden_forward_loss_sample():
    got = _build()
    ref = np.load(GOLDEN_DIR / "tiny_mdlm.npz")
    np.testing.assert_allclose(got["logits_slice"], ref["logits_slice"],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(got["loss"], ref["loss"], atol=1e-4, rtol=1e-4)
    # trajectories are PRNG-dependent; exact token match pins both the math
    # and the RNG consumption order
    np.testing.assert_array_equal(got["sample"], ref["sample"])
    np.testing.assert_array_equal(got["gibbs_sample"], ref["gibbs_sample"])
    np.testing.assert_array_equal(got["eb_sample"], ref["eb_sample"])
    np.testing.assert_array_equal(got["eb_steps"], ref["eb_steps"])


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import os

        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.savez(GOLDEN_DIR / "tiny_mdlm.npz", **_build())
        print("golden regenerated")
