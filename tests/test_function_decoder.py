import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.models.function_decoder import (
    FunctionDecoderConfig,
    FunctionTokenDecoder,
)

pytestmark = pytest.mark.slow  # multi-minute compile-heavy module


def test_function_decoder_shapes():
    cfg = FunctionDecoderConfig(d_model=32, n_heads=2, n_layers=2,
                                interpro_classes=100, keyword_vocab=200)
    dec = FunctionTokenDecoder(cfg)
    toks = jnp.asarray(np.random.RandomState(0).randint(0, 260, (3, 8)),
                       dtype=jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), toks)
    out = dec.apply(params, toks)
    assert out["interpro_logits"].shape == (3, 100)
    assert out["keyword_logits"].shape == (3, 200)
    assert np.isfinite(np.asarray(out["interpro_logits"])).all()
    # depth-offset embedding: permuting depth positions changes the output
    out2 = dec.apply(params, toks[:, ::-1])
    assert np.abs(np.asarray(out["interpro_logits"])
                  - np.asarray(out2["interpro_logits"])).max() > 1e-6
