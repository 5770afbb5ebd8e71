import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.utils.tensor import (
    batched_gather,
    chunk_apply,
    distogram,
    masked_mean,
    pseudo_beta,
)


def test_masked_mean():
    v = jnp.asarray([1.0, 2.0, 3.0, 100.0])
    m = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    assert float(masked_mean(m, v)) == pytest.approx(2.0, abs=1e-3)


def test_batched_gather():
    data = jnp.arange(12).reshape(3, 4)
    inds = jnp.asarray([[0, 3], [1, 2], [2, 0]])
    out = np.asarray(batched_gather(data, inds, axis=1))
    np.testing.assert_array_equal(out, [[0, 3], [5, 6], [10, 8]])


def test_chunk_apply_matches_direct():
    x = jnp.arange(23.0).reshape(23, 1)
    fn = lambda a: a * 2 + 1
    np.testing.assert_allclose(
        np.asarray(chunk_apply(fn, x, 5)), np.asarray(fn(x)))


def test_distogram():
    ca = jnp.asarray([[0.0, 0, 0], [3.0, 0, 0], [30.0, 0, 0]])[None]
    d = np.asarray(distogram(ca))
    assert d.shape == (1, 3, 3)
    assert d[0, 0, 0] == 0
    assert d[0, 0, 2] == 63  # beyond max bin
    assert 0 < d[0, 0, 1] < 10


def test_pseudo_beta_glycine_fallback():
    pos = np.zeros((2, 37, 3), np.float32)
    pos[:, 1] = [1, 1, 1]  # CA
    pos[:, 3] = [2, 2, 2]  # CB
    aatype = np.asarray([7, 0])  # GLY, ALA
    out = np.asarray(pseudo_beta(jnp.asarray(pos), jnp.asarray(aatype)))
    np.testing.assert_array_equal(out[0], [1, 1, 1])
    np.testing.assert_array_equal(out[1], [2, 2, 2])


def test_metric_logger_sinks(tmp_path):
    """CSV logger + tensorboard sink (reference pluggable loggers,
    configs/logger/; SURVEY.md §5 observability)."""
    from esmdiff_tpu.utils.logging import MetricLogger, make_sink

    logger = MetricLogger(tmp_path / "m.csv")
    seen = []
    logger.add_sink(seen.append)
    logger.add_sink(make_sink("tensorboard", tmp_path / "tb",
                              config={"lr": 1e-5}))
    logger.log({"loss": 1.5, "step": 1, "split": "train"})
    logger.log({"loss": 1.2, "step": 2, "split": "val"})
    assert len(seen) == 2
    assert (tmp_path / "m.csv").read_text().count("\n") == 3
    assert list((tmp_path / "tb").glob("events.*")), "tb event file written"
    # unknown backend is a loud error; disabled backends are no-ops
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_sink("nonexistent", tmp_path)
    make_sink("none", tmp_path)({"loss": 1.0})
