"""Train -> orbax checkpoint -> load_runtime -> sample (the --ckpt CLI path)."""

import numpy as np
import pytest

from esmdiff_tpu.core import constants as C


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt_rt")
    enc = root / "enc"
    enc.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        L = rng.randint(16, 40)
        np.savez(
            enc / f"c{i}.npz",
            sequence_tokens=np.concatenate(
                [[C.SEQUENCE_BOS_TOKEN], rng.randint(4, 24, L),
                 [C.SEQUENCE_EOS_TOKEN]]).astype(np.int32),
            structure_tokens=np.concatenate(
                [[C.STRUCTURE_BOS_TOKEN], rng.randint(0, 4096, L),
                 [C.STRUCTURE_EOS_TOKEN]]).astype(np.int32),
        )
    from esmdiff_tpu.train.config import load_config, save_config
    from esmdiff_tpu.train.loop import train

    cfg = load_config(None, [
        f"data.path={enc}", "data.batch_size=2", "data.max_len=32",
        "data.bucket_multiple=16",
        "model.size=tiny", "model.dtype=float32", "model.remat=false",
        "trainer.max_epochs=1", "trainer.log_every_n_steps=100",
        f"trainer.ckpt_dir={root}/run",
    ])
    save_config(cfg, root / "run" / "config.yaml")
    result = train(cfg)
    return root / "run", result


def test_load_runtime_and_sample(trained_run):
    from esmdiff_tpu.convert.checkpoints import load_runtime
    from esmdiff_tpu.api.generation import EnsembleSampler

    run_dir, result = trained_run
    runtime = load_runtime(str(run_dir / "ckpt"))
    sampler = EnsembleSampler(runtime)
    seq = "MKTAYIAKQRQISFVKSHFSRQ"
    tokens = sampler.ddpm_ensemble(seq, num_samples=2, num_steps=3)
    assert tokens.shape == (2, len(seq))
    assert (tokens < 4096).all()
    prots = sampler.decode_ensemble(seq, tokens)
    assert len(prots) == 2 and prots[0].sequence == seq
