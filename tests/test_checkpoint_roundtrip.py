"""Train -> orbax checkpoint -> load_runtime -> sample (the --ckpt CLI path)."""

import numpy as np
import pytest

from esmdiff_tpu.core import constants as C

pytestmark = pytest.mark.slow  # multi-minute compile-heavy module


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


def test_load_runtime_from_torch_file(tmp_path):
    """Torch-file path: export a tiny trunk to DeepSpeed layout, load it."""
    import jax
    import jax.numpy as jnp
    import torch

    from esmdiff_tpu.convert.checkpoints import load_runtime
    from esmdiff_tpu.convert.torch_to_jax import (
        export_torch_state_dict, trunk_rules)
    from esmdiff_tpu.models.esm3 import ESM3, esm3_tiny
    from esmdiff_tpu.models.vqvae import DecoderConfig, EncoderConfig

    cfg = esm3_tiny(dtype="float32", head_type="structure",
                    n_structure_heads=4101)
    model = ESM3(cfg)
    seq = jnp.full((1, 8), 5, jnp.int32)
    params = model.init(jax.random.PRNGKey(3), sequence_tokens=seq,
                        structure_coords=jnp.zeros((1, 8, 3, 3)))["params"]
    rules = trunk_rules(cfg.n_layers, cfg.n_layers_geom, cfg.head_type)
    sd = export_torch_state_dict(
        params, rules, n_scan_layers=cfg.n_layers - cfg.n_layers_geom,
        scan_layer_offset=cfg.n_layers_geom)
    ckpt = tmp_path / "mp_rank_00_model_states.pt"
    torch.save({"module": {("net." + k): torch.from_numpy(np.asarray(v))
                           for k, v in sd.items()}}, ckpt)

    runtime = load_runtime(
        str(ckpt), trunk_cfg=cfg,
        encoder_cfg=EncoderConfig(d_model=32, n_heads=2, v_heads=4,
                                  n_layers=2, d_out=8, knn=8),
        decoder_cfg=DecoderConfig(d_model=32, n_heads=2, n_layers=2,
                                  dtype="float32", scan_layers=False))
    out = runtime.trunk.apply({"params": runtime.trunk_params},
                              sequence_tokens=seq)
    ref = model.apply({"params": params}, sequence_tokens=seq)
    np.testing.assert_allclose(np.asarray(out.structure_logits),
                               np.asarray(ref.structure_logits), atol=1e-5)


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


def test_vqvae_save_load_roundtrip(tmp_path):
    """save_vqvae/load_vqvae (the quality-campaign trained-VQ-VAE path)
    round-trips configs + params and plugs into load_runtime via
    --vqvae_ckpt."""
    import jax

    from esmdiff_tpu.convert.checkpoints import load_vqvae, save_vqvae
    from esmdiff_tpu.models.vqvae import (
        DecoderConfig, EncoderConfig, StructureTokenDecoder,
        StructureTokenEncoder)
    import jax.numpy as jnp

    ecfg = EncoderConfig(d_model=32, n_heads=2, v_heads=4, n_layers=2,
                         d_out=8, knn=8)
    dcfg = DecoderConfig(d_model=32, n_heads=2, n_layers=2, dtype="float32",
                         scan_layers=False, predict_ptm=False, remat=True)
    enc = StructureTokenEncoder(ecfg)
    dec = StructureTokenDecoder(dcfg)
    ep = jax.jit(lambda k: enc.init(k, jnp.zeros((1, 8, 3, 3))))(
        jax.random.PRNGKey(0))["params"]
    dp = jax.jit(lambda k: dec.init(k, jnp.zeros((1, 8), jnp.int32)))(
        jax.random.PRNGKey(1))["params"]
    save_vqvae(tmp_path / "vq", ecfg, ep, dcfg, dp)
    ecfg2, ep2, dcfg2, dp2 = load_vqvae(tmp_path / "vq")
    assert ecfg2 == ecfg and dcfg2 == dcfg
    for a, b in zip(jax.tree.leaves(ep), jax.tree.leaves(ep2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out = dec.apply({"params": dp2}, jnp.zeros((1, 8), jnp.int32))
    assert np.isfinite(np.asarray(out["bb_pred"])).all()


def test_load_runtime_with_trained_vqvae(trained_run, tmp_path):
    """load_runtime(--vqvae_ckpt) pairs the trained trunk with a saved
    VQ-VAE instead of the size-matched random one."""
    import jax
    import jax.numpy as jnp

    from esmdiff_tpu.convert.checkpoints import load_runtime, save_vqvae
    from esmdiff_tpu.models.vqvae import (
        DecoderConfig, EncoderConfig, StructureTokenDecoder,
        StructureTokenEncoder)

    ecfg = EncoderConfig(d_model=32, n_heads=2, v_heads=4, n_layers=2,
                         d_out=8, knn=8)
    dcfg = DecoderConfig(d_model=48, n_heads=2, n_layers=2, dtype="float32",
                         scan_layers=False, predict_ptm=False)
    enc = StructureTokenEncoder(ecfg)
    dec = StructureTokenDecoder(dcfg)
    ep = jax.jit(lambda k: enc.init(k, jnp.zeros((1, 8, 3, 3))))(
        jax.random.PRNGKey(0))["params"]
    dp = jax.jit(lambda k: dec.init(k, jnp.zeros((1, 8), jnp.int32)))(
        jax.random.PRNGKey(1))["params"]
    save_vqvae(tmp_path / "vq", ecfg, ep, dcfg, dp)

    run_dir, _ = trained_run
    runtime = load_runtime(str(run_dir / "ckpt"),
                           vqvae_ckpt=str(tmp_path / "vq"))
    assert runtime.decoder.cfg.d_model == 48
    from esmdiff_tpu.api.generation import EnsembleSampler

    sampler = EnsembleSampler(runtime)
    seq = "MKTAYIAKQRQISFVKSHFSRQ"
    tokens = sampler.ddpm_ensemble(seq, num_samples=2, num_steps=2)
    prots = sampler.decode_ensemble(seq, tokens)
    assert len(prots) == 2 and prots[0].sequence == seq
