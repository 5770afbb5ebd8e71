"""Parallelism: data mesh, ZeRO shardings, and 2-D tensor parallelism on the
virtual 8-device CPU mesh.  TP-sharded forward must equal the replicated one."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.diffusion.mdlm import MDLM, MDLMConfig
from esmdiff_tpu.diffusion.noise import LogLinearNoise
from esmdiff_tpu.models.esm3 import ESM3, esm3_tiny
from esmdiff_tpu.nn.layers import TimestepEmbedder
from esmdiff_tpu.parallel import mesh as pmesh
from esmdiff_tpu.parallel import tp

pytestmark = pytest.mark.slow  # multi-minute compile-heavy module


def _tiny_mdlm():
    cfg = esm3_tiny(dtype="float32", head_type="structure",
                    n_structure_heads=C.STRUCTURE_VOCAB_SIZE)
    net = ESM3(cfg)
    se = TimestepEmbedder(hidden_size=cfg.d_model, dtype=jnp.float32)
    mdlm = MDLM(net, se, noise=LogLinearNoise(), cfg=MDLMConfig())
    params = mdlm.init(jax.random.PRNGKey(0))
    return mdlm, params


def test_devices_available():
    assert len(jax.devices()) == 8


def test_data_mesh_for_batch():
    m = pmesh.make_data_mesh_for_batch(16)
    assert m.devices.size == 8
    m2 = pmesh.make_data_mesh_for_batch(6)
    assert m2.devices.size == 6
    m3 = pmesh.make_data_mesh_for_batch(1)
    assert m3.devices.size == 1


def test_zero_shardings_shard_big_leaves():
    mesh = pmesh.make_mesh()
    big = np.zeros((16, 4))
    small = np.zeros((3,))
    s_big = pmesh.zero_sharding_for(big, mesh)
    s_small = pmesh.zero_sharding_for(small, mesh)
    assert s_big.spec[0] == pmesh.DATA_AXIS
    assert all(s is None for s in s_small.spec)


def test_tp_spec_rules():
    mesh = tp.make_2d_mesh(2, 4)
    # scanned qkv kernel (layers, in, out) -> shard last dim
    spec = tp._spec_for(("transformer", "blocks", "block", "attn", "qkv",
                         "kernel"), 3, (3, 64, 192), 4)
    assert spec == jax.sharding.PartitionSpec(None, None, "model")
    # out kernel -> shard input dim
    spec = tp._spec_for(("transformer", "block0", "attn", "out", "kernel"),
                        2, (64, 64), 4)
    assert spec == jax.sharding.PartitionSpec("model", None)
    # indivisible dims stay replicated
    spec = tp._spec_for(("transformer", "block0", "attn", "qkv", "kernel"),
                        2, (64, 190), 4)
    assert spec == jax.sharding.PartitionSpec()
    # norms replicated
    spec = tp._spec_for(("transformer", "norm", "scale"), 1, (64,), 4)
    assert spec == jax.sharding.PartitionSpec()


def test_tp_forward_matches_replicated():
    mdlm, params = _tiny_mdlm()
    B, L = 4, 16
    seq = jnp.full((B, L), 5, jnp.int32)
    xt = jnp.full((B, L), C.STRUCTURE_MASK_TOKEN, jnp.int32)
    sigma = jnp.full((B, 1), 0.5)

    ref, _ = jax.jit(mdlm.forward_logits)(params, xt, seq, sigma)

    mesh = tp.make_2d_mesh(2, 4)
    with mesh:
        sharded_params = jax.device_put(
            params, tp.mdlm_param_shardings(params, mesh))
        xt_s = jax.device_put(xt, tp.batch_sharding(mesh, 2))
        seq_s = jax.device_put(seq, tp.batch_sharding(mesh, 2))
        out, _ = jax.jit(mdlm.forward_logits)(sharded_params, xt_s, seq_s,
                                              sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_tp_train_step():
    """Full training step on a 2x4 (data x model) mesh."""
    import optax

    from esmdiff_tpu.train import state as tstate

    mdlm, params = _tiny_mdlm()
    optimizer = tstate.make_optimizer(lr=1e-3)
    state = tstate.create_train_state(params, optimizer)

    mesh = tp.make_2d_mesh(2, 4)
    with mesh:
        pshard = tp.mdlm_param_shardings(params, mesh)
        state = tstate.TrainState(
            step=jax.device_put(state.step,
                                jax.sharding.NamedSharding(
                                    mesh, jax.sharding.PartitionSpec())),
            params=jax.device_put(state.params, pshard),
            opt_state=jax.device_put(
                state.opt_state,
                jax.tree.map(
                    lambda _: jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec()),
                    state.opt_state)),
        )
        B, L = 4, 16
        rng = np.random.RandomState(0)
        batch = {
            "structure_tokens": jnp.asarray(
                rng.randint(0, 4096, (B, L)), jnp.int32),
            "sequence_tokens": jnp.full((B, L), 5, jnp.int32),
            "mask": jnp.ones((B, L), jnp.float32),
        }
        batch = tp.shard_batch_2d(batch, mesh)
        step = tstate.make_train_step(
            lambda p, b, k: mdlm.loss(p, b, k), optimizer)
        state2, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(jax.device_get(state2.step)) == 1
