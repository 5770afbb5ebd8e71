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


def test_fsdp_sharding_rules():
    from esmdiff_tpu.parallel import fsdp

    mesh = pmesh.make_mesh()
    # stacked scan leaf: never shard the layer axis, pick largest trailing
    s = fsdp.fsdp_sharding_for(np.zeros((3, 64, 192)), mesh)
    assert s.spec == jax.sharding.PartitionSpec(None, None, pmesh.DATA_AXIS)
    # embedding: largest divisible axis
    s = fsdp.fsdp_sharding_for(np.zeros((4101, 64)), mesh)
    assert s.spec == jax.sharding.PartitionSpec(None, pmesh.DATA_AXIS)
    # small leaves replicated
    s = fsdp.fsdp_sharding_for(np.zeros((64,)), mesh)
    assert all(x is None for x in s.spec)
    # indivisible dims replicated
    s = fsdp.fsdp_sharding_for(np.zeros((4101, 63)), mesh,
                               min_size=1)
    assert all(x is None for x in s.spec)


def test_fsdp_rank2_stacked_leaf_never_shards_layer_axis():
    """A rank-2 scan-stacked leaf (n_layers, d) whose layer count is
    divisible and LARGER than its feature dim must still shard the feature
    axis, not the layer axis (ADVICE round 2).  Path-based detection: leaves
    under a 'blocks' key are stacked."""
    from esmdiff_tpu.parallel import fsdp

    mesh = pmesh.make_mesh()
    n = mesh.devices.size
    # layer axis (4n) divisible and larger than feature dim (2n)
    tree = {"transformer": {"blocks": {"ln": {"scale": np.zeros((4 * n,
                                                                 2 * n))}}},
            "head": {"kernel": np.zeros((4 * n, 2 * n))}}
    sh = fsdp.fsdp_shardings(tree, mesh, min_size=1)
    stacked_spec = sh["transformer"]["blocks"]["ln"]["scale"].spec
    assert stacked_spec == jax.sharding.PartitionSpec(None, pmesh.DATA_AXIS)
    # identical shape outside the stack still picks the largest axis
    free_spec = sh["head"]["kernel"].spec
    assert free_spec == jax.sharding.PartitionSpec(pmesh.DATA_AXIS, None)


def test_fsdp_train_step_matches_ddp():
    """One FSDP (ZeRO-3) step must produce the same loss and updated params
    as the replicated (ddp) step — sharding is a layout, not a math change."""
    from esmdiff_tpu.train import state as tstate

    mdlm, params = _tiny_mdlm()
    optimizer = tstate.make_optimizer(lr=1e-3)
    mesh = pmesh.make_mesh()

    B, L = 8, 16
    rng = np.random.RandomState(0)
    batch = {
        "structure_tokens": jnp.asarray(
            rng.randint(0, 4096, (B, L)), jnp.int32),
        "sequence_tokens": jnp.full((B, L), 5, jnp.int32),
        "mask": jnp.ones((B, L), jnp.float32),
    }

    def loss_fn(p, b, k):
        return mdlm.loss(p, b, k)

    results = {}
    for strategy in ("ddp", "fsdp"):
        state = tstate.create_sharded_train_state(
            params, optimizer, mesh, strategy=strategy)
        if strategy == "fsdp":
            n_sharded = sum(
                1 for leaf in jax.tree.leaves(state.params)
                if any(s is not None for s in leaf.sharding.spec))
            assert n_sharded > 0, "fsdp sharded no param leaves"
        sbatch = pmesh.shard_batch(batch, mesh)
        step = tstate.make_train_step(loss_fn, optimizer, mesh=mesh,
                                      donate=False)
        state2, metrics = step(state, sbatch, jax.random.PRNGKey(1))
        results[strategy] = (
            float(metrics["loss"]),
            jax.device_get(
                jax.tree.leaves(state2.params)[0]),
        )
        if strategy == "fsdp":
            # updated params must KEEP their fsdp sharding (no silent
            # re-replication step over step)
            still = sum(
                1 for leaf in jax.tree.leaves(state2.params)
                if any(s is not None for s in leaf.sharding.spec))
            assert still == n_sharded

    np.testing.assert_allclose(results["fsdp"][0], results["ddp"][0],
                               rtol=1e-5)
    np.testing.assert_allclose(results["fsdp"][1], results["ddp"][1],
                               atol=1e-5, rtol=1e-5)


def test_ring_attention_matches_xla():
    """Sequence-parallel ring attention (K/V ppermute ring, online softmax)
    must equal the single-device XLA attention, including padded rows."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from esmdiff_tpu.nn.attention import dot_product_attention
    from esmdiff_tpu.parallel import ring

    B, L, H, Dh = 2, 64, 2, 16
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, L, H, Dh), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, H, Dh), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, H, Dh), jnp.float32)
    lengths = jnp.asarray([64, 37], jnp.int32)

    ref = dot_product_attention(q, k, v, lengths=lengths, backend="xla")

    mesh = Mesh(np.asarray(jax.devices()), (ring.SEQ_AXIS,))
    spec = NamedSharding(mesh, P(None, ring.SEQ_AXIS, None, None))
    q_s, k_s, v_s = (jax.device_put(x, spec) for x in (q, k, v))
    out = ring.ring_attention(q_s, k_s, v_s, lengths, mesh=mesh)
    # output stays length-sharded (no hidden re-replication)
    assert out.sharding.spec[1] == ring.SEQ_AXIS
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)

    # no-lengths path (all rows fully valid)
    ref2 = dot_product_attention(q, k, v, backend="xla")
    out2 = ring.ring_attention(q_s, k_s, v_s, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=2e-5, rtol=1e-5)

    # indivisible L rejected
    with pytest.raises(ValueError):
        ring.ring_attention(q_s[:, :63], k_s[:, :63], v_s[:, :63],
                            mesh=mesh)


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
