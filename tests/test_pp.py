"""Pipeline parallelism (parallel/pp.py): GPipe schedule over the 8-device
CPU mesh — forward parity, gradient parity, and a stage-sharded train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from esmdiff_tpu.models.esm3 import ESM3, esm3_tiny
from esmdiff_tpu.parallel import pp

pytestmark = pytest.mark.slow  # compile-heavy module

S = 8  # stages = all virtual devices


def stage_mesh(n=S):
    return Mesh(np.asarray(jax.devices()[:n]), (pp.STAGE_AXIS,))


# ---------------------------------------------------------------------------
# generic pipeline_stack
# ---------------------------------------------------------------------------

def test_pipeline_stack_matches_sequential():
    mesh = stage_mesh()
    n_layers, B, D, M = 16, 4, 8, 2
    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(n_layers, D, D) * 0.3, jnp.float32),
              "b": jnp.asarray(rng.randn(n_layers, D) * 0.1, jnp.float32)}
    x = jnp.asarray(rng.randn(B, D), jnp.float32)
    scale = jnp.asarray(rng.rand(B) + 0.5, jnp.float32)  # per-example arg

    def block_fn(p, h, pe_scale):
        return jnp.tanh(h @ p["w"] + p["b"]) * pe_scale[:, None]

    ref = x
    for i in range(n_layers):
        ref = block_fn({"w": params["w"][i], "b": params["b"][i]}, ref, scale)

    out = pp.pipeline_stack(block_fn, params, x, mesh=mesh, n_microbatches=M,
                            per_example=(scale,))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_stack_pads_indivisible_layer_count():
    """47 scanned layers (the real trunk, prime) over 8 stages: the stack is
    padded with inert layers and still matches sequential application."""
    mesh = stage_mesh()
    n_layers, B, D, M = 47, 4, 8, 2
    rng = np.random.RandomState(4)
    params = {"w": jnp.asarray(rng.randn(n_layers, D, D) * 0.2, jnp.float32)}
    x = jnp.asarray(rng.randn(B, D), jnp.float32)

    def block_fn(p, h):
        return jnp.tanh(h @ p["w"]) + h

    ref = x
    for i in range(n_layers):
        ref = block_fn({"w": params["w"][i]}, ref)
    out = pp.pipeline_stack(block_fn, params, x, mesh=mesh, n_microbatches=M)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # gradients w.r.t. the unpadded stack survive the padding round-trip
    def loss(p):
        return jnp.sum(pp.pipeline_stack(block_fn, p, x, mesh=mesh,
                                         n_microbatches=M) ** 2)

    def loss_ref(p):
        h = x
        for i in range(n_layers):
            h = block_fn({"w": p["w"][i]}, h)
        return jnp.sum(h ** 2)

    g = jax.grad(loss)(params)
    g_ref = jax.grad(loss_ref)(params)
    assert g["w"].shape == (n_layers, D, D)
    np.testing.assert_allclose(np.asarray(g["w"]), np.asarray(g_ref["w"]),
                               atol=1e-4, rtol=1e-4)


def test_pipeline_stack_pp_x_dp_composition():
    """2-D (stage x data) mesh: layers shard over 4 stages, the batch over
    2 data slices, each slice running its own GPipe schedule — output must
    match sequential application."""
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                (pp.STAGE_AXIS, "data"))
    n_layers, B, D, M = 8, 8, 8, 2
    rng = np.random.RandomState(5)
    params = {"w": jnp.asarray(rng.randn(n_layers, D, D) * 0.2, jnp.float32)}
    x = jnp.asarray(rng.randn(B, D), jnp.float32)
    scale = jnp.asarray(rng.rand(B) + 0.5, jnp.float32)

    def block_fn(p, h, pe_scale):
        return jnp.tanh(h @ p["w"]) * pe_scale[:, None] + h

    ref = x
    for i in range(n_layers):
        ref = block_fn({"w": params["w"][i]}, ref, scale)
    out = pp.pipeline_stack(block_fn, params, x, mesh=mesh, n_microbatches=M,
                            per_example=(scale,), data_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_stack_validates_batch():
    mesh = stage_mesh()
    with pytest.raises(ValueError, match="batch"):
        pp.pipeline_stack(lambda p, h: h, {"w": jnp.zeros((8, 4, 4))},
                          jnp.zeros((5, 4)), mesh=mesh, n_microbatches=2)


# ---------------------------------------------------------------------------
# ESM3 trunk pipelined
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_trunk():
    # 1 geometric block + 8 scanned blocks -> 1 layer per stage on 8 devices
    cfg = esm3_tiny(dtype="float32", head_type="structure", n_layers=9)
    net = ESM3(cfg)
    seq = jnp.full((2, 12), 5, jnp.int32)
    params = jax.jit(lambda k: net.init(k, sequence_tokens=seq))(
        jax.random.PRNGKey(0))["params"]
    return net, params


def _batch(B=4, L=12):
    rng = np.random.RandomState(1)
    seq = jnp.asarray(rng.randint(4, 24, (B, L)), jnp.int32)
    st = jnp.asarray(rng.randint(0, 4096, (B, L)), jnp.int32)
    lengths = jnp.asarray([L, L - 2, L - 5, L] [:B], jnp.int32)
    return seq, st, lengths


def test_esm3_pp_forward_matches_unpipelined(tiny_trunk):
    net, params = tiny_trunk
    mesh = stage_mesh()
    seq, st, lengths = _batch()

    ref = net.apply({"params": params}, structure_tokens=st,
                    sequence_tokens=seq, lengths=lengths)
    out = pp.esm3_pp_forward(net, params, mesh, n_microbatches=2,
                             structure_tokens=st, sequence_tokens=seq,
                             lengths=lengths)
    np.testing.assert_allclose(np.asarray(out.structure_logits),
                               np.asarray(ref.structure_logits),
                               atol=2e-4, rtol=2e-4)


def test_esm3_pp_grad_parity(tiny_trunk):
    net, params = tiny_trunk
    mesh = stage_mesh()
    seq, st, lengths = _batch()
    labels = jnp.asarray(np.random.RandomState(2).randint(0, 4096, st.shape),
                         jnp.int32)

    def ce(logits):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(lp, labels[..., None],
                                             axis=-1))

    def loss_ref(p):
        out = net.apply({"params": p}, structure_tokens=st,
                        sequence_tokens=seq, lengths=lengths)
        return ce(out.structure_logits)

    def loss_pp(p):
        out = pp.esm3_pp_forward(net, p, mesh, n_microbatches=2,
                                 structure_tokens=st, sequence_tokens=seq,
                                 lengths=lengths)
        return ce(out.structure_logits)

    g_ref = jax.grad(loss_ref)(params)
    g_pp = jax.grad(loss_pp)(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(g_pp)}
    checked = 0
    for k, v in flat_ref:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(flat_pp[ks]), np.asarray(v),
                                   atol=3e-4, rtol=3e-4, err_msg=ks)
        checked += 1
    assert checked == len(flat_pp)


def test_esm3_pp_prepadded_stage_sharded_storage():
    """The real-trunk shape: an indivisible scanned-layer count (7 over 8
    stages) stored stage-sharded via pad_stack — device_put would refuse the
    unpadded axis — still matches the unpipelined forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = esm3_tiny(dtype="float32", head_type="structure", n_layers=8)
    net = ESM3(cfg)
    seq, st, lengths = _batch()
    params = jax.jit(lambda k: net.init(k, sequence_tokens=seq))(
        jax.random.PRNGKey(4))["params"]
    ref = net.apply({"params": params}, structure_tokens=st,
                    sequence_tokens=seq, lengths=lengths)

    mesh = stage_mesh()
    padded, n_valid = pp.pad_stack(params["transformer"]["blocks"], S)
    assert n_valid == 7
    assert jax.tree.leaves(padded)[0].shape[0] == 8
    params_pp = dict(params)
    params_pp["transformer"] = dict(params["transformer"])
    params_pp["transformer"]["blocks"] = jax.device_put(
        padded, pp.stage_shardings(padded, mesh))
    out = pp.esm3_pp_forward(net, params_pp, mesh, n_microbatches=2,
                             structure_tokens=st, sequence_tokens=seq,
                             lengths=lengths)
    np.testing.assert_allclose(np.asarray(out.structure_logits),
                               np.asarray(ref.structure_logits),
                               atol=2e-4, rtol=2e-4)


def test_esm3_pp_multiple_geom_blocks():
    """n_layers_geom=2: both geometric-capable blocks must run replicated
    before the pipelined stack (a hardcoded block0 would silently skip
    block1)."""
    cfg = esm3_tiny(dtype="float32", head_type="structure", n_layers=10,
                    n_layers_geom=2)
    net = ESM3(cfg)
    seq, st, lengths = _batch()
    params = jax.jit(lambda k: net.init(k, sequence_tokens=seq))(
        jax.random.PRNGKey(5))["params"]
    ref = net.apply({"params": params}, structure_tokens=st,
                    sequence_tokens=seq, lengths=lengths)
    out = pp.esm3_pp_forward(net, params, stage_mesh(), n_microbatches=2,
                             structure_tokens=st, sequence_tokens=seq,
                             lengths=lengths)
    np.testing.assert_allclose(np.asarray(out.structure_logits),
                               np.asarray(ref.structure_logits),
                               atol=2e-4, rtol=2e-4)


def test_pp_train_step_stage_sharded(tiny_trunk):
    """One jitted optimizer step with the scanned stack born stage-sharded."""
    import optax

    net, params = tiny_trunk
    mesh = stage_mesh()
    seq, st, lengths = _batch()
    labels = jnp.asarray(np.random.RandomState(3).randint(0, 4096, st.shape),
                         jnp.int32)

    # place the stacked-block leaves on the stage axis, rest replicated
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    shardings = jax.tree.map(lambda _: rep, params)
    shardings["transformer"]["blocks"] = pp.stage_shardings(
        params["transformer"]["blocks"], mesh)
    params = jax.device_put(params, shardings)

    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p):
        out = pp.esm3_pp_forward(net, p, mesh, n_microbatches=2,
                                 structure_tokens=st, sequence_tokens=seq,
                                 lengths=lengths)
        lp = jax.nn.log_softmax(out.structure_logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(lp, labels[..., None], -1))

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    with mesh:
        p1, opt_state, l0 = step(params, opt_state)
        p2, opt_state, l1 = step(p1, opt_state)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    assert float(l1) < float(l0)  # two steps on a fixed batch reduce CE
    # the stacked blocks stayed stage-sharded through the step
    leaf = jax.tree.leaves(p2["transformer"]["blocks"])[0]
    assert pp.STAGE_AXIS in str(leaf.sharding.spec)
