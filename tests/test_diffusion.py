import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.diffusion import gibbs, noise as noise_mod
from esmdiff_tpu.diffusion.mdlm import (
    MDLM,
    MDLMConfig,
    logits_parameterization,
    q_xt,
    sample_t,
    shield_special_tokens,
)
from esmdiff_tpu.models.esm3 import ESM3, esm3_tiny
from esmdiff_tpu.nn.layers import TimestepEmbedder


# ---------------------------------------------------------------------------
# noise schedules
# ---------------------------------------------------------------------------

def test_loglinear_matches_closed_form():
    n = noise_mod.LogLinearNoise(eps=1e-3)
    t = jnp.linspace(0.01, 0.99, 17)
    sigma, dsigma = n(t)
    np.testing.assert_allclose(
        1 - np.exp(-np.asarray(sigma)), (1 - 1e-3) * np.asarray(t), rtol=1e-5
    )
    # dsigma is d sigma / dt (finite difference check)
    h = 1e-4
    fd = (n.total_noise(t + h) - n.total_noise(t - h)) / (2 * h)
    np.testing.assert_allclose(np.asarray(dsigma), np.asarray(fd), rtol=1e-3)


@pytest.mark.parametrize("name", ["loglinear", "cosine", "cosinesqr",
                                  "linear", "geometric"])
def test_schedules_finite_and_monotone(name):
    n = noise_mod.get_noise(name)
    t = jnp.linspace(0.0, 1.0, 33)
    sigma, dsigma = n(t)
    assert np.isfinite(np.asarray(sigma)).all()
    s = np.asarray(sigma)
    assert (np.diff(s) >= -1e-6).all(), f"{name} not monotone"


def test_mlm_corruption():
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (4, 128), 0, C.VQVAE_CODEBOOK_SIZE)
    x = x.at[:, 0].set(C.STRUCTURE_BOS_TOKEN)
    out, labels, masked = noise_mod.get_inputs_for_mlm(key, x, 0.5)
    masked = np.asarray(masked)
    assert not masked[:, 0].any()  # specials shielded
    assert (np.asarray(labels)[~masked] == -100).all()
    assert 0.2 < masked.mean() < 0.8


# ---------------------------------------------------------------------------
# mdlm primitives
# ---------------------------------------------------------------------------

def test_sample_t_antithetic_stratified():
    cfg = MDLMConfig()
    t = sample_t(jax.random.PRNGKey(0), 64, cfg, noise_mod.LogLinearNoise())
    t = np.sort(np.asarray(t))
    assert t.min() >= cfg.sampling_eps and t.max() <= 1.0
    # antithetic sampling stratifies: one sample per 1/n bucket
    gaps = np.diff(t)
    assert gaps.max() < 3.0 / 64


def test_q_xt_masking_rate():
    cfg = MDLMConfig()
    x0 = jnp.zeros((8, 256), dtype=jnp.int32)
    xt, _ = q_xt(jax.random.PRNGKey(0), x0, jnp.full((8, 1), 0.3), cfg)
    rate = np.mean(np.asarray(xt) == cfg.mask_index)
    assert 0.25 < rate < 0.35


def test_logits_parameterization():
    cfg = MDLMConfig(vocab_size=16, mask_index=10)
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (1, 4, 16))
    xt = jnp.array([[10, 3, 10, 7]], dtype=jnp.int32)
    out = np.asarray(logits_parameterization(logits, xt, cfg))
    # masked positions: proper log-probs with p(mask)=~0
    np.testing.assert_allclose(np.exp(out[0, 0]).sum(), 1.0, rtol=1e-4)
    assert out[0, 0, 10] < -1e5
    # unmasked positions: delta at xt
    assert out[0, 1, 3] == 0.0
    assert (out[0, 1, :3] < -1e5).all()


def test_shield_special_tokens():
    logits = jnp.zeros((1, 2, C.STRUCTURE_VOCAB_SIZE))
    out = np.asarray(shield_special_tokens(logits))
    assert (out[..., C.VQVAE_CODEBOOK_SIZE:] < -1e5).all()
    assert (out[..., :C.VQVAE_CODEBOOK_SIZE] == 0).all()


# ---------------------------------------------------------------------------
# end-to-end on the tiny trunk
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_mdlm():
    cfg = esm3_tiny(dtype="float32", head_type="structure",
                    n_structure_heads=C.STRUCTURE_VOCAB_SIZE)
    net = ESM3(cfg)
    se = TimestepEmbedder(hidden_size=cfg.d_model, dtype=jnp.float32)
    model = MDLM(net, se)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_mdlm_loss_finite(tiny_mdlm):
    model, params = tiny_mdlm
    B, L = 2, 12
    key = jax.random.PRNGKey(1)
    batch = {
        "structure_tokens": jax.random.randint(key, (B, L), 0, 4096),
        "sequence_tokens": jnp.full((B, L), 5, dtype=jnp.int32),
        "mask": jnp.ones((B, L), dtype=jnp.float32),
    }
    loss, bd = jax.jit(model.loss)(params, batch, key)
    assert np.isfinite(float(loss))
    assert float(loss) > 0
    assert "nelbo" in bd


def test_ddpm_sample_fills_all_masks(tiny_mdlm):
    model, params = tiny_mdlm
    B, L = 2, 12
    seq = jnp.full((B, L), 5, dtype=jnp.int32)
    seq = seq.at[:, 0].set(C.SEQUENCE_BOS_TOKEN).at[:, -1].set(
        C.SEQUENCE_EOS_TOKEN)
    sample = jax.jit(
        lambda p, k: model.ddpm_sample(p, k, seq, num_steps=8)
    )(params, jax.random.PRNGKey(2))
    s = np.asarray(sample)
    assert s.shape == (B, L)
    assert (s != C.STRUCTURE_MASK_TOKEN).all()
    # specials shielded: interior positions are codebook tokens
    assert (s[:, 1:-1] < C.VQVAE_CODEBOOK_SIZE).all()


def test_ddpm_inpainting_keeps_fixed_tokens(tiny_mdlm):
    model, params = tiny_mdlm
    B, L = 1, 12
    seq = jnp.full((B, L), 5, dtype=jnp.int32)
    prior = jnp.full((B, L), 77, dtype=jnp.int32)
    prior = prior.at[:, 3:6].set(C.STRUCTURE_MASK_TOKEN)
    out = jax.jit(
        lambda p, k: model.ddpm_sample(p, k, seq, num_steps=6,
                                       input_prior=prior)
    )(params, jax.random.PRNGKey(3))
    s = np.asarray(out)
    # unmasked tokens carried over untouched
    assert (s[0, :3] == 77).all() and (s[0, 6:] == 77).all()
    assert (s[0, 3:6] != C.STRUCTURE_MASK_TOKEN).all()


def test_ddpm_samples_vary(tiny_mdlm):
    model, params = tiny_mdlm
    B, L = 4, 12
    seq = jnp.full((B, L), 5, dtype=jnp.int32)
    out = jax.jit(
        lambda p, k: model.ddpm_sample(p, k, seq, num_steps=8)
    )(params, jax.random.PRNGKey(4))
    s = np.asarray(out)
    assert len({tuple(row) for row in s}) > 1  # stochastic across batch


# ---------------------------------------------------------------------------
# gibbs / iterative unmasking
# ---------------------------------------------------------------------------

def test_top_p_filter():
    logits = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(gibbs.top_p_filter(logits, 0.8))
    assert out[0, 0] > -1e8 and out[0, 1] > -1e8
    assert out[0, 3] < -1e8


def test_select_top_by_confidence():
    conf = jnp.asarray([[0.9, 0.1, 0.5, 0.7, 0.3],
                        [0.2, 0.8, 0.4, 0.6, 0.05]])
    eligible = jnp.ones((2, 5), bool).at[0, 0].set(False)
    n_new = jnp.asarray([2, 0])
    commit = np.asarray(gibbs.select_top_by_confidence(conf, eligible, n_new))
    # row 0: top-2 eligible are 0.7 (idx 3) and 0.5 (idx 2); 0.9 ineligible
    assert commit[0].tolist() == [False, False, True, True, False]
    # row 1: quota 0 -> nothing
    assert not commit[1].any()


def test_cosine_schedule_reaches_one():
    sched = np.asarray(gibbs.cosine_unmask_schedule(16))
    assert sched[-1] == pytest.approx(1.0)
    assert (np.diff(sched) > 0).all()


def test_iterative_unmask_commits_everything(tiny_mdlm):
    model, params = tiny_mdlm
    B, L = 2, 12
    seq = jnp.full((B, L), 5, dtype=jnp.int32)
    seq = seq.at[:, 0].set(C.SEQUENCE_BOS_TOKEN).at[:, -1].set(
        C.SEQUENCE_EOS_TOKEN)
    init = jnp.full((B, L), C.STRUCTURE_MASK_TOKEN, dtype=jnp.int32)
    decode_mask = jnp.ones((B, L), dtype=bool)
    decode_mask = decode_mask.at[:, 0].set(False).at[:, -1].set(False)

    def fwd(tokens):
        logits, _ = model.forward_logits(
            params, tokens, seq, sigma=None, shield_specials=True)
        return logits

    out = jax.jit(
        lambda k: gibbs.iterative_unmask_sample(
            fwd, k, init, decode_mask, num_steps=4, temperature=1.4,
            top_p=0.9)
    )(jax.random.PRNGKey(0))
    s = np.asarray(out)
    assert (s[:, 1:-1] != C.STRUCTURE_MASK_TOKEN).all()
    assert (s[:, 1:-1] < C.VQVAE_CODEBOOK_SIZE).all()
    # non-decode positions untouched
    assert (s[:, 0] == C.STRUCTURE_MASK_TOKEN).all()


def test_ddpm_two_stage_update_equivalence():
    """The scan's two-stage update (stay-masked w.p. mc_s/mc_t, else
    Gumbel-max over raw logits) must match the reference's direct
    categorical over q_xs = p(x0)*(mc_t-mc_s) with mass mc_s on MASK
    (model.py:602-604) in distribution."""
    V, mask_index = 8, 7
    rng = np.random.RandomState(0)
    z = rng.randn(V).astype(np.float32) * 2.0
    z[mask_index] = -1e9
    mc_t, mc_s = 0.7, 0.3
    p = np.exp(z - z.max())
    p /= p.sum()

    N = 40000
    # reference formula: gumbel-max over unnormalized q_xs
    q_xs = p * (mc_t - mc_s)
    q_xs[mask_index] = mc_s
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(42), 3)
    gn = 1e-10 - jnp.log(jax.random.uniform(k1, (N, V)) + 1e-10)
    ref_draw = np.asarray(jnp.argmax(jnp.asarray(q_xs)[None] / gn, axis=-1))

    # two-stage: Gumbel-max over z, then stay-masked w.p. mc_s/mc_t
    g = jax.random.gumbel(k2, (N, V), jnp.float32)
    tok = np.asarray(jnp.argmax(jnp.asarray(z)[None] + g, axis=-1))
    stay = np.asarray(jax.random.uniform(k3, (N,))) * mc_t < mc_s
    new_draw = np.where(stay, mask_index, tok)

    ref_freq = np.bincount(ref_draw, minlength=V) / N
    new_freq = np.bincount(new_draw, minlength=V) / N
    tv = 0.5 * np.abs(ref_freq - new_freq).sum()
    assert tv < 0.02, (tv, ref_freq, new_freq)
    # exact expected distribution as a sanity anchor
    expect = q_xs / q_xs.sum()
    assert 0.5 * np.abs(new_freq - expect).sum() < 0.02
