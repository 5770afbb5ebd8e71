"""Joint VQ-VAE training (train/vqvae.py): straight-through learning works,
and the exported standard-layout checkpoint reproduces the training-time
function through the ordinary standalone encoder/decoder modules.

The reference freezes a pretrained tokenizer (slm/models/utils.py:16-19);
this trainer is the capability that replaces those absent weights, so the
tests pin (a) optimization actually reduces reconstruction loss through the
quantization bottleneck, (b) export parity, (c) dead-code restart mechanics.
"""

import json
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from esmdiff_tpu.convert.checkpoints import load_vqvae
from esmdiff_tpu.models.vqvae import (
    DecoderConfig,
    EncoderConfig,
    StructureTokenDecoder,
    StructureTokenEncoder,
)
from esmdiff_tpu.train.vqvae import (
    VQVAE,
    export_vqvae,
    materialize_decoder_params,
    restart_dead_codes,
    train_vqvae,
)

pytestmark = pytest.mark.slow  # compile-heavy module


ENC_CFG = EncoderConfig(d_model=32, n_heads=2, v_heads=4, n_layers=2,
                        d_out=8, n_codes=64, knn=8)
DEC_CFG = DecoderConfig(d_model=32, n_heads=2, n_layers=2, dtype="float32",
                        scan_layers=False, predict_ptm=False)


def _toy_corpus(n=16, lp=24, seed=0):
    rs = np.random.RandomState(seed)
    t = np.arange(lp)

    def chain(phase):
        ca = np.stack([2.3 * np.cos(0.6 * t + phase),
                       2.3 * np.sin(0.6 * t + phase), 1.5 * t], -1)
        return np.stack([ca + np.array([1.2, 0.3, -0.4]), ca,
                         ca + np.array([-0.8, 1.0, 0.5])], 1)

    coords = np.stack([chain(rs.rand() * 6) + rs.randn(lp, 3, 3) * 0.1
                       for _ in range(n)]).astype(np.float32)
    lengths = np.full((n,), lp, np.int32)
    if n > 3:
        lengths[3] = 18
        coords[3, 18:] = np.nan  # ragged chain exercises the mask plumbing
    return coords, lengths


@pytest.fixture(scope="module")
def trained():
    coords, lengths = _toy_corpus()
    res = train_vqvae(ENC_CFG, DEC_CFG, coords, lengths, steps=30, batch=8,
                      lr=1e-3, restart_every=10, log_every=1000, log=None)
    return coords, lengths, res


def test_loss_decreases_through_quantization(trained):
    _, _, res = trained
    # straight-through gradient must reach the encoder: >70% loss reduction
    assert res.losses[-1] < 0.3 * res.losses[0]
    assert res.n_live_codes >= 1


def test_export_matches_training_forward(trained):
    coords, lengths, res = trained
    vq = VQVAE(ENC_CFG, DEC_CFG)
    out_tr, aux = vq.apply({"params": res.params}, jnp.asarray(coords[:2]),
                           jnp.asarray(lengths[:2]))

    # standalone encoder assigns the same codes
    toks, _, valid = StructureTokenEncoder(ENC_CFG).apply(
        {"params": res.params["encoder"]}, jnp.asarray(coords[:2]))
    np.testing.assert_array_equal(
        np.asarray(jnp.where(valid, toks, 0)),
        np.asarray(jnp.where(aux["valid"], aux["tokens"], 0)))

    # standalone decoder on the materialized embed table reproduces the
    # training-time forward (only batch-shape matmul reassociation apart)
    out_sa = StructureTokenDecoder(DEC_CFG).apply(
        {"params": materialize_decoder_params(res.params)},
        aux["full_tokens"], compute_ptm=False)
    np.testing.assert_allclose(
        np.asarray(out_tr["bb_pred"], np.float32),
        np.asarray(out_sa["bb_pred"], np.float32), atol=1e-4)


def test_export_roundtrips_standard_checkpoint(trained):
    coords, lengths, res = trained
    vq = VQVAE(ENC_CFG, DEC_CFG)
    _, aux = vq.apply({"params": res.params}, jnp.asarray(coords[:2]),
                      jnp.asarray(lengths[:2]))
    out_sa = StructureTokenDecoder(DEC_CFG).apply(
        {"params": materialize_decoder_params(res.params)},
        aux["full_tokens"], compute_ptm=False)
    with tempfile.TemporaryDirectory() as td:
        export_vqvae(td, ENC_CFG, DEC_CFG, res.params)
        e_cfg, e_p, d_cfg, d_p = load_vqvae(td)
        assert e_cfg == ENC_CFG and d_cfg == DEC_CFG
        out_rt = StructureTokenDecoder(d_cfg).apply(
            {"params": d_p}, aux["full_tokens"], compute_ptm=False)
        np.testing.assert_array_equal(np.asarray(out_sa["bb_pred"]),
                                      np.asarray(out_rt["bb_pred"]))
        toks_rt, _, _ = StructureTokenEncoder(e_cfg).apply(
            {"params": e_p}, jnp.asarray(coords[:2]))
        toks, _, _ = StructureTokenEncoder(ENC_CFG).apply(
            {"params": res.params["encoder"]}, jnp.asarray(coords[:2]))
        np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks_rt))


def test_data_parallel_matches_single_device(trained):
    """data_parallel=True (8-device virtual mesh, batch sharded on a
    1-D data axis) follows the single-device loss trajectory — same
    batches, gradients all-reduced by XLA from the sharding annotations."""
    coords, lengths = _toy_corpus()
    kw = dict(steps=6, batch=8, lr=1e-3, restart_every=0, log=None)
    single = train_vqvae(ENC_CFG, DEC_CFG, coords, lengths, **kw)
    dp = train_vqvae(ENC_CFG, DEC_CFG, coords, lengths,
                     data_parallel=True, **kw)
    np.testing.assert_allclose(np.asarray(dp.losses),
                               np.asarray(single.losses), rtol=2e-4)


def test_cli_trains_and_sampler_loads(tmp_path):
    """esmdiff-train-vqvae over a corpus dir -> ckpt consumable by the
    production sampling CLI via --vqvae_ckpt."""
    from esmdiff_tpu.cli.sample import main as sample_main
    from esmdiff_tpu.cli.train_vqvae import main as train_main
    from esmdiff_tpu.core import protein as protein_io

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    coords, lengths = _toy_corpus(n=3, lp=20)
    for i in range(3):
        L = int(lengths[i])
        prot = protein_io.from_backbone(coords[i, :L], "A" * L)
        (corpus / f"c{i}.pdb").write_text(protein_io.to_pdb(prot))
    ckpt = tmp_path / "vq"
    train_main(["--input", str(corpus), "--output", str(ckpt),
                "--scale", "tiny", "--steps", "4", "--batch", "2",
                "--max_len", "64"])
    assert (ckpt / "train_summary.json").exists()
    out = tmp_path / "out"
    sample_main(["--input", str(corpus), "--output", str(out),
                 "--mode", "ddpm", "--num_steps", "2", "--num_samples", "1",
                 "--model_scale", "tiny", "--vqvae_ckpt", str(ckpt)])
    assert (out / "c0.pdb").exists()


def test_cli_multi_input_same_basename_no_collision(tmp_path):
    """Two --input dirs sharing a basename (runA/targets, runB/targets) must
    not collide into one output subdir: each gets a parent-qualified subdir
    (`runA--targets/`, `runB--targets/`) derived from its resolved path —
    NOT encounter order, so a --skip_existing resume with the dirs reordered
    maps every dir to the same subdir (round-4 advisor; cli/sample.py)."""
    from esmdiff_tpu.cli.sample import main as sample_main
    from esmdiff_tpu.core import protein as protein_io

    coords, lengths = _toy_corpus(n=2, lp=20)
    dirs = []
    for run in ("runA", "runB"):
        d = tmp_path / run / "targets"
        d.mkdir(parents=True)
        L = int(lengths[0])
        prot = protein_io.from_backbone(coords[0, :L], "A" * L)
        (d / "c0.pdb").write_text(protein_io.to_pdb(prot))  # same stem
        dirs.append(d)
    out = tmp_path / "out"
    sample_main(["--input", str(dirs[0]), str(dirs[1]), "--output", str(out),
                 "--mode", "ddpm", "--num_steps", "2", "--num_samples", "1",
                 "--model_scale", "tiny"])
    assert (out / "runA--targets" / "c0.pdb").exists()
    assert (out / "runB--targets" / "c0.pdb").exists()
    report = json.loads((out / "timings.json").read_text())
    keys = {r["key"] for r in report}
    assert keys == {"runA--targets/c0", "runB--targets/c0"}
    # order-independence: reversed --input order maps to the SAME subdirs
    out2 = tmp_path / "out2"
    sample_main(["--input", str(dirs[1]), str(dirs[0]), "--output",
                 str(out2), "--mode", "ddpm", "--num_steps", "2",
                 "--num_samples", "1", "--model_scale", "tiny"])
    assert (out2 / "runA--targets" / "c0.pdb").exists()
    assert (out2 / "runB--targets" / "c0.pdb").exists()


def test_restart_dead_codes():
    rs = np.random.RandomState(0)
    params = {"encoder": {"codebook": jnp.asarray(
        rs.randn(8, 4).astype(np.float32))}}
    usage = np.array([5, 0, 3, 0, 0, 1, 2, 9])
    pool = rs.randn(32, 4).astype(np.float32)
    new, n = restart_dead_codes(params, usage, pool, rs)
    assert n == 3
    old_cb = np.asarray(params["encoder"]["codebook"])
    new_cb = np.asarray(new["encoder"]["codebook"])
    live = usage > 0
    np.testing.assert_array_equal(new_cb[live], old_cb[live])
    assert not np.allclose(new_cb[~live], old_cb[~live])
    # dead rows land near pool members
    for row in new_cb[~live]:
        assert np.min(np.linalg.norm(pool - row, axis=1)) < 0.5


def test_restart_noop_when_all_live():
    rs = np.random.RandomState(0)
    params = {"codebook": jnp.asarray(rs.randn(4, 2).astype(np.float32))}
    new, n = restart_dead_codes(params, np.array([1, 2, 3, 4]),
                                rs.randn(8, 2).astype(np.float32), rs)
    assert n == 0 and new is params


def test_augment_batch_invariants():
    """Crops preserve static shapes and shrink lens consistently with the
    NaN mask; rotation preserves pairwise CA distances; jitter perturbs."""
    from esmdiff_tpu.train.vqvae import VQAugmentConfig, augment_batch

    coords, lengths = _toy_corpus(n=8, lp=24, seed=1)
    rs = np.random.RandomState(0)
    aug = VQAugmentConfig(crop=1.0, crop_min=8, jitter=0.0, rotate=False)
    c2, l2 = augment_batch(coords, lengths, aug, rs)
    assert c2.shape == coords.shape and l2.shape == lengths.shape
    assert (l2 <= lengths).all() and (l2 >= 8).all()
    for i in range(8):
        finite = np.isfinite(c2[i]).all(-1).all(-1)
        assert finite[:l2[i]].all() and not finite[l2[i]:].any()

    aug_rot = VQAugmentConfig(crop=0.0, jitter=0.0, rotate=True)
    c3, l3 = augment_batch(coords, lengths, aug_rot, np.random.RandomState(2))
    np.testing.assert_array_equal(l3, lengths)
    i, L = 0, int(lengths[0])
    d_orig = np.linalg.norm(
        coords[i, :L, 1, None] - coords[i, None, :L, 1], axis=-1)
    d_rot = np.linalg.norm(
        c3[i, :L, 1, None] - c3[i, None, :L, 1], axis=-1)
    np.testing.assert_allclose(d_rot, d_orig, atol=1e-3)
    assert not np.allclose(c3[i, :L], coords[i, :L])  # actually rotated

    aug_j = VQAugmentConfig(crop=0.0, jitter=0.1, rotate=False)
    c4, _ = augment_batch(coords, lengths, aug_j, np.random.RandomState(3))
    delta = c4[0, :L] - coords[0, :L]
    assert 0.01 < np.abs(delta).mean() < 0.5


def test_train_vqvae_with_augmentation_runs():
    from esmdiff_tpu.train.vqvae import VQAugmentConfig

    coords, lengths = _toy_corpus(n=12, lp=24, seed=2)
    res = train_vqvae(
        ENC_CFG, DEC_CFG, coords, lengths, steps=8, batch=4, lr=1e-3,
        restart_every=0, log_every=1000, log=None,
        val_idx=np.asarray([0, 1]),
        augment=VQAugmentConfig(crop=0.8, crop_min=8, jitter=0.05))
    assert np.isfinite(res.losses).all()


def test_cli_multi_input_sweep_resumes(tmp_path):
    """Multi --input dirs: one process sweeps several family dirs (outputs
    land in <output>/<family>/), and a resumed --skip_existing run MERGES
    timings.json instead of overwriting it (round-4 full_eval path)."""
    import json

    from esmdiff_tpu.cli.sample import main as sample_main
    from esmdiff_tpu.core import protein as protein_io

    fams = []
    for fam, n in (("famA", 2), ("famB", 1)):
        d = tmp_path / fam
        d.mkdir()
        coords, lengths = _toy_corpus(n=2, lp=20)
        for i in range(n):
            L = int(lengths[i])
            prot = protein_io.from_backbone(coords[i, :L], "A" * L)
            (d / f"{fam}_t{i}.pdb").write_text(protein_io.to_pdb(prot))
        fams.append(d)
    out = tmp_path / "out"
    args = ["--input", str(fams[0]), str(fams[1]), "--output", str(out),
            "--mode", "ddpm", "--num_steps", "2", "--num_samples", "1",
            "--model_scale", "tiny", "--skip_existing"]
    sample_main(args)
    assert (out / "famA" / "famA_t0.pdb").exists()
    assert (out / "famB" / "famB_t0.pdb").exists()
    rows = json.loads((out / "timings.json").read_text())
    assert sorted(r["key"] for r in rows) == [
        "famA/famA_t0", "famA/famA_t1", "famB/famB_t0"]

    # drop one output + the report rows for the others; the resumed run
    # samples only the missing target and merges the prior rows back in
    (out / "famB" / "famB_t0.pdb").unlink()
    (out / "timings.json").write_text(json.dumps(
        [r for r in rows if r["key"] != "famB/famB_t0"]))
    sample_main(args)
    rows2 = json.loads((out / "timings.json").read_text())
    assert sorted(r["key"] for r in rows2) == [
        "famA/famA_t0", "famA/famA_t1", "famB/famB_t0"]
