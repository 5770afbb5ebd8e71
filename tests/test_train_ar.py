"""CLM/JLM training-harness smoke tests: the full reference story
dump -> train -> sample_ar -> analyze per AR head
(reference slm/models/model.py:247-313, configs/experiment/{clm,jlm}.yaml,
slm/sample_hf.py)."""

import shutil
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute compile-heavy module

from esmdiff_tpu.utils.fixtures import bpti_pdb
BPTI = str(bpti_pdb())


@pytest.fixture(scope="module")
def dumped(tmp_path_factory):
    """cli/dump.py --with_embeddings over a 3-chain corpus (tiny runtime)."""
    pdb_dir = tmp_path_factory.mktemp("pdbs")
    for name in ("bpti_a", "bpti_b", "bpti_c"):
        shutil.copy(BPTI, pdb_dir / f"{name}.pdb")
    enc_dir = tmp_path_factory.mktemp("encodings")
    from esmdiff_tpu.cli.dump import main as dump_main

    dump_main([str(pdb_dir), str(enc_dir), "--with_embeddings",
               "--model_scale", "tiny"])
    files = sorted(enc_dir.glob("*.npz"))
    assert len(files) == 3
    with np.load(files[0]) as z:
        assert "embeddings" in z.files
    return enc_dir


def _train(task: str, dumped, tmp_path, extra=()):
    from esmdiff_tpu.train.config import load_config
    from esmdiff_tpu.train.loop import train

    cfg = load_config(None, [
        f"task_name={task}",
        f"data.path={dumped}", "data.batch_size=2", "data.max_len=32",
        "data.bucket_multiple=16",
        "optim.lr=1e-3",
        "trainer.max_epochs=2", "trainer.log_every_n_steps=1",
        f"trainer.ckpt_dir={tmp_path}/{task}_run",
        *extra,
    ])
    result = train(cfg)
    assert np.isfinite(result["best_val_loss"])
    assert result["steps"] > 0
    import json

    index = json.loads(
        (Path(result["ckpt_dir"]) / "index.json").read_text())
    return cfg, index[0]["path"]


def _tiny_runtime():
    from esmdiff_tpu.api.protein_api import ESM3Runtime
    from esmdiff_tpu.models.esm3 import esm3_tiny
    from esmdiff_tpu.models.vqvae import DecoderConfig, EncoderConfig

    return ESM3Runtime.random_init(
        seed=0, trunk_cfg=esm3_tiny(dtype="float32"),
        encoder_cfg=EncoderConfig(d_model=64, n_heads=2, v_heads=8,
                                  n_layers=2, d_out=16, knn=8),
        decoder_cfg=DecoderConfig(d_model=64, n_heads=2, n_layers=2,
                                  dtype="float32", scan_layers=False),
        with_sigma_embedder=False)


def _sample_and_analyze(task, cfg, ckpt_path, dumped, tmp_path):
    import jax.numpy as jnp

    from esmdiff_tpu.api.ar_generation import clm_generate, jlm_generate
    from esmdiff_tpu.api.generation import decode_tokens_to_proteins
    from esmdiff_tpu.convert.checkpoints import load_ar_params
    from esmdiff_tpu.core import protein as protein_io
    from esmdiff_tpu.eval.analysis import ped_evaluation
    from esmdiff_tpu.train.loop import build_clm, build_jlm

    model = build_clm(cfg) if task == "clm" else build_jlm(cfg)
    params = load_ar_params(ckpt_path, None)

    with np.load(sorted(Path(dumped).glob("*.npz"))[0]) as z:
        emb = z["embeddings"].astype(np.float32)
        seq_tokens = z["sequence_tokens"]
    L = emb.shape[0]  # with BOS/EOS
    B = 2
    emb_b = jnp.asarray(np.tile(emb[None], (B, 1, 1)))
    import jax

    key = jax.random.PRNGKey(0)
    gen = clm_generate if task == "clm" else jlm_generate
    tokens = np.asarray(gen(model, params, emb_b, L, 1.0, 0.95, key=key))
    assert tokens.shape == (B, L)
    interior = tokens[:, 1:-1]
    assert (interior < 4096).all(), "specials must be shielded"

    # decode + analyze (PED/IDP metric suite on the written ensemble)
    runtime = _tiny_runtime()
    from esmdiff_tpu.core.tokenizer import SequenceTokenizer

    seq = SequenceTokenizer().decode(seq_tokens[1:-1])
    prots = decode_tokens_to_proteins(runtime, seq, interior)
    ens = tmp_path / f"{task}_ens.pdb"
    protein_io.ensemble_to_pdb_file([p.to_protein() for p in prots], ens)
    res = ped_evaluation({task: ens}, [BPTI])
    assert np.isfinite(res["mae_rg"][0])


def test_clm_dump_train_sample_analyze(dumped, tmp_path):
    cfg, ckpt = _train("clm", dumped, tmp_path, extra=[
        "model.clm.d_model=32", "model.clm.d_ff=64",
        "model.clm.n_layers=2", "model.clm.n_heads=4",
        "model.clm.dtype=float32",
    ])
    _sample_and_analyze("clm", cfg, ckpt, dumped, tmp_path)


def test_jlm_dump_train_sample_analyze(dumped, tmp_path):
    cfg, ckpt = _train("jlm", dumped, tmp_path, extra=[
        "model.jlm.n_embd=32", "model.jlm.n_layers=2",
        "model.jlm.n_heads=4", "model.jlm.struct_embed_dim=16",
        "model.jlm.n_positions=256", "model.jlm.dtype=float32",
    ])
    _sample_and_analyze("jlm", cfg, ckpt, dumped, tmp_path)


def test_sample_ar_cli_predict_config(tmp_path):
    """`esmdiff-sample-ar --config <predict.yaml>` (reference predict.yaml
    root): inference block drives input/output/batch/n_samples; explicit
    CLI flags still win (--model_scale here)."""
    import yaml

    from esmdiff_tpu.cli.sample_ar import main as ar_main

    pdb_dir = tmp_path / "targets"
    pdb_dir.mkdir()
    shutil.copy(BPTI, pdb_dir / "bpti.pdb")
    out = tmp_path / "out"
    cfg_path = tmp_path / "predict.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "task_name": "predict", "model_type": "jlm",
        "inference": {"input": str(pdb_dir), "output": str(out),
                      "batch_size": 2, "n_samples": 2,
                      "temperature": 1.0, "top_p": 0.9}}))
    ar_main(["--config", str(cfg_path), "--model_scale", "tiny"])
    merged = out / "bpti.pdb"
    assert merged.exists()
    assert merged.read_text().count("MODEL") >= 2  # n_samples from the yaml


def test_sample_ar_cli_quant_int8(tmp_path):
    """`esmdiff-sample-ar --quant int8` runs the W8A8 AR decode path
    end-to-end (tiny scale) and writes a valid ensemble."""
    from esmdiff_tpu.cli.sample_ar import main as ar_main

    pdb_dir = tmp_path / "targets"
    pdb_dir.mkdir()
    shutil.copy(BPTI, pdb_dir / "bpti.pdb")
    out = tmp_path / "out"
    ar_main(["--input", str(pdb_dir), "--output", str(out),
             "--model_type", "clm", "--model_scale", "tiny",
             "--n_samples", "2", "--batch_size", "2", "--quant", "int8"])
    merged = out / "bpti.pdb"
    assert merged.exists()
    assert merged.read_text().count("MODEL") >= 2


def test_clm_requires_embeddings(tmp_path):
    """A corpus without embeddings must fail loudly for AR tasks."""
    from esmdiff_tpu.core import constants as C

    root = tmp_path / "enc"
    root.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        np.savez(root / f"c{i}.npz",
                 sequence_tokens=rng.randint(4, 24, 12).astype(np.int32),
                 structure_tokens=rng.randint(0, 4096, 12).astype(np.int32))
    from esmdiff_tpu.train.config import load_config
    from esmdiff_tpu.train.loop import train

    cfg = load_config(None, [
        "task_name=clm", f"data.path={root}",
        f"trainer.ckpt_dir={tmp_path}/run",
    ])
    with pytest.raises(ValueError, match="needs embeddings"):
        train(cfg)
