"""Training pipeline: dataset/bucketing, sharded train step, loop smoke run,
checkpoint save/resume."""

import numpy as np
import pytest

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.train import data as data_mod
from esmdiff_tpu.train.config import TrainConfig, load_config
from esmdiff_tpu.train.data import DataConfig


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("encodings")
    rng = np.random.RandomState(0)
    for i in range(8):
        L = rng.randint(20, 70)
        np.savez(
            root / f"chain{i}.npz",
            sequence_tokens=np.concatenate(
                [[C.SEQUENCE_BOS_TOKEN],
                 rng.randint(4, 24, L),
                 [C.SEQUENCE_EOS_TOKEN]]).astype(np.int32),
            structure_tokens=np.concatenate(
                [[C.STRUCTURE_BOS_TOKEN],
                 rng.randint(0, 4096, L),
                 [C.STRUCTURE_EOS_TOKEN]]).astype(np.int32),
        )
    return str(root)


def test_dataset_strips_bos_eos(corpus):
    cfg = DataConfig(path=corpus, max_len=512)
    ds = data_mod.EncodingDataset(cfg)
    item = ds.load(0, np.random.RandomState(0))
    assert item["structure_tokens"][0] != C.STRUCTURE_BOS_TOKEN
    assert item["structure_tokens"][-1] != C.STRUCTURE_EOS_TOKEN
    assert (item["structure_tokens"] < 4096).all()


def test_truncation(corpus):
    cfg = DataConfig(path=corpus, max_len=16)
    ds = data_mod.EncodingDataset(cfg)
    for i in range(len(ds)):
        item = ds.load(i, np.random.RandomState(i))
        assert len(item["structure_tokens"]) <= 16
        assert len(item["sequence_tokens"]) == len(item["structure_tokens"])


def test_bucketed_batches(corpus):
    cfg = DataConfig(path=corpus, batch_size=3, bucket_multiple=32)
    ds = data_mod.EncodingDataset(cfg)
    tr, va = data_mod.train_val_split(ds, cfg)
    assert len(tr.indices) + len(va.indices) == len(ds)
    assert len(va.indices) >= 1
    got = list(data_mod.batches(tr, cfg, shuffle=True, seed=0))
    assert got, "no batches"
    for b in got:
        B, L = b["structure_tokens"].shape
        assert B == 3
        assert L % 32 == 0
        # pads carry pad tokens and mask 0
        pad = b["mask"] == 0
        assert (b["structure_tokens"][pad] == C.STRUCTURE_PAD_TOKEN).all()
        assert (b["sequence_tokens"][pad] == C.SEQUENCE_PAD_TOKEN).all()


@pytest.mark.slow
def test_train_loop_smoke_and_resume(corpus, tmp_path):
    from esmdiff_tpu.train.loop import train

    cfg = load_config(None, [
        f"data.path={corpus}", "data.batch_size=2", "data.max_len=32",
        "data.bucket_multiple=16",
        "model.size=tiny", "model.dtype=float32", "model.remat=false",
        "optim.lr=1e-3",
        "trainer.max_epochs=2", "trainer.log_every_n_steps=1",
        f"trainer.ckpt_dir={tmp_path}/run",
    ])
    result = train(cfg)
    assert np.isfinite(result["best_val_loss"])
    assert result["steps"] > 0
    ckpt_dir = tmp_path / "run" / "ckpt"
    assert (ckpt_dir / "index.json").exists()

    # resume from the saved checkpoint
    import json

    best_entry = json.loads((ckpt_dir / "index.json").read_text())[0]
    cfg2 = load_config(None, [
        f"data.path={corpus}", "data.batch_size=2", "data.max_len=32",
        "data.bucket_multiple=16",
        "model.size=tiny", "model.dtype=float32", "model.remat=false",
        "trainer.max_epochs=1", "trainer.fast_dev_run=true",
        f"trainer.ckpt_dir={tmp_path}/run2",
        f"trainer.resume={best_entry['path']}",
    ])
    result2 = train(cfg2)
    # step counter restored from the best checkpoint, +1 fast-dev-run step
    assert result2["steps"] == best_entry["step"] + 1


@pytest.mark.slow
def test_overfit_mode_reduces_loss(corpus, tmp_path):
    from esmdiff_tpu.train.loop import train

    cfg = load_config(None, [
        f"data.path={corpus}", "data.batch_size=2", "data.max_len=24",
        "data.bucket_multiple=8",
        "model.size=tiny", "model.dtype=float32", "model.remat=false",
        "optim.lr=3e-3",
        "trainer.max_epochs=8", "trainer.overfit_batches=1",
        "trainer.log_every_n_steps=100",
        f"trainer.ckpt_dir={tmp_path}/overfit",
    ])
    result = train(cfg)
    # overfitting a single tiny batch must reduce loss below the ~8.3
    # random-prediction level
    assert result["best_val_loss"] < 8.0


@pytest.mark.slow
def test_train_loop_fsdp_strategy(corpus, tmp_path):
    """End-to-end train with trainer.strategy=fsdp on the 8-device mesh:
    params+moments born sharded, orbax checkpoint round-trips the sharded
    state, resume restores it."""
    import json

    from esmdiff_tpu.train.loop import train

    common = [
        f"data.path={corpus}", "data.batch_size=8", "data.max_len=24",
        "data.bucket_multiple=8",
        "model.size=tiny", "model.dtype=float32", "model.remat=false",
        "trainer.strategy=fsdp", "trainer.log_every_n_steps=1",
    ]
    cfg = load_config(None, common + [
        "trainer.max_epochs=1", f"trainer.ckpt_dir={tmp_path}/run",
    ])
    result = train(cfg)
    assert np.isfinite(result["best_val_loss"])
    ckpt_dir = tmp_path / "run" / "ckpt"
    best_entry = json.loads((ckpt_dir / "index.json").read_text())[0]

    cfg2 = load_config(None, common + [
        "trainer.max_epochs=1", "trainer.fast_dev_run=true",
        f"trainer.ckpt_dir={tmp_path}/run2",
        f"trainer.resume={best_entry['path']}",
    ])
    result2 = train(cfg2)
    assert result2["steps"] == best_entry["step"] + 1


@pytest.mark.slow
def test_train_loop_tp_strategy(corpus, tmp_path):
    """VERDICT round 2 item 6: trainer.strategy=dp2xtp4 runs through the
    production train CLI path — 2-D (data, model) mesh, Megatron-style TP
    param shardings (parallel/tp.py), ZeRO moments on data, loss parity
    with the replicated run."""
    from esmdiff_tpu.train.loop import train

    common = [
        f"data.path={corpus}", "data.batch_size=2", "data.max_len=24",
        "data.bucket_multiple=8",
        "model.size=tiny", "model.dtype=float32", "model.remat=false",
        "trainer.max_epochs=1", "trainer.log_every_n_steps=1",
    ]
    cfg = load_config(None, common + [
        "trainer.strategy=dp2xtp4", f"trainer.ckpt_dir={tmp_path}/tp",
    ])
    result = train(cfg)
    assert np.isfinite(result["best_val_loss"])

    cfg2 = load_config(None, common + [
        "trainer.strategy=ddp", f"trainer.ckpt_dir={tmp_path}/ddp",
    ])
    result2 = train(cfg2)
    # sharding is a layout, not a math change
    assert result["best_val_loss"] == pytest.approx(
        result2["best_val_loss"], rel=1e-4)


def test_parse_tp_strategy():
    from esmdiff_tpu.parallel.tp import parse_tp_strategy

    assert parse_tp_strategy("dp4xtp2") == (4, 2)
    assert parse_tp_strategy("tp8") == (1, 8)
    assert parse_tp_strategy("fsdp") is None
    assert parse_tp_strategy("dpxtp") is None


def test_config_yaml_and_overrides(tmp_path):
    y = tmp_path / "exp.yaml"
    y.write_text("task_name: test\noptim:\n  lr: 3.0e-4\n")
    cfg = load_config(str(y), ["trainer.max_epochs=7", "model.size=tiny"])
    assert cfg.task_name == "test"
    assert cfg.optim.lr == pytest.approx(3e-4)
    assert cfg.trainer.max_epochs == 7
    assert cfg.model.size == "tiny"
    with pytest.raises(KeyError):
        load_config(str(y), ["nonexistent.key=1"])


def test_train_profiler_window(corpus, tmp_path):
    """trainer.profile_steps captures a jax.profiler trace of the first N
    steps (reference configs/debug/profiler.yaml analogue)."""
    from esmdiff_tpu.train.loop import train

    cfg = load_config(None, [
        f"data.path={corpus}", "data.batch_size=2", "data.max_len=32",
        "data.bucket_multiple=16",
        "model.size=tiny", "model.dtype=float32", "model.remat=false",
        "trainer.max_epochs=1", "trainer.profile_steps=2",
        f"trainer.ckpt_dir={tmp_path}/run",
    ])
    result = train(cfg)
    assert np.isfinite(result["best_val_loss"])
    prof = tmp_path / "run" / "profile"
    traces = list(prof.rglob("*.xplane.pb")) + list(prof.rglob("*.trace*"))
    assert traces, f"no profiler artifacts under {prof}"


def test_every_shipped_config_builds_a_task():
    """Regression guard for the task_name switch: each shipped experiment
    yaml must load and resolve to a buildable task (make-smoke broke when
    mdlm_smoke.yaml carried a label, not a task, in task_name)."""
    from esmdiff_tpu.train.config import load_config
    from esmdiff_tpu.train.loop import build_task

    for cfg_file in ("configs/mdlm.yaml", "configs/mdlm_smoke.yaml",
                     "configs/clm.yaml", "configs/jlm.yaml"):
        cfg = load_config(cfg_file)
        loss_fn, init_fn = build_task(cfg, emb_dim=32)
        assert callable(loss_fn) and callable(init_fn), cfg_file
