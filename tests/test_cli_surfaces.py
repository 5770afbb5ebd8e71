"""CLI surface tests: analyze subcommands, sweep sampling, plots, logging."""

import json
from pathlib import Path

import numpy as np
import pytest

from esmdiff_tpu.core import protein

from esmdiff_tpu.utils.fixtures import bpti_pdb
BPTI = str(bpti_pdb())


@pytest.fixture(scope="module")
def ensembles(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_ens")
    prot = protein.from_pdb_file(BPTI)
    if isinstance(prot, list):
        prot = prot[0]

    def make(path, scale, n, seed):
        rr = np.random.RandomState(seed)
        bb = prot.backbone_coords()
        prots = [protein.from_backbone(bb + rr.randn(*bb.shape) * scale,
                                       sequence=prot.sequence)
                 for _ in range(n)]
        protein.ensemble_to_pdb_file(prots, path)

    make(root / "target.pdb", 0.4, 20, 1)
    make(root / "pred.pdb", 0.4, 10, 2)
    return root


def test_analyze_cli_bpti(ensembles, tmp_path, capsys):
    from esmdiff_tpu.cli.analyze import main

    clusters = tmp_path / "clusters"
    clusters.mkdir()
    import shutil

    shutil.copy(BPTI, clusters / "bpti_1.pdb")
    main(["bpti", "--preds", str(ensembles / "pred.pdb"),
          "--target", str(ensembles / "target.pdb"),
          "--clusters", str(clusters), "--lagtime", "2",
          "--output", str(tmp_path / "out"), "--plot"])
    out = capsys.readouterr().out
    assert "js_pwd" in out and "TM-ens" in out
    assert (tmp_path / "out" / "js_metrics.csv").exists()
    assert (tmp_path / "out" / "tica2d_all.png").exists()
    assert (tmp_path / "out" / "bpti_tm_rmsd_div.json").exists()


def test_analyze_cli_ped(ensembles, tmp_path, capsys):
    from esmdiff_tpu.cli.analyze import main

    main(["ped", "--preds", str(ensembles / "pred.pdb"),
          "--targets", str(ensembles.parent / ensembles.name),
          "--output", str(tmp_path / "ped_out")])
    results = json.loads(
        (tmp_path / "ped_out" / "ped_metrics.json").read_text())
    assert "mae_pwd" in results


def test_sweep_sampling():
    import random

    from esmdiff_tpu.cli.sweep import sample_value

    rng = random.Random(0)
    v = sample_value(rng, {"type": "loguniform", "low": 1e-5, "high": 1e-3})
    assert 1e-5 <= v <= 1e-3
    v = sample_value(rng, {"type": "choice", "values": [8, 16]})
    assert v in (8, 16)
    v = sample_value(rng, {"type": "int", "low": 2, "high": 5})
    assert 2 <= v <= 5
    v = sample_value(rng, {"type": "uniform", "low": 0.0, "high": 1.0})
    assert 0.0 <= v <= 1.0
    with pytest.raises(ValueError):
        sample_value(rng, {"type": "nope"})


def test_sweep_main_survives_member_failure(tmp_path, monkeypatch):
    """The sweep harness must survive failing trials (reference task_wrapper
    semantics, slm/utils/utils.py:65-93) and still report the best of the
    survivors."""
    import yaml

    from esmdiff_tpu.cli import sweep
    from esmdiff_tpu.train import loop as train_loop

    calls = {"n": 0}

    def fake_train(cfg):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom (injected trial failure)")
        return {"best_val_loss": 1.0 + calls["n"] * 0.1, "steps": 3,
                "wall_s": 0.0, "ckpt_dir": str(tmp_path)}

    monkeypatch.setattr(train_loop, "train", fake_train)
    space = tmp_path / "space.yaml"
    space.write_text(yaml.safe_dump(
        {"space": {"optim.lr": {"type": "loguniform",
                                "low": 1e-6, "high": 1e-4}}}))
    out = tmp_path / "sweep_out"
    sweep.main(["--config", "configs/mdlm_smoke.yaml",
                "--space", str(space), "--n_trials", "3",
                "--output", str(out), "data.path=/nonexistent-unused"])
    results = json.loads((out / "results.json").read_text())
    assert len(results) == 3
    assert results[0]["val_loss"] is None and "boom" in results[0]["error"]
    best = json.loads((out / "best.json").read_text())
    assert best["trial"] == 1  # lowest val_loss among the survivors
    # every trial got a distinct sampled lr within the space
    lrs = [r["params"]["optim.lr"] for r in results]
    assert len(set(lrs)) == 3 and all(1e-6 <= v <= 1e-4 for v in lrs)


def test_sweep_successive_halving_stops_bad_trials(tmp_path, monkeypatch):
    """--search sha: all trials run at rung 0 on the small budget; only the
    top 1/eta are promoted and resumed, so bad configurations never consume
    a full budget (role-parity with the reference's Optuna pruning,
    configs/hparams_search/optuna.yaml:16-40)."""
    import yaml

    from esmdiff_tpu.cli import sweep
    from esmdiff_tpu.train import loop as train_loop

    seen = []

    def fake_train(cfg):
        # quality determined by lr distance from 1e-5; resumed runs improve
        lr = cfg.optim.lr
        resumed = bool(cfg.trainer.resume)
        seen.append({"lr": lr, "epochs": cfg.trainer.max_epochs,
                     "resumed": resumed})
        import math as m

        # resumed rungs improve in proportion to their extra budget
        loss = abs(m.log10(lr) - m.log10(1e-5)) \
            - (0.2 * cfg.trainer.max_epochs if resumed else 0.0)
        # emulate a checkpoint index so promotion can resume
        ck = Path(cfg.trainer.ckpt_dir) / "ckpt"
        ck.mkdir(parents=True, exist_ok=True)
        (ck / "index.json").write_text(json.dumps(
            [{"path": str(ck / "best"), "val_loss": loss}]))
        return {"best_val_loss": loss, "steps": cfg.trainer.max_epochs,
                "wall_s": 0.0, "ckpt_dir": cfg.trainer.ckpt_dir}

    monkeypatch.setattr(train_loop, "train", fake_train)
    space = tmp_path / "space.yaml"
    space.write_text(yaml.safe_dump(
        {"space": {"optim.lr": {"type": "loguniform",
                                "low": 1e-7, "high": 1e-2}}}))
    out = tmp_path / "sha_out"
    sweep.main(["--config", "configs/mdlm_smoke.yaml",
                "--space", str(space), "--n_trials", "4", "--search", "sha",
                "--eta", "2", "--min_epochs", "1", "--max_epochs", "4",
                "--output", str(out), "data.path=/nonexistent-unused"])
    results = json.loads((out / "results.json").read_text())
    by_rung = {}
    for r in results:
        by_rung.setdefault(r["rung"], []).append(r)
    # rung 0 ran all 4; rung 1 promoted 2; rung 2 promoted 1
    assert len(by_rung[0]) == 4
    assert len(by_rung[1]) == 2
    assert len(by_rung[2]) == 1
    # promoted runs resumed from a checkpoint
    assert sum(1 for s in seen if s["resumed"]) == 3
    # the rung-1+ survivors were the rung-0 best
    r0_sorted = sorted(by_rung[0], key=lambda r: r["val_loss"])
    promoted_trials = {r["trial"] for r in by_rung[1]}
    assert promoted_trials == {r["trial"] for r in r0_sorted[:2]}
    best = json.loads((out / "best.json").read_text())
    assert best["rung"] == 2


def test_plots_render(tmp_path):
    from esmdiff_tpu.eval import plots

    rng = np.random.RandomState(0)
    plots.scatterplot_2d(
        {"target": rng.randn(50, 2), "pred": rng.randn(30, 2)},
        tmp_path / "tica.png")
    plots.scatterplot_apo(rng.rand(10), rng.rand(10), tmp_path / "apo.png",
                          regplot=True)
    plots.heatmap(rng.rand(20, 20), tmp_path / "hm.png")
    plots.scatterplot_2d(
        {"target": rng.randn(80, 2), "pred": rng.randn(40, 2)},
        tmp_path / "tica_kde.png", plot_kde=True)
    for f in ("tica.png", "apo.png", "hm.png", "tica_kde.png"):
        assert (tmp_path / f).stat().st_size > 1000


def test_predict_config(tmp_path):
    from esmdiff_tpu.train.config import (is_predict_config,
                                          load_predict_config, load_config)

    assert is_predict_config("configs/predict.yaml")
    assert not is_predict_config("configs/clm.yaml")
    cfg = load_predict_config("configs/predict.yaml")
    assert cfg.inference.n_samples == 100 and cfg.inference.batch_size == 32
    assert cfg.inference.temperature == 1.0 and cfg.inference.top_p == 0.95
    cfg = load_predict_config("configs/predict.yaml",
                              overrides=["inference.n_samples=7",
                                         "model_type=jlm"])
    assert cfg.inference.n_samples == 7 and cfg.model_type == "jlm"
    # the training loader still handles experiment yamls
    assert load_config("configs/clm.yaml").task_name == "clm"


def test_metric_logger_and_timer(tmp_path, capsys):
    from esmdiff_tpu.utils.logging import MetricLogger, Timer

    logger = MetricLogger(tmp_path / "m.csv")
    logger.log({"loss": 1.0, "step": 1})
    logger.log({"loss": 0.5, "step": 2})
    rows = (tmp_path / "m.csv").read_text().splitlines()
    assert len(rows) == 3  # header + 2
    sink_got = []
    logger.add_sink(sink_got.append)
    logger.log({"loss": 0.1, "step": 3})
    assert sink_got and sink_got[0]["loss"] == 0.1
    with Timer("phase"):
        pass
    assert "Elapsed time (phase)" in capsys.readouterr().out
