"""Hyperparameter sweep: random search over dotted config overrides.

TPU-native equivalent of the reference's Optuna sweeper
(configs/hparams_search/optuna.yaml + get_metric_value, slm/train.py:123-128):
runs N training trials with sampled hyperparameters, survives member failures
(reference task_wrapper semantics, slm/utils/utils.py:65-93), and reports the
best trial on val/loss.

Space spec (yaml):
  space:
    optim.lr: {type: loguniform, low: 1e-6, high: 1e-3}
    data.batch_size: {type: choice, values: [8, 16, 32]}
"""

from __future__ import annotations

import argparse
import json
import random
from pathlib import Path

import yaml


def sample_value(rng: random.Random, spec: dict):
    t = spec["type"]
    if t == "loguniform":
        import math

        lo, hi = math.log(float(spec["low"])), math.log(float(spec["high"]))
        return float(math.exp(rng.uniform(lo, hi)))
    if t == "uniform":
        return float(rng.uniform(float(spec["low"]), float(spec["high"])))
    if t == "choice":
        return rng.choice(spec["values"])
    if t == "int":
        return rng.randint(int(spec["low"]), int(spec["high"]))
    raise ValueError(f"unknown space type: {t}")


def main(argv=None):
    p = argparse.ArgumentParser(description="Random hyperparameter search.")
    p.add_argument("--config", type=str, default=None,
                   help="Base experiment yaml.")
    p.add_argument("--space", type=str, required=True,
                   help="Yaml with a 'space:' mapping of dotted keys.")
    p.add_argument("--n_trials", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", type=str, default="output/sweep")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from esmdiff_tpu.train.config import load_config, save_config
    from esmdiff_tpu.train.loop import train

    space = yaml.safe_load(Path(args.space).read_text())["space"]
    rng = random.Random(args.seed)
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    results = []
    for trial in range(args.n_trials):
        sampled = {k: sample_value(rng, v) for k, v in space.items()}
        overrides = list(args.overrides) + [
            f"{k}={v}" for k, v in sampled.items()
        ] + [f"trainer.ckpt_dir={out_dir}/trial_{trial}"]
        cfg = load_config(args.config, overrides)
        save_config(cfg, out_dir / f"trial_{trial}" / "config.yaml")
        print(f"[sweep] trial {trial}: {sampled}")
        try:
            res = train(cfg)
            val = res["best_val_loss"]
            import math

            if not math.isfinite(val):
                # empty val split / divergence: no optimization signal —
                # record it as such (also keeps results.json valid JSON;
                # json.dump would otherwise emit non-standard Infinity)
                results.append({"trial": trial, "params": sampled,
                                "val_loss": None, "steps": res["steps"],
                                "error": f"non-finite val loss ({val})"})
            else:
                results.append({"trial": trial, "params": sampled,
                                "val_loss": val, "steps": res["steps"]})
        except Exception as e:  # survive member failures (task_wrapper)
            print(f"[sweep] trial {trial} failed: {e}")
            results.append({"trial": trial, "params": sampled,
                            "val_loss": None, "error": str(e)})
        (out_dir / "results.json").write_text(json.dumps(results, indent=2))

    ok = [r for r in results if r.get("val_loss") is not None]
    if ok:
        best = min(ok, key=lambda r: r["val_loss"])
        print(f"[sweep] best: trial {best['trial']} "
              f"val/loss {best['val_loss']:.4f} params {best['params']}")
        (out_dir / "best.json").write_text(json.dumps(best, indent=2))


if __name__ == "__main__":
    main()
