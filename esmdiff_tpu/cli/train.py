"""Training CLI.

TPU-native equivalent of ``python slm/train.py experiment=mdlm ...``
(reference slm/train.py:43-132):

  esmdiff-train --config configs/mdlm.yaml data.path=... trainer.max_epochs=5
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description="Fine-tune ESMDiff (MDLM) on TPU.")
    p.add_argument("--config", type=str, default=None,
                   help="Experiment yaml (e.g. configs/mdlm.yaml).")
    p.add_argument("overrides", nargs="*",
                   help="Dotted overrides, e.g. optim.lr=1e-4")
    args = p.parse_args(argv)

    from esmdiff_tpu.train.config import load_config, save_config
    from esmdiff_tpu.train.loop import train

    cfg = load_config(args.config, args.overrides)
    save_config(cfg, f"{cfg.trainer.ckpt_dir}/config.yaml")
    if cfg.trainer.print_config:
        # composed-config tree at startup (reference rich_utils.print_config_tree)
        import dataclasses

        import yaml

        print("── config ──────────────────────────────")
        print(yaml.safe_dump(dataclasses.asdict(cfg), sort_keys=False), end="")
        print("────────────────────────────────────────")
    result = train(cfg)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
