"""Orbax checkpointing: top-k tracking + resume.

The TPU equivalent of the reference's ModelCheckpoint-on-val/loss + ckpt_path
resume (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, save_top_k: int = 1):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.save_top_k = save_top_k
        self._ckptr = ocp.StandardCheckpointer()
        self._index_path = self.dir / "index.json"
        self._index = []
        if self._index_path.exists():
            self._index = json.loads(self._index_path.read_text())

    def save(self, state, step: int, metric: float):
        path = self.dir / f"step_{step}"
        self._ckptr.save(path, jax.device_get(state), force=True)
        self._ckptr.wait_until_finished()
        self._index.append({"step": step, "metric": metric,
                            "path": str(path)})
        self._index.sort(key=lambda e: e["metric"])
        while len(self._index) > self.save_top_k:
            worst = self._index.pop()
            p = Path(worst["path"])
            if p.exists():
                import shutil

                shutil.rmtree(p, ignore_errors=True)
        self._index_path.write_text(json.dumps(self._index, indent=2))

    def best_path(self) -> str | None:
        return self._index[0]["path"] if self._index else None

    def restore(self, path: str | Path, target):
        return self._ckptr.restore(Path(path).absolute(),
                                   jax.device_get(target))
