"""Experiment tracking: wandb when available+enabled, JSONL always.

The reference logs through wandb gated by ``config.wandb.use``
(``/root/reference/src/trainer/base.py:56-58,122-127``). This tracker keeps
that contract but degrades gracefully on headless TPU workers: scalars land
in ``<log_dir>/metrics.jsonl`` regardless, so runs are inspectable without a
wandb account, and wandb mirrors them when the package is importable and
``use`` is set.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class Tracker:
    def __init__(self, log_dir: str, project: str = "ibl-video",
                 name: Optional[str] = None, use_wandb: bool = False,
                 config: Optional[dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, "metrics.jsonl")
        self._file = open(self._path, "a", buffering=1)
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: PLC0415

                self._wandb = wandb
                wandb.init(project=project, name=name, config=config or {})
            except ImportError:
                pass  # JSONL still records everything

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        record = {"t": round(time.time() - self._t0, 3)}
        if step is not None:
            record["step"] = step
        record.update({k: (float(v) if hasattr(v, "__float__") else v)
                       for k, v in metrics.items()})
        self._file.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
