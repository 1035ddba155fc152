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
        # multihost: master-rank-only logging (reference log_utils gating,
        # /root/reference/src/utils/log_utils.py:45-144) — non-main
        # processes write to devnull and never init wandb
        try:
            import jax
            if jax.process_count() > 1 and jax.process_index() != 0:
                self._path = os.devnull
                use_wandb = False
        except Exception:
            pass
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

    def log_figure(self, name: str, fig, step: Optional[int] = None,
                   path: Optional[str] = None) -> None:
        """Figure channel (the reference logs best-epoch gt/pred figures
        into wandb, ``/root/reference/src/trainer/base.py:122-127``): wandb
        gets the live Image when enabled; the JSONL always records a
        ``figure`` event with the on-disk path so headless runs keep the
        artifact trail. The caller owns saving/closing the figure when it
        passes ``path`` pre-saved; otherwise the figure is saved here."""
        if path is None:
            if self._path == os.devnull:
                # non-main multihost rank: the JSONL is diverted to devnull
                # and dirname(devnull) would yield an unwritable /dev path —
                # figures are rank-0 artifacts, skip entirely
                return
            path = os.path.join(os.path.dirname(self._path), f"{name}.png")
            fig.savefig(path)
        record = {"t": round(time.time() - self._t0, 3),
                  "figure": name, "path": path}
        if step is not None:
            record["step"] = step
        self._file.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(fig)}, step=step)

    def close(self) -> None:
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
