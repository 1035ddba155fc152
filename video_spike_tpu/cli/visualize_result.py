"""Aggregate test_results.npy files and draw the per-modality bps boxplot.

CLI parity with ``/root/reference/src/visualize_result.py`` +
``get_log``/``draw_results`` (``/root/reference/src/utils/utils.py:183-224``):
walks ``--log_dir`` for ``test_results.npy`` artifacts laid out as
``<log_dir>/<eid5>/<mods>/<Model>/test_results.npy`` and writes ``bps.png``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from video_spike_tpu.core.cli import get_args
from video_spike_tpu.viz.plots import draw_results_boxplot


def get_log(log_dir: str) -> pd.DataFrame:
    rows = {}
    for root, _dirs, files in os.walk(log_dir):
        for file in files:
            if not file.endswith(".npy"):
                continue
            path = os.path.join(root, file)
            data = np.load(path, allow_pickle=True).item()
            if "test_res" not in data:
                continue
            rel = os.path.relpath(path, log_dir).split(os.sep)
            row = dict(data["test_res"])
            row["eid"] = rel[0] if len(rel) > 2 else "?"
            row["mod"] = rel[1] if len(rel) > 2 else "?"
            rows[path] = row
    return pd.DataFrame(rows).T


def main(argv=None):
    args = get_args(argv)
    df = get_log(args.log_dir)
    if df.empty:
        print(f"no test_results.npy under {args.log_dir}")
        return None
    fig = draw_results_boxplot(df, metric="test_bps")
    fig.savefig("bps.png")
    print("saved bps.png")
    return df


if __name__ == "__main__":
    main()
