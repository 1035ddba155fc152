"""merge_probes + visualize_result / plot_raster / plot_scatter CLIs."""

import os

import numpy as np
import pytest

from video_spike_tpu.data.ibl import merge_probes


def test_merge_probes(rng):
    s1 = {"times": np.array([0.1, 0.5, 0.9]), "clusters": np.array([7, 3, 7])}
    s2 = {"times": np.array([0.2, 0.6]), "clusters": np.array([1, 1])}
    m1 = {"acronym": np.array(["X"] * 8), "depths": np.arange(8.0)}
    m2 = {"acronym": np.array(["Y"] * 2), "depths": np.arange(2.0)}
    merged, meta = merge_probes([s1, s2], [m1, m2])
    assert np.all(np.diff(merged["times"]) >= 0)      # time-sorted
    # probe-1 clusters {3,7} -> {0,1}; probe-2 cluster {1} -> {2}
    assert set(merged["clusters"]) == {0, 1, 2}
    assert len(meta["acronym"]) == 3
    assert list(meta["acronym"]) == ["X", "X", "Y"]


def _fake_result(rng, K=10, T=12, N=5):
    gt = rng.poisson(1.0, (K, T, N)).astype(float)
    pred = np.clip(gt + 0.2 * rng.normal(size=gt.shape), 1e-3, None)
    return {"gt": gt, "pred": pred,
            "co_bps": rng.normal(size=N).tolist(),
            "r2": rng.normal(size=N).tolist(), "eid": "viz000000"}


def test_plot_raster_cli(tmp_path, monkeypatch, rng):
    import plot_raster

    monkeypatch.chdir(tmp_path)
    os.makedirs("data")
    res = {"viz000000": _fake_result(rng)}
    np.save("me_result.npy", res)
    np.save("of-2d_result.npy", res)
    plot_raster.main(["--ref_mod", "me", "--input_mod", "of-2d"])
    assert os.path.exists("viz00_scatter.png")
    assert os.path.exists("viz00_raster_plot.png")


def test_plot_scatter_cli(tmp_path, monkeypatch, rng):
    import plot_scatter

    monkeypatch.chdir(tmp_path)
    os.makedirs("data")
    with open("data/eid.txt", "w") as f:
        f.write("viz000000\n")
    np.save("viz00_me_result.npy", _fake_result(rng))
    np.save("viz00_of-2d_result.npy", _fake_result(rng))
    plot_scatter.main(["--ref_mod", "me", "--input_mod", "of-2d"])
    assert os.path.exists("scatter_r2_sessions.png")
    assert os.path.exists("scatter_bps_sessions.png")


def test_visualize_result_cli(tmp_path, monkeypatch, rng):
    from video_spike_tpu.cli.visualize_result import get_log, main

    monkeypatch.chdir(tmp_path)
    for eid, mod in [("aaa00", "me"), ("bbb00", "of")]:
        d = tmp_path / "logs" / eid / mod / "LinearModel"
        d.mkdir(parents=True)
        np.save(d / "test_results.npy",
                {"test_res": {"test_bps": float(rng.normal()),
                              "test_loss": 1.0}})
    df = get_log(str(tmp_path / "logs"))
    assert len(df) == 2
    assert set(df["mod"]) == {"me", "of"}
    main(["--log_dir", str(tmp_path / "logs")])
    assert os.path.exists("bps.png")
