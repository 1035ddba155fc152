"""ETL algorithms: spike binning, behavior interp, alignment, ROI, full
raw-session -> tar pipeline -> trainable dataset."""

import numpy as np
import pytest

from video_spike_tpu.data.ibl import (
    active_neuron_mask,
    align_spike_behavior,
    bin_spikes,
    create_intervals,
    dlc_speed,
    get_dlc_midpoint,
    interp_behavior,
    whisker_pad_roi,
    whisker_pad_roi_from_dlc,
)


def test_dlc_speed_golden():
    """Hand-computed brainbox get_speed parity: displacement-norm x fps at
    frame midpoints, linearly interpolated (with edge extrapolation) back
    onto the camera timestamps."""
    times = np.array([0.0, 1.0, 2.0])
    dlc = {"paw_l_x": np.array([0.0, 3.0, 3.0]),
           "paw_l_y": np.array([0.0, 4.0, 4.0])}
    # right camera: resolution divisor 1, 150 Hz ->
    # midpoint speeds [5*150, 0] at t=[0.5, 1.5]; extrapolate to the edges
    out = dlc_speed(dlc, times, camera="right", feature="paw_l")
    np.testing.assert_allclose(out, [1125.0, 375.0, -375.0])
    # left camera: positions halved (res 2), 60 Hz -> exact scale factor
    out_left = dlc_speed(dlc, times, camera="left", feature="paw_l")
    np.testing.assert_allclose(out_left, out * (60.0 / 150.0) / 2.0)


def test_dlc_speed_matches_scipy_interp1d():
    """The midpoint-resample step reproduces scipy
    interp1d(fill_value='extrapolate') on irregular timestamps."""
    from scipy.interpolate import interp1d

    rng = np.random.default_rng(3)
    n = 50
    times = np.sort(rng.uniform(0.0, 5.0, n))
    x = rng.normal(size=n)
    y = rng.normal(size=n)
    out = dlc_speed({"nose_tip_x": x, "nose_tip_y": y}, times,
                    camera="body", feature="nose_tip")
    s = np.sqrt(np.diff(x) ** 2 + np.diff(y) ** 2) * 30
    tv = times[:-1] + np.diff(times) / 2
    expected = interp1d(tv, s, fill_value="extrapolate")(times)
    np.testing.assert_allclose(out, expected, rtol=1e-9)


def test_dlc_speed_validates_inputs():
    times = np.arange(4.0)
    with pytest.raises(ValueError, match="length"):
        dlc_speed({"paw_r_x": np.zeros(3), "paw_r_y": np.zeros(3)},
                  times, camera="left")
    with pytest.raises(ValueError, match="at least 3"):
        dlc_speed({"paw_r_x": np.zeros(2), "paw_r_y": np.zeros(2)},
                  np.arange(2.0), camera="left")


def test_create_intervals():
    iv = create_intervals(0.0, 10.0, 2.0)
    assert iv.shape == (4, 2)
    np.testing.assert_allclose(iv[:, 1] - iv[:, 0], 2.0)


def test_bin_spikes_counts():
    # two neurons, known spike times
    times = np.array([0.01, 0.05, 0.05, 1.99, 2.5, 3.999])
    clusters = np.array([0, 1, 1, 0, 0, 1])
    iv = np.array([[0.0, 2.0], [2.0, 4.0]])
    out = bin_spikes(times, clusters, iv, binsize=0.02, n_clusters=2)
    assert out.shape == (2, 2, 100)
    assert out[0, 0, 0] == 1          # 0.01 -> bin 0
    assert out[0, 1, 2] == 2          # 0.05 x2 -> bin 2
    assert out[0, 0, 99] == 1         # 1.99 -> last bin of trial 0
    assert out[1, 0, 25] == 1         # 2.5 -> bin 25 of trial 1
    assert out[1, 1, 99] == 1         # 3.999 -> last bin
    assert out.sum() == 6


def test_bin_spikes_matches_histogram(rng):
    times = np.sort(rng.uniform(0, 20, 5000))
    clusters = rng.integers(0, 7, 5000)
    iv = create_intervals(0.0, 20.0, 2.0)
    out = bin_spikes(times, clusters, iv, binsize=0.02, n_clusters=7)
    for k in [0, 3, len(iv) - 1]:
        m = (times >= iv[k, 0]) & (times < iv[k, 1])
        ref, _, _ = np.histogram2d(
            clusters[m], times[m],
            bins=[np.arange(8) - 0.5,
                  np.arange(iv[k, 0], iv[k, 1] + 1e-9, 0.02)])
        np.testing.assert_array_equal(out[k], ref)


def test_interp_behavior_good_and_bad():
    t = np.arange(0, 10, 1 / 100)       # 100 Hz signal (>= target 60 Hz)
    v = np.sin(t)
    iv = np.array([[1.0, 3.0], [8.5, 10.5]])  # 2nd extends past data end
    times, vals, good = interp_behavior(t, v, iv, freq=60)
    assert good[0] and not good[1]
    assert vals[0].shape == (120,)
    np.testing.assert_allclose(vals[0], np.sin(times[0]), atol=2e-3)
    assert vals[1] is None


def test_interp_behavior_nan_skip():
    t = np.arange(0, 4, 0.01)
    v = np.ones_like(t)
    v[150] = np.nan
    iv = np.array([[0.5, 2.5], [2.99, 3.99]])
    _, vals, good = interp_behavior(t, v, iv, freq=60)
    assert not good[0]          # nan inside
    assert vals[0] is None


def test_align_spike_behavior():
    spikes = np.ones((4, 3, 10))
    behaviors = {
        "wheel-speed": [np.arange(5.0), None, np.arange(5.0), np.arange(5.0)],
        "whisker-motion-energy": [np.ones(5), np.ones(5), None, np.ones(5)],
    }
    out_spikes, out_beh, keep, deleted = align_spike_behavior(
        spikes, behaviors, list(behaviors.keys()))
    # trials 1 and 2 each miss one behavior -> both dropped (the reference's
    # `and` bug would have kept trial 1)
    assert list(keep) == [True, False, False, True]
    assert out_spikes.shape[0] == 2
    ws = out_beh["wheel-speed"]
    assert ws.min() == 0.0 and ws.max() == 1.0  # min-max normalized


def test_active_neuron_mask():
    K, N, T = 5, 3, 100
    spikes = np.zeros((K, N, T))
    spikes[:, 0] = 1.0   # 100 spikes / 2 s = 50 Hz
    spikes[:, 1, :3] = 1.0  # 1.5 Hz
    mask = active_neuron_mask(spikes, interval_len=2.0, min_rate_hz=2.0)
    assert list(mask) == [True, False, False]


def test_dlc_midpoint_and_roi():
    n = 100
    dlc = {
        "nose_tip_x": np.full(n, 20.0), "nose_tip_y": np.full(n, 40.0),
        "nose_tip_likelihood": np.full(n, 0.99),
        "pupil_top_r_x": np.full(n, 44.0), "pupil_top_r_y": np.full(n, 22.0),
        "pupil_top_r_likelihood": np.full(n, 0.99),
    }
    assert get_dlc_midpoint(dlc, "nose_tip") == (20, 40)
    roi, mask = whisker_pad_roi_from_dlc(dlc)
    dist = np.sqrt(24 ** 2 + 18 ** 2)
    assert roi[0] == int(dist / 2) and roi[1] == int(dist / 3)
    # low likelihood -> all nan -> error
    dlc_bad = dict(dlc, nose_tip_likelihood=np.zeros(n))
    with pytest.raises(ValueError):
        get_dlc_midpoint(dlc_bad, "nose_tip")


def test_roi_negative_raises():
    with pytest.raises(ValueError):
        whisker_pad_roi((0, 0), (2, 40))  # anchor-x - d/4 < 0


def test_full_etl_pipeline(tmp_path):
    """raw npz -> prepare_data -> tars -> loadable, trainable dataset."""
    from video_spike_tpu.cli.prepare_data import main as prep_main
    from video_spike_tpu.data.dataset import SessionDataset, split_dataset
    from video_spike_tpu.data.synthetic import make_raw_session

    raw = make_raw_session(tmp_path / "raw.npz", eid="etlsess000",
                           n_trials=8, n_neurons=12, seed=11)
    files = prep_main(["--eid", "etlsess000",
                       "--base_path", str(tmp_path / "shards"),
                       "--raw_npz", raw])
    assert len(files) == 8
    ds = SessionDataset(files, batch_size=4)
    batch = next(iter(ds))
    assert batch["ap"].shape[1] == 100          # 100 x 20 ms bins
    n_neurons = batch["ap"].shape[2]
    assert 0 < n_neurons <= 12                   # active filter applied
    assert batch["wheel-speed"].shape == (4, 120)
    assert batch["whisker-of-2d"].shape == (4, 120, 2)
    assert batch["video"].shape[1] == 120
    # whisker crop is the ROI size
    assert batch["whisker-video"].shape[2] == 1
    # spikes nonzero and behaviors normalized
    assert batch["ap"].sum() > 0
    assert batch["whisker-motion-energy"].max() <= 1.0
