"""ONE-api ingestion orchestration against fully mocked providers.

Exercises every function of ``data/one_ingest.py`` end-to-end without
ibllib/network access: a fake ONE + spike-sorting/session loaders + vidio
module over a synthetic session. The real network edge (``Providers.default``)
is covered by the gating test at the bottom.
"""

import numpy as np
import pandas as pd
import pytest

from video_spike_tpu.data import one_ingest as oi
from video_spike_tpu.data.tar_io import read_trial_tar

EID = "fakeeid-0000"
FPS = 60
N_TRIALS = 8
N_NEURONS_PER_PROBE = 6


@pytest.fixture(scope="module")
def session():
    rng = np.random.default_rng(7)
    trial_len, gap = 2.0, 1.0
    session_len = N_TRIALS * (trial_len + gap) + gap
    trial_starts = gap + np.arange(N_TRIALS) * (trial_len + gap)

    n_cam = int(session_len * FPS)
    cam_times = np.arange(n_cam) / FPS
    video = rng.integers(0, 255, (n_cam, 64, 64, 3), dtype=np.uint8)
    video[..., 1] = video[..., 0]  # grayscale-as-rgb like IBL cameras
    video[..., 2] = video[..., 0]

    n_total = 2 * N_NEURONS_PER_PROBE
    spike_times = np.sort(rng.uniform(0, session_len, 6000))
    spike_clusters = rng.integers(0, n_total, 6000)

    stim_on = trial_starts + 0.5
    trials = pd.DataFrame({
        "stimOn_times": stim_on,
        "goCue_times": stim_on - 0.02,
        "feedback_times": stim_on + 1.0,
        "firstMovement_times": stim_on + 0.3,
        "choice": rng.choice([-1.0, 1.0], N_TRIALS),
        "feedbackType": np.ones(N_TRIALS),
        "probabilityLeft": rng.choice([0.2, 0.5, 0.8], N_TRIALS),
        "rewardVolume": np.full(N_TRIALS, 1.5),
        "contrastLeft": rng.choice([0.0, 0.25, np.nan], N_TRIALS),
        "contrastRight": rng.choice([0.0, 0.25, np.nan], N_TRIALS),
    })
    # trial 1: no choice; trial 3: NaN event -> both must be masked out
    trials.loc[1, "choice"] = 0.0
    trials.loc[3, "stimOn_times"] = np.nan

    wheel = pd.DataFrame({
        "times": cam_times,
        "position": np.cumsum(rng.normal(size=n_cam)) / FPS,
        "velocity": rng.normal(size=n_cam),
    })
    me = pd.DataFrame({
        "times": cam_times,
        "whiskerMotionEnergy": np.abs(rng.normal(size=n_cam)),
    })
    dlc_cols = {}
    anchors = {"nose_tip": (14, 30), "pupil_top_r": (38, 14),
               "pupil_bottom_r": (38, 20), "pupil_left_r": (35, 17),
               "pupil_right_r": (41, 17), "paw_l": (20, 44),
               "paw_r": (44, 44)}
    for point, (ax, ay) in anchors.items():
        dlc_cols[f"{point}_x"] = ax + rng.normal(0, 0.3, n_cam)
        dlc_cols[f"{point}_y"] = ay + rng.normal(0, 0.3, n_cam)
        dlc_cols[f"{point}_likelihood"] = np.full(n_cam, 0.99)
    dlc = pd.DataFrame(dlc_cols)

    diameter = 6.0 + 0.5 * np.sin(cam_times)
    features = pd.DataFrame({
        "pupilDiameter_raw": diameter + rng.normal(0, 0.05, n_cam),
        "pupilDiameter_smooth": diameter,
    })
    lp = pd.DataFrame({
        "pupil_left_r_x": 38.0 - diameter / 2,
        "pupil_right_r_x": 38.0 + diameter / 2,
        "pupil_top_r_y": 17.0 - diameter / 2,
        "pupil_bottom_r_y": 17.0 + diameter / 2,
    })
    return dict(trial_starts=trial_starts, cam_times=cam_times, video=video,
                spike_times=spike_times, spike_clusters=spike_clusters,
                trials=trials, wheel=wheel, me=me, dlc=dlc,
                features=features, lp=lp)


class FakeRawEphys:
    fs = 30000.0


class FakeSpikeLoader:
    """Per-probe half of the session's clusters."""

    def __init__(self, session, probe: int):
        self.session = session
        self.probe = probe

    def raw_electrophysiology(self, band, stream):
        return FakeRawEphys()

    def load_spike_sorting(self):
        s = self.session
        lo = self.probe * N_NEURONS_PER_PROBE
        hi = lo + N_NEURONS_PER_PROBE
        sel = (s["spike_clusters"] >= lo) & (s["spike_clusters"] < hi)
        spikes = {"times": s["spike_times"][sel],
                  "clusters": s["spike_clusters"][sel] - lo,
                  "depths": np.zeros(sel.sum()),
                  "amps": np.ones(sel.sum())}
        return spikes, {"probe": self.probe}, {}


def fake_merge_clusters(spikes, clusters, channels):
    probe = clusters["probe"]
    n = N_NEURONS_PER_PROBE
    return pd.DataFrame({
        "label": np.where(np.arange(n) % 3 == 0, 0.5, 1.0),
        "acronym": [f"REG{probe}"] * n,
        "channels": np.arange(n),
        "depths": np.linspace(0, 1000, n),
        "uuids": [f"p{probe}c{i}" for i in range(n)],
    })


class FakeSessionLoader:
    def __init__(self, session):
        self.session = session
        self.trials = session["trials"]
        self.wheel = None
        self.motion_energy = {}

    def load_trials(self):
        pass

    def load_wheel(self):
        self.wheel = self.session["wheel"]

    def load_motion_energy(self, views):
        for v in views:
            if v == "right":  # only the left camera exists in this session
                raise FileNotFoundError("no right camera")
            self.motion_energy[f"{v}Camera"] = self.session["me"]


class FakeVidio:
    def __init__(self, session):
        self.session = session

    def url_from_eid(self, eid, one=None):
        return {"left": "fake://left-camera"}

    def label_from_path(self, url):
        return "left"

    def get_video_meta(self, url, one=None):
        return {"fps": FPS, "length": len(self.session["video"])}

    def get_video_frames_preload(self, url, index, mask=None, quiet=True,
                                 func=None):
        frames = self.session["video"][np.asarray(index)]
        out = [f[mask] if mask is not None else f for f in frames]
        if func is not None:
            out = [func(f) for f in out]
        return np.stack(out)


class FakeONE:
    def __init__(self, session):
        self.session = session

    def eid2pid(self, eid):
        return ["pid-a", "pid-b"], ["probe00", "probe01"]

    def load_dataset(self, eid, name, collection=None):
        assert name == "_ibl_leftCamera.times.npy"
        return self.session["cam_times"]

    def load_object(self, eid, obj, attribute=None, collection=None):
        assert obj in ("leftCamera", "rightCamera")
        if attribute is not None and "lightningPose" in attribute:
            assert collection is None
            return {"lightningPose": self.session["lp"],
                    "times": self.session["cam_times"]}
        assert collection == "alf"
        return {"dlc": self.session["dlc"],
                "features": self.session["features"],
                "times": self.session["cam_times"]}


@pytest.fixture(scope="module")
def providers(session):
    return oi.Providers(
        spike_loader=lambda one, pid, eid, pname: FakeSpikeLoader(
            session, probe=0 if pid.endswith("a") else 1),
        merge_clusters=fake_merge_clusters,
        sess_loader=lambda one, eid: FakeSessionLoader(session),
        vidio=FakeVidio(session),
    )


@pytest.fixture(scope="module")
def one(session):
    return FakeONE(session)


def test_load_spiking_data_qc_filter(one, providers):
    spikes, clusters, fs = oi.load_spiking_data(one, "pid-a", providers)
    assert fs == 30000.0 and len(clusters) == N_NEURONS_PER_PROBE
    spikes_qc, clusters_qc, _ = oi.load_spiking_data(one, "pid-a", providers,
                                                     qc=1.0)
    assert len(clusters_qc) == 4  # labels 0.5 at idx 0 and 3 dropped
    assert spikes_qc["clusters"].max() == 3  # dense re-index
    assert len(spikes_qc["times"]) < len(spikes["times"])


def test_merge_probe_dataframes(one, providers):
    parts = [oi.load_spiking_data(one, pid, providers)[:2]
             for pid in ("pid-a", "pid-b")]
    spikes, clusters = oi.merge_probe_dataframes(
        [p[0] for p in parts], [p[1] for p in parts])
    assert len(clusters) == 2 * N_NEURONS_PER_PROBE
    assert spikes["clusters"].max() == 2 * N_NEURONS_PER_PROBE - 1
    assert np.all(np.diff(spikes["times"]) >= 0)
    assert set(clusters["acronym"]) == {"REG0", "REG1"}


def test_load_trials_and_mask(one, providers):
    trials, mask = oi.load_trials_and_mask(one, EID, providers)
    assert len(trials) == N_TRIALS
    assert not mask[1]  # choice == 0
    assert not mask[3]  # NaN stimOn
    assert mask.sum() == N_TRIALS - 2
    # reaction time 0.3 s within [0.08, 2]; no-max variant keeps the same
    _, mask2 = oi.load_trials_and_mask(one, EID, providers, min_rt=None,
                                       max_rt=None, max_trial_len=None)
    assert mask2.sum() == N_TRIALS - 2


def test_load_target_behavior_and_fallback(one, providers, session):
    wheel = oi.load_target_behavior(one, EID, "wheel-speed", providers)
    assert np.all(wheel["values"] >= 0)  # |velocity|
    right = oi.load_target_behavior(one, EID,
                                    "right-whisker-motion-energy", providers)
    assert right.get("skip")  # only the left camera exists
    both = oi.load_anytime_behaviors(one, EID, providers)
    assert not both["left-whisker-motion-energy"].get("skip")
    assert both["right-whisker-motion-energy"].get("skip")


def test_pupil_diameter_targets(one, providers, session):
    """DLC-smoothed pupil diameter reads features.pupilDiameter_smooth;
    dlc-pupil-* targets read the raw rightCamera point traces."""
    for cam in ("left", "right"):
        pup = oi.load_target_behavior(one, EID, f"{cam}-pupil-diameter",
                                      providers)
        assert not pup.get("skip")
        np.testing.assert_array_equal(
            pup["values"], session["features"]["pupilDiameter_smooth"])
        np.testing.assert_array_equal(pup["times"], session["cam_times"])
    for target, col in [("dlc-pupil-bottom-r-y", "pupil_bottom_r_y"),
                        ("dlc-pupil-top-r-y", "pupil_top_r_y"),
                        ("dlc-pupil-left-r-x", "pupil_left_r_x"),
                        ("dlc-pupil-right-r-x", "pupil_right_r_x")]:
        out = oi.load_target_behavior(one, EID, target, providers)
        assert not out.get("skip"), target
        np.testing.assert_array_equal(out["values"], session["dlc"][col])


def test_lightning_pose_pupil_diameter(one, providers, session):
    expected = np.fabs(session["lp"]["pupil_right_r_x"].to_numpy()
                       - session["lp"]["pupil_left_r_x"].to_numpy())
    for cam in ("left", "right"):
        out = oi.load_target_behavior(
            one, EID, f"lightning-pose-{cam}-pupil-diameter", providers)
        assert not out.get("skip")
        np.testing.assert_allclose(out["values"], expected)


def test_lightning_pose_mismatch_skips(providers, session):
    """The reference asserts the x- and y-derived diameters agree; a
    disagreeing table must land in the skip contract, not crash."""
    class BadLpONE(FakeONE):
        def load_object(self, eid, obj, attribute=None, collection=None):
            out = super().load_object(eid, obj, attribute, collection)
            if attribute is not None and "lightningPose" in attribute:
                lp = out["lightningPose"].copy()
                lp["pupil_top_r_y"] = lp["pupil_top_r_y"] + 1.0
                out = {**out, "lightningPose": lp}
            return out

    out = oi.load_target_behavior(BadLpONE(session), EID,
                                  "lightning-pose-left-pupil-diameter",
                                  providers)
    assert out.get("skip")


def test_paw_and_nose_speed_targets(one, providers, session):
    from video_spike_tpu.data.ibl import dlc_speed

    cases = [("left-camera-left-paw-speed", "left", "paw_l"),
             ("left-camera-right-paw-speed", "left", "paw_r"),
             ("right-camera-left-paw-speed", "right", "paw_l"),
             ("right-camera-right-paw-speed", "right", "paw_r"),
             ("left-nose-speed", "left", "nose_tip"),
             ("right-nose-speed", "right", "nose_tip")]
    vals = {}
    for target, cam, feat in cases:
        out = oi.load_target_behavior(one, EID, target, providers)
        assert not out.get("skip"), target
        np.testing.assert_allclose(
            out["values"],
            dlc_speed(session["dlc"], session["cam_times"],
                      camera=cam, feature=feat))
        vals[target] = out["values"]
    # same trace through the two cameras differs by exactly the constant
    # fps/resolution factor: (150/1) / (60/2) = 5
    np.testing.assert_allclose(vals["right-nose-speed"],
                               vals["left-nose-speed"] * 5.0)


def test_new_targets_flow_through_bin_behaviors(one, providers, session):
    """The DLC-derived targets resample to 60 Hz per-trial arrays through
    the same bin_behaviors path as wheel/whisker signals."""
    beh, masks = oi.bin_behaviors(
        one, EID, providers,
        behaviors=("left-pupil-diameter", "left-nose-speed"),
        trials_df=session["trials"], allow_nans=True)
    for name in ("left-pupil-diameter", "left-nose-speed"):
        good = np.where(masks[name])[0]
        assert len(good) > 0
        assert beh[name][good[0]].shape == (120,)


def test_bin_spiking_and_behaviors(one, providers, session):
    trials = session["trials"]
    neural = {"spike_times": session["spike_times"],
              "spike_clusters": session["spike_clusters"]}
    binned, used, intervals = oi.bin_spiking_data(
        np.unique(session["spike_clusters"]), neural, trials_df=trials)
    assert binned.shape == (N_TRIALS, 100, 2 * N_NEURONS_PER_PROBE)
    span = intervals[:, 1] - intervals[:, 0]
    assert np.allclose(span[np.isfinite(span)], 2.0)
    assert np.isnan(span[3])  # the NaN-stimOn trial propagates

    beh, masks = oi.bin_behaviors(
        one, EID, providers,
        behaviors=("wheel-speed", "whisker-motion-energy"),
        trials_df=trials, allow_nans=True)
    assert set(beh) >= {"choice", "block", "reward", "contrast",
                        "wheel-speed", "whisker-motion-energy"}
    good = np.where(masks["wheel-speed"])[0]
    assert beh["wheel-speed"][good[0]].shape == (120,)


def test_video_index_and_loading(one, providers, session):
    trials, _ = oi.load_trials_and_mask(one, EID, providers)
    intervals = oi.trial_intervals(trials[trials["stimOn_times"].notna()])
    index_list, url = oi.load_video_index(one, EID, "left", intervals,
                                          providers)
    assert index_list.shape == (N_TRIALS - 1, 120)
    frames = oi.load_video(index_list[0], url, providers)
    assert frames.shape == (120, 64, 64)
    roi, mask = oi.get_whisker_pad_roi(one, EID, "left")
    whisker = oi.load_whisker_video(index_list[0], url, mask, providers)
    assert whisker.shape == (120, roi[1], roi[0])


def test_ingest_one_session_end_to_end(one, providers, tmp_path):
    files = oi.ingest_one_session(
        one, EID, tmp_path, providers=providers, store_video_as="npy",
        flow_backend="jax")
    assert len(files) == N_TRIALS - 2  # the two masked trials are dropped
    sample = read_trial_tar(files[0])
    ap = sample["ap"]
    assert ap.shape[0] == 100 and ap.shape[1] >= 1  # (T_bins, N_active)
    # reader emits (T, 1, H, W); frames resized to 128 like the reference
    assert sample["video"].shape == (120, 1, 128, 128)
    assert sample["whisker-motion-energy"].shape == (120,)
    assert sample["whisker-of-2d"].shape[1] == 2
    assert 0.0 <= sample["whisker-motion-energy"].min() <= 1.0
    assert sample["meta"]["eid"] == EID
    assert sample["meta"]["sample_freq"] == 30000.0


def test_brain_region_selection(one, providers, session):
    """list/select_brain_regions parity: the per-probe REG0/REG1 acronyms
    partition the merged clusters (identity Beryl mapping injected)."""
    parts = [oi.load_spiking_data(one, pid, providers)[:2]
             for pid in ("pid-a", "pid-b")]
    spikes, clusters = oi.merge_probe_dataframes(
        [p[0] for p in parts], [p[1] for p in parts])
    neural = {"spike_times": spikes["times"],
              "spike_clusters": spikes["clusters"],
              "cluster_regions": clusters["acronym"].to_numpy()}

    regions, beryl = oi.list_brain_regions(neural, single_region=False,
                                           acronym2acronym=lambda a: a)
    assert len(regions) == 1 and set(regions[0]) == {"REG0", "REG1"}
    all_ids = oi.select_brain_regions(beryl, regions[0])
    assert len(all_ids) == 2 * N_NEURONS_PER_PROBE

    regions_1, _ = oi.list_brain_regions(neural, single_region=True,
                                         acronym2acronym=lambda a: a)
    assert len(regions_1) == 2
    reg0_ids = oi.select_brain_regions(beryl, ["REG0"])
    assert len(reg0_ids) == N_NEURONS_PER_PROBE
    binned, used, _ = oi.bin_spiking_data(reg0_ids, neural,
                                          trials_df=session["trials"])
    assert binned.shape[-1] == N_NEURONS_PER_PROBE


def test_select_bwm_eids_from_manifest():
    """The shipped 700-row BWM freeze manifest drives session selection
    exactly like /root/reference/src/prepare_data.py:55-61."""
    from video_spike_tpu.cli.prepare_data import select_bwm_eids

    eids = select_bwm_eids("data/bwm_release.csv", n_sessions=6, seed=42)
    assert len(eids) == 6
    assert len(set(eids)) == 6  # distinct subjects -> distinct sessions
    assert all(len(e) == 36 for e in eids)  # uuid4 format
    # deterministic under the seed
    assert eids == select_bwm_eids("data/bwm_release.csv", 6, seed=42)
    assert eids != select_bwm_eids("data/bwm_release.csv", 6, seed=1)


def test_source_one_cli_gated_without_ibllib():
    """The CLI's --source one path must fail only at the network edge with
    actionable guidance when ibllib is absent."""
    from video_spike_tpu.cli.prepare_data import main

    with pytest.raises(RuntimeError, match="ibllib"):
        main(["--eid", EID, "--base_path", "/tmp/nowhere", "--source", "one"])
