"""Pins the ibllib/ONE API contract (round-2 VERDICT item 3).

Two halves:

1. Always-on: the full ingestion runs against STRICT mocks generated from
   the recorded schema (``video_spike_tpu.data.one_contract``). The mocks
   expose exactly the recorded columns/methods/datasets, so if the
   ingestion code starts consuming any field outside the contract, these
   tests fail with a loud KeyError/ContractError instead of silently
   passing against hand-rolled mocks.
2. Import-gated: when ibllib/brainbox ARE importable, the recorded contract
   is verified against the real modules (classes, methods, signatures) —
   catching drift between the contract file and ibllib itself. A further
   env-gated smoke runs the real network ingestion.
"""

import inspect
import os

import numpy as np
import pytest

from video_spike_tpu.data import one_contract as oc
from video_spike_tpu.data import one_ingest as oi


@pytest.fixture(scope="module")
def mocks():
    return oc.build_contract_mocks()


def test_ingest_end_to_end_within_contract(mocks, tmp_path):
    """The whole --source one orchestration touches ONLY recorded fields."""
    one, providers, session = mocks
    files = oi.ingest_one_session(one, "contract-eid", tmp_path,
                                  providers=providers, store_video_as="npy",
                                  flow_backend="jax")
    assert files, "no trials ingested"
    from video_spike_tpu.data.tar_io import read_trial_tar
    sample = read_trial_tar(files[0])
    assert sample["ap"].shape[0] == 100
    assert sample["video"].shape == (120, 1, 128, 128)


#: every target string of the reference's load_target_behavior docstring
#: (/root/reference/src/utils/ibl_data_utils.py:430-435) plus the raw
#: dlc-pupil point traces and lightning-pose variants (:506-558) —
#: right-whisker-motion-energy is exercised separately as the skip case
#: (the default contract session lacks the right video stream)
ALL_BEHAVIOR_TARGETS = (
    "wheel-position", "wheel-velocity", "wheel-speed",
    "left-whisker-motion-energy",
    "left-pupil-diameter", "right-pupil-diameter",
    "dlc-pupil-bottom-r-y", "dlc-pupil-top-r-y",
    "dlc-pupil-left-r-x", "dlc-pupil-right-r-x",
    "lightning-pose-left-pupil-diameter",
    "lightning-pose-right-pupil-diameter",
    "left-camera-left-paw-speed", "left-camera-right-paw-speed",
    "right-camera-left-paw-speed", "right-camera-right-paw-speed",
    "left-nose-speed", "right-nose-speed",
)


def test_trials_and_behavior_loaders_within_contract(mocks):
    one, providers, session = mocks
    trials, mask = oi.load_trials_and_mask(one, "eid", providers)
    assert list(trials.columns) == list(oc.TRIALS_COLUMNS)
    # every reference target resolves to aligned {times, values} while
    # touching ONLY recorded fields
    for target in ALL_BEHAVIOR_TARGETS:
        out = oi.load_target_behavior(one, "eid", target, providers)
        assert not out.get("skip"), target
        assert len(out["times"]) == len(out["values"]), target
    # a view the session lacks follows the skip contract, not a crash
    right = oi.load_target_behavior(one, "eid",
                                    "right-whisker-motion-energy", providers)
    assert right.get("skip")
    # unknown targets follow the reference's skip contract too
    assert oi.load_target_behavior(one, "eid", "no-such-target",
                                   providers).get("skip")


def test_mocks_are_strict(mocks):
    """The strictness the drift detection relies on actually bites."""
    one, providers, session = mocks
    # dataset names outside the contract are rejected
    with pytest.raises(oc.ContractError):
        one.load_dataset("eid", "_ibl_trials.table.pqt", collection="alf")
    # object names outside the contract are rejected
    with pytest.raises(oc.ContractError):
        one.load_object("eid", "wheel", collection="alf")
    # trials frame has EXACTLY the recorded columns
    sl = providers.sess_loader(one, "eid")
    with pytest.raises(KeyError):
        sl.trials["intervals_0"]
    # session loader surface is closed
    with pytest.raises(AttributeError):
        sl.load_pose()
    with pytest.raises(FileNotFoundError):
        sl.load_motion_energy(views=["right"])
    with pytest.raises(oc.ContractError):
        sl.load_motion_energy(views=["topdown"])
    # wheel/me columns exact
    sl.load_wheel()
    assert list(sl.wheel.columns) == list(oc.WHEEL_COLUMNS)
    sl.load_motion_energy(views=["left"])
    assert (list(sl.motion_energy["leftCamera"].columns)
            == list(oc.MOTION_ENERGY_COLUMNS))
    # video meta keys exact
    meta = providers.vidio.get_video_meta("fake://left-camera")
    assert set(meta) == set(oc.VIDEO_META_KEYS)


def test_contract_schemas_self_consistent():
    """The recorded schema covers exactly what the reference consumes."""
    # the trials mask query's fields are all recorded
    assert set(oi.DEFAULT_NAN_EXCLUDE) <= set(oc.TRIALS_COLUMNS)
    for col in ("goCue_times", "rewardVolume", "contrastLeft",
                "contrastRight"):
        assert col in oc.TRIALS_COLUMNS
    # the DLC pupil fallback chain is recorded in reference order
    assert oc.DLC_POINTS[0] == "nose_tip"
    assert set(oc.DLC_POINTS[1:]) == {
        "pupil_top_r", "pupil_left_r", "pupil_right_r", "pupil_bottom_r"}


# ---------------------------------------------------------------------------
# import-gated: verify the contract against the real ibllib when present
# ---------------------------------------------------------------------------

def test_contract_against_real_ibllib():
    brainbox = pytest.importorskip("brainbox.io.one")
    vidio = pytest.importorskip("ibllib.io.video")

    # classes + methods exist
    SpikeSortingLoader = brainbox.SpikeSortingLoader
    SessionLoader = brainbox.SessionLoader
    for fn in oc.VIDIO_FUNCTIONS:
        assert hasattr(vidio, fn), f"ibllib.io.video.{fn} missing"
    for m in oc.SESSION_LOADER_METHODS:
        assert hasattr(SessionLoader, m), f"SessionLoader.{m} missing"
    for m in ("load_spike_sorting", "raw_electrophysiology",
              "merge_clusters"):
        assert hasattr(SpikeSortingLoader, m)

    # call signatures accept the shapes the ingestion uses
    sig = inspect.signature(SpikeSortingLoader.__init__)
    for p in ("pid", "one", "eid", "pname"):
        assert p in sig.parameters, f"SpikeSortingLoader({p}=...) drifted"
    sig = inspect.signature(vidio.get_video_frames_preload)
    for p in ("mask", "quiet", "func"):
        assert p in sig.parameters, f"get_video_frames_preload({p}=) drifted"
    sig = inspect.signature(SessionLoader.load_motion_energy)
    assert "views" in sig.parameters


def test_real_one_integration_smoke(tmp_path):
    """Full network ingestion; opt-in via ONE_INTEGRATION_EID=<eid>."""
    eid = os.environ.get("ONE_INTEGRATION_EID")
    if not eid:
        pytest.skip("set ONE_INTEGRATION_EID to run the network smoke")
    one_api = pytest.importorskip("one.api")
    one = one_api.ONE(
        base_url="https://openalyx.internationalbrainlab.org",
        password="international", silent=True)
    files = oi.ingest_one_session(one, eid, tmp_path, store_video_as="npy")
    assert files
    from video_spike_tpu.data.tar_io import read_trial_tar
    sample = read_trial_tar(files[0])
    assert sample["ap"].shape[0] == 100
    assert sample["video"].shape[1:] == (1, 128, 128)
