"""C++ native shard reader: build, ordered streaming, dataset integration."""

import numpy as np
import pytest

from video_spike_tpu.data.native_io import (
    NativeShardReader,
    native_available,
    parse_tar_blob,
)
from video_spike_tpu.data.synthetic import make_synthetic_session

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    return make_synthetic_session(d, eid="native0000", n_trials=10,
                                  n_neurons=6, seed=9, height=32, width=32)


def test_reader_streams_in_order(shards):
    reader = NativeShardReader(shards, n_workers=4, capacity=3)
    seen = []
    for path, blob in reader:
        assert len(blob) > 0
        sample = parse_tar_blob(blob)
        assert sample["ap"].shape == (100, 6)
        seen.append(path)
    assert seen == list(shards)
    reader.close()


def test_reader_reset_new_epoch(shards):
    reader = NativeShardReader(shards[:4], n_workers=2, capacity=2)
    first = [p for p, _ in reader]
    assert first == shards[:4]
    reader.reset(list(reversed(shards[:4])))
    second = [p for p, _ in reader]
    assert second == list(reversed(shards[:4]))
    reader.close()


def test_blob_matches_python_decoder(shards):
    from video_spike_tpu.data.tar_io import read_trial_tar
    reader = NativeShardReader(shards[:2], n_workers=1)
    for path, blob in reader:
        native = parse_tar_blob(blob)
        python = read_trial_tar(path)
        assert native.keys() == python.keys()
        np.testing.assert_array_equal(native["ap"], python["ap"])
        np.testing.assert_array_equal(native["video"], python["video"])
    reader.close()


def test_reader_unreadable_shard_raises(shards, tmp_path):
    """A missing (or 0-byte) shard mid-list must raise IOError naming the
    path — never read as the end-of-epoch sentinel (which would silently
    truncate the epoch at that position)."""
    missing = str(tmp_path / "nope.tar")
    reader = NativeShardReader([shards[0], missing, shards[1]], n_workers=2)
    it = iter(reader)
    path, blob = next(it)
    assert path == shards[0] and len(blob) > 0
    with pytest.raises(IOError, match="nope.tar"):
        next(it)
    reader.close()

    empty = tmp_path / "empty.tar"
    empty.write_bytes(b"")
    reader = NativeShardReader([str(empty)], n_workers=1)
    with pytest.raises(IOError, match="empty.tar"):
        next(iter(reader))
    reader.close()


def test_dataset_native_backend(shards):
    from video_spike_tpu.data.dataset import SessionDataset
    ds_native = SessionDataset(shards, batch_size=4, io_backend="native",
                               cache=False)
    ds_python = SessionDataset(shards, batch_size=4, io_backend="python",
                               cache=False)
    for b_n, b_p in zip(ds_native, ds_python):
        np.testing.assert_array_equal(b_n["ap"], b_p["ap"])
        assert b_n["eid"] == b_p["eid"]
    # shuffled epochs with caching also work (native streams the first
    # epoch, cache serves the second)
    ds = SessionDataset(shards, batch_size=4, shuffle=True, cache=True,
                        io_backend="native")
    n1 = sum(b["ap"].shape[0] for b in ds)
    n2 = sum(b["ap"].shape[0] for b in ds)
    assert n1 == n2 == 10
