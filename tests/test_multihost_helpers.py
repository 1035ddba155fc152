"""Single-process semantics of the multi-host helpers.

The 2-process integration paths live in ``tests/test_multiprocess_dcn.py``;
these pin the no-op contracts every single-host run relies on (the helpers
are on the hot path of all trainers, so a regression here breaks the
single-chip flagship, not just pods).
"""

import numpy as np
import pytest

import jax

from video_spike_tpu.parallel import multihost as mh


def test_single_process_is_not_multihost():
    assert mh.is_multihost() is False


def test_shard_files_identity_single_process():
    files = [f"f{i}" for i in range(7)]
    assert mh.shard_files_for_process(files) == files
    # and it returns a fresh list (callers mutate their shard)
    shard = mh.shard_files_for_process(files)
    shard.append("extra")
    assert len(files) == 7


def test_global_min_identity_single_process():
    assert mh.global_min(5) == 5
    assert isinstance(mh.global_min(np.int64(3)), int)


def test_gather_rows_identity_single_process():
    x = jax.numpy.arange(6).reshape(3, 2)
    out = mh.gather_rows(x)
    np.testing.assert_array_equal(out, np.arange(6).reshape(3, 2))
    assert isinstance(out, np.ndarray)


def test_replicate_tree_single_process_device_put():
    from video_spike_tpu.parallel.mesh import make_mesh, replicated
    mesh = make_mesh()
    tree = {"w": np.ones((4, 4), np.float32), "b": np.zeros(4, np.float32)}
    out = mh.replicate_tree(tree, replicated(mesh))
    assert out["w"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(out["b"]), tree["b"])


def test_local_rows_to_global_single_process():
    from video_spike_tpu.parallel.mesh import batch_sharding, make_mesh
    mesh = make_mesh()
    n = mesh.shape["data"]
    x = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    (g,) = mh.local_rows_to_global(batch_sharding(mesh), x)
    assert g.shape == (n, 3)
    np.testing.assert_array_equal(np.asarray(g), x)
