"""Multihost HBM trial cache: block layout, block-local gather, and the
single-process degenerate run of the multihost staged-epoch path.

The real 2-process coverage (host-local shards -> global staged dataset,
identical metrics on every rank, streaming-vs-cached agreement) lives in
``tests/test_multiprocess_dcn.py::test_two_process_cached_device_dataset``;
these tests pin the numerics of the pieces on the 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_spike_tpu.core.config import config_from_kwargs, update_config
from video_spike_tpu.data.synthetic import make_synthetic_session
from video_spike_tpu.parallel import multihost as mh
from video_spike_tpu.parallel.mesh import batch_sharding, make_mesh


def test_data_axis_blocks_single_process():
    mesh = make_mesh(n_data=4, n_model=2)
    mine, g_min, private = mh.data_axis_blocks(mesh)
    assert mine == [0, 1, 2, 3]
    assert g_min == 4
    assert private  # one process owns everything


def test_block_local_take_matches_global_gather():
    """The shard_map gather with block-LOCAL indices must equal a plain
    global jnp.take with the equivalent global indices."""
    mesh = make_mesh(n_data=4, n_model=2)
    shd = batch_sharding(mesh)
    r_block, rpb, feat = 5, 3, 7
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4 * r_block, feat)).astype(np.float32)
    ap = rng.normal(size=(4 * r_block, 2)).astype(np.float32)
    idx_loc = rng.integers(0, r_block, size=4 * rpb).astype(np.int32)

    take = mh.make_block_local_take(mesh)
    x_d = jax.device_put(x, shd)
    ap_d = jax.device_put(ap, shd)
    got_x, got_ap = jax.jit(take)(x_d, ap_d, jax.device_put(idx_loc, shd))

    # block b's local indices address rows [b*R, (b+1)*R) of the global set
    idx_global = np.concatenate(
        [b * r_block + idx_loc[b * rpb:(b + 1) * rpb] for b in range(4)])
    np.testing.assert_array_equal(np.asarray(got_x), x[idx_global])
    np.testing.assert_array_equal(np.asarray(got_ap), ap[idx_global])


@pytest.fixture(scope="module")
def session_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mhcache")
    make_synthetic_session(d, eid="mhcache000", n_trials=18, n_neurons=5,
                           seed=23, height=32, width=32)
    return d


def _trainer(session_dir, log_dir, n_model=1):
    from video_spike_tpu.core.registry import NAME2MODEL
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.train.base import BaseTrainer

    config = config_from_kwargs(
        {"model": "include:configs/model/linear_of-ws.yaml"})
    config = update_config("configs/train/linear_of-ws.yaml", config)
    config["dirs"]["data_dir"] = str(session_dir)
    config["training"]["num_epochs"] = 4
    config["training"]["train_batch_size"] = 8
    config["training"]["mesh"] = {"data": 4, "model": 2} if n_model == 2 \
        else {"data": None, "model": 1}
    config["optimizer"]["lr"] = 1e-3
    split = split_dataset(str(session_dir), "mhcache000", seed=0)
    train_dl, val_dl, test_dl = make_loader(config, split)
    meta = get_metadata_from_loader(train_dl, config)
    config["model"]["encoder"]["input_dim"] = meta["input_dim"]
    config["model"]["decoder"]["output_dim"] = meta["output_dim"]
    model = NAME2MODEL[config.model.model_class].from_config(config.model)
    return BaseTrainer(model, train_dl, val_dl, test_dl, config,
                       eid="mhcache000", dataset_split_dict=split,
                       log_dir=str(log_dir))


def test_mh_staged_epochs_single_process_degenerate(session_dir, tmp_path):
    """Drive _stage_device_dataset_multihost / _train_epoch_cached_multihost
    directly (process_count==1 degenerates every collective) on the
    {data:4, model:2} mesh: staging succeeds, epochs learn, and the only
    per-step H2D is the int32 index array."""
    t = _trainer(session_dir, tmp_path / "mh", n_model=2)
    assert t._stage_device_dataset_multihost()
    assert t._dev_data is not None
    info = t._mh_cache
    assert info["rpb"] == 8 // 4 and info["steps"] >= 1
    first = t._train_epoch_cached_multihost()
    for _ in range(6):
        last = t._train_epoch_cached_multihost()
    assert last["train_loss"] < first["train_loss"] - 0.02
    # per-step H2D = one int32 per global batch row, nothing else
    n_steps = 7 * info["steps"]
    assert t._cached_mh_h2d_bytes == n_steps * 4 * info["g"] * info["rpb"]
    # eval still flows through the replicated streaming path
    ev = t.eval_epoch()
    assert np.isfinite(ev["eval_res"]["eval_bps"])


def test_mh_staging_fallback_on_indivisible_batch(session_dir, tmp_path):
    """A global batch that does not divide the data axis must fall back to
    streaming — agreed once, then remembered (no re-staging attempts)."""
    t = _trainer(session_dir, tmp_path / "bad")
    t.config["training"]["train_batch_size"] = 3  # 3 % 8 devices != 0
    assert not t._stage_device_dataset_multihost()
    assert t._mh_cache_failed
    assert t._dev_data is None
