"""VTT flagship + multi-session sharded trainer on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_spike_tpu.data.synthetic import make_synthetic_session
from video_spike_tpu.models.vtt import VideoTemporalTransformer, time_resample_init
from video_spike_tpu.train.multisession import masked_poisson_nll

TINY = dict(n_sessions=2, max_neurons=10, t_frames=12, t_bins=10,
            patch_size=8, hidden_size=32, frame_depth=1, temporal_depth=1,
            num_attention_heads=4, intermediate_size=64)


def test_time_resample_matrix():
    M = time_resample_init(120, 100)
    assert M.shape == (120, 100)
    np.testing.assert_allclose(M.sum(axis=0), 1.0, rtol=1e-6)
    # resampling a linear ramp is exact
    ramp = np.arange(120, dtype=np.float32)
    out = ramp @ M
    np.testing.assert_allclose(out, np.linspace(0, 119, 100), atol=1e-4)


def test_vtt_forward_shapes(rng):
    model = VideoTemporalTransformer.from_config(TINY)
    video = jnp.asarray(rng.integers(0, 255, (3, 12, 1, 32, 32))
                        .astype(np.uint8))
    sids = jnp.asarray([0, 1, 0], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video, sids)
    out = model.apply(params, video, sids)
    assert out.shape == (3, 10, 10)
    # different sessions use different heads
    out0 = model.apply(params, video, jnp.zeros(3, jnp.int32))
    out1 = model.apply(params, video, jnp.ones(3, jnp.int32))
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_vtt_matmul_patchify_bit_equal(rng):
    """The explicit-matmul patchify (round-5 MFU variant) must share the
    Conv path's exact parameter tree and reproduce its outputs (same init
    key -> same params -> equal logits within f32 matmul noise)."""
    # matmul_patchify defaults True since the round-5 on-chip A/B; pin both
    # arms explicitly so the equivalence stays tested either way
    conv_model = VideoTemporalTransformer.from_config(
        dict(TINY, matmul_patchify=False))
    mm_model = VideoTemporalTransformer.from_config(
        dict(TINY, matmul_patchify=True))
    video = jnp.asarray(rng.integers(0, 255, (2, 12, 1, 32, 32))
                        .astype(np.uint8))
    sids = jnp.asarray([0, 1], jnp.int32)
    p_conv = conv_model.init(jax.random.PRNGKey(0), video, sids)
    p_mm = mm_model.init(jax.random.PRNGKey(0), video, sids)
    assert (jax.tree.structure(p_conv) == jax.tree.structure(p_mm))
    for a, b in zip(jax.tree.leaves(p_conv), jax.tree.leaves(p_mm)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out_conv = conv_model.apply(p_conv, video, sids)
    out_mm = mm_model.apply(p_conv, video, sids)   # checkpoint interchange
    np.testing.assert_allclose(np.asarray(out_mm), np.asarray(out_conv),
                               rtol=2e-3, atol=2e-3)


def test_vtt_pool_before_norm_variant(rng):
    """pool_before_norm keeps the parameter tree (LN over (D,) either way)
    but is an intentional architectural variant — outputs differ."""
    base = VideoTemporalTransformer.from_config(TINY)
    variant = VideoTemporalTransformer.from_config(
        dict(TINY, pool_before_norm=True))
    video = jnp.asarray(rng.integers(0, 255, (2, 12, 1, 32, 32))
                        .astype(np.uint8))
    sids = jnp.asarray([0, 1], jnp.int32)
    p = base.init(jax.random.PRNGKey(0), video, sids)
    p_v = variant.init(jax.random.PRNGKey(0), video, sids)
    assert jax.tree.structure(p) == jax.tree.structure(p_v)
    out = variant.apply(p, video, sids)
    assert out.shape == (2, 10, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_masked_poisson_nll(rng):
    x = jnp.asarray(rng.normal(size=(4, 10, 6)).astype(np.float32))
    t = jnp.asarray(rng.poisson(1.0, (4, 10, 6)).astype(np.float32))
    full_mask = jnp.ones((4, 6))
    loss_full = masked_poisson_nll(x, t, full_mask, jnp.float32(4))
    ref = float(jnp.mean(jnp.exp(x) - t * x))
    assert np.isclose(float(loss_full), ref, rtol=1e-6)
    # masking neurons 3: changes the loss to the mean over valid only
    nmask = full_mask.at[:, 3:].set(0.0)
    loss_masked = masked_poisson_nll(x, t, nmask, jnp.float32(4))
    ref_masked = float(jnp.mean((jnp.exp(x) - t * x)[:, :, :3]))
    assert np.isclose(float(loss_masked), ref_masked, rtol=1e-6)
    # masked rows drop out
    loss_rows = masked_poisson_nll(x, t, full_mask, jnp.float32(2))
    ref_rows = float(jnp.mean((jnp.exp(x) - t * x)[:2]))
    assert np.isclose(float(loss_rows), ref_rows, rtol=1e-6)


@pytest.fixture(scope="module")
def two_sessions(tmp_path_factory):
    d = tmp_path_factory.mktemp("multi")
    make_synthetic_session(d, eid="sessa0000", n_trials=12, n_neurons=6,
                           seed=20, height=32, width=32)
    make_synthetic_session(d, eid="sessb0000", n_trials=12, n_neurons=9,
                           seed=21, height=32, width=32)
    return d


@pytest.mark.slow
def test_multisession_streaming_path(two_sessions, tmp_path):
    """device_cache off exercises the per-step round-robin transfers."""
    from video_spike_tpu.core.config import DictConfig
    from video_spike_tpu.models.vtt import VideoTemporalTransformer
    from video_spike_tpu.train.multisession import MultiSessionTrainer

    config = DictConfig({
        "training": {"num_epochs": 1, "train_batch_size": 4,
                     "test_batch_size": 4, "device_cache": False},
        "optimizer": {"lr": 1e-3, "wd": 0.01, "eps": 1e-8,
                      "warmup_pct": 0.15, "div_factor": 10},
    })
    trainer = MultiSessionTrainer(model=None, config=config,
                                  eids=["sessa0000", "sessb0000"],
                                  data_dir=str(two_sessions),
                                  log_dir=str(tmp_path))
    trainer.model = VideoTemporalTransformer.from_config(
        dict(TINY, n_sessions=2, max_neurons=trainer.max_neurons,
             t_frames=120, t_bins=100))
    res = trainer.train_epoch()
    assert np.isfinite(res["train_loss"])
    assert trainer._dev_data is None  # stayed on the streaming path


def test_multisession_cli_end_to_end(two_sessions, tmp_path, monkeypatch):
    import yaml
    from video_spike_tpu.cli.train import main

    model_cfg = tmp_path / "vtt_tiny.yaml"
    model_cfg.write_text(yaml.safe_dump({
        "model_class": "VideoTransformer", "t_frames": 120, "t_bins": 100,
        "patch_size": 8, "hidden_size": 32, "frame_depth": 1,
        "temporal_depth": 1, "num_attention_heads": 4,
        "intermediate_size": 64}))
    res = main([
        "--model_config", str(model_cfg),
        "--train_config", "configs/train/vtt_video.yaml",
        "--eid", "sessa0000,sessb0000",
        "--data_dir", str(two_sessions),
        "--num_epochs", "2",
        "--batch_size", "4",
        "--log_dir", str(tmp_path / "logs"),
    ])
    assert np.isfinite(res["best_eval_bps"])
    test = res["test"]
    assert set(test["per_session"]) == {"sessa0000", "sessb0000"}
    log_dir = tmp_path / "logs" / "multi_sessa_sessb"
    assert (log_dir / "model_best").exists()
    assert (log_dir / "test_results.npy").exists()


def test_multisession_resume_continues(two_sessions, tmp_path):
    """model_last (params+opt_state+epoch) round-trips through resume and
    the resumed run continues from the saved epoch with the saved best."""
    import yaml
    from video_spike_tpu.cli.train import main

    model_cfg = tmp_path / "vtt_tiny.yaml"
    model_cfg.write_text(yaml.safe_dump({
        "model_class": "VideoTransformer", "t_frames": 120, "t_bins": 100,
        "patch_size": 8, "hidden_size": 32, "frame_depth": 1,
        "temporal_depth": 1, "num_attention_heads": 4,
        "intermediate_size": 64}))
    args = ["--model_config", str(model_cfg),
            "--train_config", "configs/train/vtt_video.yaml",
            "--eid", "sessa0000,sessb0000",
            "--data_dir", str(two_sessions),
            "--batch_size", "4",
            "--log_dir", str(tmp_path / "logs")]
    main(args + ["--num_epochs", "2"])
    log_dir = tmp_path / "logs" / "multi_sessa_sessb"
    assert (log_dir / "model_last").exists()

    from video_spike_tpu.train import multisession as ms

    seen = []
    orig = ms.MultiSessionTrainer.train_epoch

    def spy(self):
        seen.append(self._start_epoch)
        return orig(self)

    ms.MultiSessionTrainer.train_epoch = spy
    try:
        main(args + ["--num_epochs", "4", "--resume"])
    finally:
        ms.MultiSessionTrainer.train_epoch = orig
    # resumed run started at epoch 2 (after the first run's 0..1)
    assert seen and seen[0] == 2, seen


def test_vtt_frame_stride(rng):
    """frame_stride=k encodes ceil(T/k) frames; output shape unchanged and
    the resample matrix matches the encoded frame count."""
    model = VideoTemporalTransformer.from_config(dict(TINY, frame_stride=2))
    video = jnp.asarray(rng.integers(0, 255, (2, 12, 1, 32, 32))
                        .astype(np.uint8))
    sids = jnp.zeros(2, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video, sids)
    out = model.apply(params, video, sids)
    assert out.shape == (2, 10, 10)
    assert params["params"]["time_resample"].shape == (6, 10)


def _tiny_trainer(two_sessions, tmp_path, **train_overrides):
    from video_spike_tpu.core.config import DictConfig
    from video_spike_tpu.train.multisession import MultiSessionTrainer

    config = DictConfig({
        "training": {"num_epochs": 2, "train_batch_size": 4,
                     "test_batch_size": 4, **train_overrides},
        "optimizer": {"lr": 1e-3, "wd": 0.01, "eps": 1e-8,
                      "warmup_pct": 0.15, "div_factor": 10},
        "save_plot": True,
    })
    trainer = MultiSessionTrainer(model=None, config=config,
                                  eids=["sessa0000", "sessb0000"],
                                  data_dir=str(two_sessions),
                                  log_dir=str(tmp_path))
    trainer.model = VideoTemporalTransformer.from_config(
        dict(TINY, n_sessions=2, max_neurons=trainer.max_neurons,
             t_frames=120, t_bins=100))
    return trainer


def test_multisession_async_best_and_figures(two_sessions, tmp_path,
                                             monkeypatch):
    """Best-checkpoint discipline parity with BaseTrainer (round-2 VERDICT):
    improvement epochs stash on device and flush through the async writer
    (no blocking device_get in the epoch loop); the figure channel records
    best-epoch plots in metrics.jsonl."""
    import json
    import os

    import video_spike_tpu.train.multisession as ms

    trainer = _tiny_trainer(two_sessions, tmp_path)
    async_calls, sync_calls = [], []
    real_async = ms.save_checkpoint_async
    real_sync = ms.save_checkpoint
    monkeypatch.setattr(ms, "save_checkpoint_async",
                        lambda d, n, t: (async_calls.append(n),
                                         real_async(d, n, t))[1])
    monkeypatch.setattr(ms, "save_checkpoint",
                        lambda d, n, t: (sync_calls.append(n),
                                         real_sync(d, n, t))[1])
    res = trainer.train()
    # the first improvement flushed best asynchronously; no synchronous
    # model_best write happened inside the epoch loop (only model_last at
    # the end, plus a final best flush IF a later epoch improved again)
    assert "model_best" in async_calls
    assert np.isfinite(res["best_eval_bps"])
    # on-device stash exists and drove the test eval without a disk reload
    assert trainer._best_params is not None
    # figure channel: jsonl records figure events with on-disk paths
    lines = [json.loads(l) for l in
             open(os.path.join(trainer.log_dir, "metrics.jsonl"))]
    figs = [l for l in lines if "figure" in l]
    assert figs and all(os.path.exists(f["path"]) for f in figs)


def test_multisession_eval_cache_cap_streams(two_sessions, tmp_path):
    """An eval split beyond the remaining device-cache budget streams
    instead of pinning HBM (round-2 ADVICE)."""
    trainer = _tiny_trainer(two_sessions, tmp_path, device_cache_gb=1e-9,
                            device_cache=False)
    trainer._device_cache_gb = 1e-9
    batch = next(iter(trainer.train_loaders["sessa0000"]))
    trainer._init_if_needed(np.asarray(batch["video"], np.uint8),
                            np.zeros(1, np.int32))
    ev1 = trainer._eval(trainer.val_loaders, "eval")
    assert trainer._eval_input_cache["eval"] is None      # marked too-big
    ev2 = trainer._eval(trainer.val_loaders, "eval")      # streams again
    assert ev1["eval_bps"] == ev2["eval_bps"]
