"""StableHLO export: serialize -> deserialize -> outputs match apply, with
and without session ids; polymorphic batch where the lowering allows."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_spike_tpu.models.linear import LinearModel
from video_spike_tpu.serve.export import (export_forward, load_exported,
                                          save_exported)

N_FEAT = 24


@pytest.fixture(scope="module")
def linear():
    model = LinearModel(encoder_hidden=(16,), encoder_out=8,
                        decoder_hidden=(), output_dim=100 * 4,
                        compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, N_FEAT), jnp.float32))
    return model, params


def test_export_roundtrip_matches_apply(linear, tmp_path):
    model, params = linear
    rng = np.random.default_rng(0)
    sample = rng.normal(size=(4, N_FEAT)).astype(np.float32)
    path = save_exported(model, params, sample, tmp_path / "m.stablehlo")
    fn = load_exported(path)
    out = np.asarray(fn(sample))
    ref = np.asarray(model.apply(params, jnp.asarray(sample)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_export_polymorphic_batch(linear, tmp_path):
    """One artifact serves several batch sizes when exported symbolically."""
    model, params = linear
    rng = np.random.default_rng(1)
    sample = rng.normal(size=(4, N_FEAT)).astype(np.float32)
    fn = load_exported(
        save_exported(model, params, sample, tmp_path / "p.stablehlo"))
    for b in (1, 3, 8):
        x = rng.normal(size=(b, N_FEAT)).astype(np.float32)
        out = np.asarray(fn(x))
        ref = np.asarray(model.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_export_with_session_ids(tmp_path):
    from video_spike_tpu.models.vtt import VideoTemporalTransformer

    model = VideoTemporalTransformer(
        n_sessions=2, max_neurons=10, t_frames=12, t_bins=10, patch_size=8,
        hidden=32, frame_depth=1, temporal_depth=1, heads=4, mlp_dim=64)
    rng = np.random.default_rng(2)
    video = rng.integers(0, 255, (2, 12, 1, 32, 32), dtype=np.uint8)
    sids = np.asarray([0, 1], np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(video),
                        jnp.asarray(sids))
    data = export_forward(model, params, video, session_ids=sids)
    assert len(data) > 1000
    (tmp_path / "vtt.stablehlo").write_bytes(data)
    fn = load_exported(tmp_path / "vtt.stablehlo")
    out = np.asarray(fn(video, sids))
    ref = np.asarray(model.apply(params, jnp.asarray(video),
                                 jnp.asarray(sids)))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_export_cli(linear, tmp_path):
    from video_spike_tpu.cli.export_model import main
    from video_spike_tpu.train.checkpoint import save_checkpoint
    import yaml

    model, params = linear
    ckpt = tmp_path / "ckpt"
    save_checkpoint(ckpt, "model_best", {"params": params, "epoch": 0})
    cfg = tmp_path / "model.yaml"
    cfg.write_text(yaml.safe_dump({
        "model_class": "Linear",
        "encoder": {"hidden_dims": [16], "output_dim": 8},
        "decoder": {"hidden_dims": [], "output_dim": 400}}))
    out = main(["--model_config", str(cfg), "--ckpt_dir", str(ckpt),
                "--input_dim", str(N_FEAT),
                "--out", str(tmp_path / "m.stablehlo")])
    fn = load_exported(out)
    x = np.zeros((2, N_FEAT), np.float32)
    assert np.asarray(fn(x)).shape == (2, 100, 4)
