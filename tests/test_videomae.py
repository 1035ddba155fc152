"""VideoMAE: tubelet embed, pretraining loss, frozen probe."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_spike_tpu.models.videomae import (
    VideoMAEBackbone,
    VideoMAEForPreTraining,
    VideoMAEProbe,
    preprocess_frames,
    tubelet_patchify,
)

TINY = dict(image_size=32, patch_size=8, num_channels=3, num_frames=8,
            tubelet_size=2, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            encoder={"output_dim": 16}, decoder={"output_dim": 100 * 4})


def test_tubelet_patchify_roundtrip(rng):
    video = jnp.asarray(rng.normal(size=(2, 4, 3, 16, 16)).astype(np.float32))
    p = tubelet_patchify(video, 2, 8)
    assert p.shape == (2, 2 * 2 * 2, 2 * 8 * 8 * 3)


def test_preprocess_frames(rng):
    video = jnp.asarray(rng.integers(0, 255, (2, 120, 1, 64, 96))
                        .astype(np.uint8))
    out = preprocess_frames(video, num_frames=8, image_size=32,
                            source_frames=120)
    assert out.shape == (2, 8, 3, 32, 32)
    # imagenet normalization: grayscale input still differs per channel
    assert not np.allclose(np.asarray(out[:, :, 0]), np.asarray(out[:, :, 1]))


def test_backbone_seq_len(rng):
    model = VideoMAEBackbone(image_size=32, patch_size=8, num_frames=8,
                             tubelet_size=2, hidden_size=32,
                             num_hidden_layers=1, num_attention_heads=4,
                             intermediate_size=64)
    assert model.seq_len == 4 * 16
    video = jnp.asarray(np.zeros((2, 8, 3, 32, 32), np.float32))
    params = model.init(jax.random.PRNGKey(0), video)
    out = model.apply(params, video)
    assert out.shape == (2, 64, 32)


def test_pretraining_masked_loss(rng):
    model = VideoMAEForPreTraining(config=TINY)
    video = jnp.asarray(rng.normal(size=(2, 8, 3, 32, 32)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "masking": jax.random.PRNGKey(1)}, video)
    out = model.apply(params, video, mask_ratio=0.5,
                      rngs={"masking": jax.random.PRNGKey(2)})
    assert float(out["recon_loss"]) > 0
    assert out["mask"].shape == (2, 64)
    np.testing.assert_allclose(np.asarray(out["mask"]).sum(1), 32)


def test_probe_frozen_backbone(rng):
    model = VideoMAEProbe(config=TINY)
    video = jnp.asarray(rng.integers(0, 255, (2, 120, 1, 32, 32))
                        .astype(np.uint8))
    params = model.init(jax.random.PRNGKey(0), video)
    out = model.apply(params, video)
    assert out.shape == (2, 100, 4)

    # gradient must be zero for backbone params, nonzero for the heads
    def loss(p):
        return jnp.sum(model.apply(p, video) ** 2)

    g = jax.grad(loss)(params)
    backbone_g = jax.tree.leaves(g["params"]["video_mae"])
    head_g = jax.tree.leaves(g["params"]["encoder_head"])
    assert all(float(jnp.abs(x).max()) == 0 for x in backbone_g)
    assert any(float(jnp.abs(x).max()) > 0 for x in head_g)
