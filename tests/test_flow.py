"""Optical flow: recover known translations; agree with cv2 Farneback."""

import numpy as np
import pytest

from video_spike_tpu.ops.flow import farneback_flow, get_optic_flow

cv2 = pytest.importorskip("cv2")


def _textured_frame(rng, h=64, w=64):
    """Smooth random texture with enough gradient for flow estimation."""
    img = rng.normal(size=(h, w))
    img = cv2.GaussianBlur(img, (0, 0), 3)
    img = (img - img.min()) / (img.max() - img.min()) * 255
    return img.astype(np.float32)


def _shift(img, dx, dy):
    m = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, m, (img.shape[1], img.shape[0]),
                          flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT)


@pytest.mark.parametrize("dx,dy", [(2.0, 0.0), (0.0, -1.5), (1.0, 1.0)])
def test_flow_recovers_translation(rng, dx, dy):
    f1 = _textured_frame(rng)
    f2 = _shift(f1, dx, dy)
    flow = np.asarray(farneback_flow(f1, f2))
    # interior median should match the true shift
    inner = flow[16:-16, 16:-16]
    assert abs(np.median(inner[..., 0]) - dx) < 0.3, np.median(inner[..., 0])
    assert abs(np.median(inner[..., 1]) - dy) < 0.3, np.median(inner[..., 1])


def test_flow_close_to_cv2(rng):
    f1 = _textured_frame(rng)
    f2 = _shift(f1, 1.5, -0.8)
    ours = np.asarray(farneback_flow(f1, f2))
    ref = cv2.calcOpticalFlowFarneback(f1, f2, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    inner = np.s_[16:-16, 16:-16]
    # medians of each component agree closely
    for c in range(2):
        a = np.median(ours[inner][..., c])
        b = np.median(ref[inner][..., c])
        assert abs(a - b) < 0.25, (c, a, b)
    # pixelwise agreement in the interior is decent
    err = np.abs(ours[inner] - ref[inner]).mean()
    assert err < 0.4, err


def test_get_optic_flow_features(rng):
    t, h, w = 12, 48, 48
    base = _textured_frame(rng, h, w)
    # sinusoidally varying motion so the min-max-normalized features have a
    # well-conditioned range (constant motion would amplify estimator noise)
    pos = np.cumsum(1.5 * np.sin(np.arange(t) / 2.0))
    video = np.stack([_shift(base, pos[i], -0.5 * pos[i]) for i in range(t)])
    feats = get_optic_flow(video)
    assert feats["of"].shape == (t,)
    assert feats["of-2d"].shape == (t, 2)
    assert feats["of-video"].shape == (t - 1, h, w, 2)
    assert feats["me"].shape == (t,)
    for k in ("of", "me"):
        assert feats[k].min() >= 0 and feats[k].max() <= 1

    # jax and cv2 backends produce closely matching summary features
    ref = get_optic_flow(video, backend="cv2")
    np.testing.assert_allclose(feats["of"], ref["of"], atol=0.15)
    np.testing.assert_allclose(feats["of-2d"], ref["of-2d"], atol=0.2)
