"""Dense optical flow (Farneback) in pure JAX, plus the reference's derived
whisker-flow features.

The reference ETL shells out to OpenCV's
``calcOpticalFlowFarneback(f1, f2, None, 0.5, 3, 15, 3, 5, 1.2, 0)`` per
frame pair and reduces the field to per-frame features
(``/root/reference/src/utils/ibl_data_utils.py:1103-1243``):

- ``of``: mean |flow| with each component clipped to its [10, 90] percentile,
  min-max normalized, last value repeated to T;
- ``of-2d``: per-frame spatial medians of |flow_x| and |flow_y|, min-max
  normalized, (T, 2);
- ``of-video``: the raw (T-1, H, W, 2) field.

The algorithm (Farneback 2003): per-pixel quadratic polynomial expansion
f(x) ~ x'Ax + b'x + c fit under a separable Gaussian applicability
(poly_n=5, poly_sigma=1.2), then iterative displacement refinement with a
box-filtered (winsize=15) normal-equation solve, over a 3-level image
pyramid (scale 0.5). Everything is expressed as separable convolutions and
elementwise solves, so XLA maps it onto the VPU and the per-frame-pair work
vmaps across the trial.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# polynomial expansion
# ---------------------------------------------------------------------------

def _poly_exp_kernels(n: int, sigma: float):
    """numpy (g, xg, xxg, x) — stay host-side so Gram scalars fold statically."""
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    xg = x * g
    xxg = x * x * g
    return g, xg, xxg, x


def _sepconv(img: jax.Array, kv, kh) -> jax.Array:
    """Separable 'same' correlation with replicate borders. img: (H, W).

    Two lax.conv calls (cross-correlation, no kernel flip) — one fused op per
    pass instead of per-row correlates.
    """
    kv = np.asarray(kv, np.float32)
    kh = np.asarray(kh, np.float32)
    rv = (len(kv) - 1) // 2
    rh = (len(kh) - 1) // 2
    p = jnp.pad(img, ((rv, rv), (rh, rh)), mode="edge")
    x = p[None, None, :, :]                       # NCHW
    kv_k = jnp.asarray(kv).reshape(1, 1, len(kv), 1)   # OIHW
    kh_k = jnp.asarray(kh).reshape(1, 1, 1, len(kh))
    x = jax.lax.conv_general_dilated(x, kv_k, (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, kh_k, (1, 1), "VALID")
    return x[0, 0]


def poly_exp(img: jax.Array, n: int = 5, sigma: float = 1.2
             ) -> Tuple[jax.Array, jax.Array]:
    """Quadratic expansion coefficients per pixel.

    Returns (A, b): A (H, W, 2, 2) symmetric, b (H, W, 2) — the local model
    f(x+dx) ~ dx'A dx + b'dx + c, least-squares fit under the Gaussian
    applicability.
    """
    g, xg, xxg, x = _poly_exp_kernels(n, sigma)

    # separable moment projections m_pq = sum w * x^p y^q * f
    m00 = _sepconv(img, g, g)
    m10 = _sepconv(img, g, xg)    # x = horizontal
    m01 = _sepconv(img, xg, g)    # y = vertical
    m20 = _sepconv(img, g, xxg)
    m02 = _sepconv(img, xxg, g)
    m11 = _sepconv(img, xg, xg)

    # Gram matrix entries of the weighted basis (1, x, y, x^2, y^2, xy);
    # separable Gaussian weights make it sparse: only (1, x^2, y^2) couple.
    w = np.asarray(g, np.float64)
    s0 = w.sum()                      # <1,1> in 1-D (=1)
    s2 = (w * x * x).sum()            # <x,x>
    s4 = (w * x ** 4).sum()           # <x^2,x^2>
    # 2-D inner products
    i_11 = s0 * s0
    i_1x2 = s2 * s0                   # <1, x^2>
    i_x2x2 = s4 * s0                  # <x^2, x^2>
    i_x2y2 = s2 * s2                  # <x^2, y^2>
    i_xx = s2 * s0                    # <x, x>
    i_xyxy = s2 * s2                  # <xy, xy>

    # solve the coupled (c, a_xx, a_yy) block; b_x, b_y, a_xy decouple
    M = np.array([[i_11, i_1x2, i_1x2],
                  [i_1x2, i_x2x2, i_x2y2],
                  [i_1x2, i_x2y2, i_x2x2]])
    Minv = np.linalg.inv(M)
    Minv = jnp.asarray(Minv, jnp.float32)

    rhs = jnp.stack([m00, m20, m02], axis=-1)
    sol = rhs @ Minv.T
    a_xx = sol[..., 1]
    a_yy = sol[..., 2]
    b_x = m10 / i_xx
    b_y = m01 / i_xx
    a_xy = m11 / i_xyxy

    A = jnp.stack([
        jnp.stack([a_xx, a_xy / 2], axis=-1),
        jnp.stack([a_xy / 2, a_yy], axis=-1),
    ], axis=-2)
    b = jnp.stack([b_x, b_y], axis=-1)
    return A, b


# ---------------------------------------------------------------------------
# displacement estimation
# ---------------------------------------------------------------------------

def _bilinear_warp(field: jax.Array, flow: jax.Array) -> jax.Array:
    """Sample `field` (H, W, C) at x + flow with clamped bilinear lookup."""
    H, W = field.shape[:2]
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    sx = jnp.clip(xx + flow[..., 0], 0.0, W - 1.0)
    sy = jnp.clip(yy + flow[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    v00 = field[y0, x0]
    v01 = field[y0, x1]
    v10 = field[y1, x0]
    v11 = field[y1, x1]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _box_blur(img: jax.Array, winsize: int) -> jax.Array:
    k = np.ones((winsize,), np.float32) / winsize
    return _sepconv(img, k, k)


def _flow_iteration(A1, b1, A2, b2, flow, winsize):
    """One Farneback displacement update."""
    A2w = _bilinear_warp(A2.reshape(*A2.shape[:2], 4), flow).reshape(A2.shape)
    b2w = _bilinear_warp(b2, flow)
    A = 0.5 * (A1 + A2w)
    # db = -(b2(x+d) - b1(x))/2 + A d  (normal-equation right-hand side)
    db = -0.5 * (b2w - b1) + jnp.einsum("hwij,hwj->hwi", A, flow)

    # accumulate G = A'A and h = A'db, then window-average (box, flags=0)
    g11 = _box_blur(A[..., 0, 0] ** 2 + A[..., 0, 1] ** 2, winsize)
    g12 = _box_blur(A[..., 0, 0] * A[..., 1, 0] + A[..., 0, 1] * A[..., 1, 1],
                    winsize)
    g22 = _box_blur(A[..., 1, 0] ** 2 + A[..., 1, 1] ** 2, winsize)
    h1 = _box_blur(A[..., 0, 0] * db[..., 0] + A[..., 0, 1] * db[..., 1],
                   winsize)
    h2 = _box_blur(A[..., 1, 0] * db[..., 0] + A[..., 1, 1] * db[..., 1],
                   winsize)

    det = g11 * g22 - g12 * g12
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    new_x = (g22 * h1 - g12 * h2) / det
    new_y = (g11 * h2 - g12 * h1) / det
    return jnp.stack([new_x, new_y], axis=-1)


def _downscale(img: jax.Array, scale: float) -> jax.Array:
    """Gaussian-smooth + resize one pyramid level (OpenCV recipe)."""
    sigma = (1.0 / scale - 1.0)
    n = int(round(sigma * 5)) | 1
    x = np.arange(-(n // 2), n // 2 + 1, dtype=np.float64)
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    sm = _sepconv(img, g, g)
    H, W = img.shape
    return jax.image.resize(sm, (max(int(round(H * scale)), 2),
                                 max(int(round(W * scale)), 2)), "linear")


@partial(jax.jit, static_argnames=("pyr_scale", "levels", "winsize",
                                   "iterations", "poly_n", "poly_sigma"))
def farneback_flow(prev: jax.Array, nxt: jax.Array, pyr_scale: float = 0.5,
                   levels: int = 3, winsize: int = 15, iterations: int = 3,
                   poly_n: int = 5, poly_sigma: float = 1.2) -> jax.Array:
    """Dense flow (H, W, 2) from `prev` to `nxt` (grayscale float images)."""
    prev = prev.astype(jnp.float32)
    nxt = nxt.astype(jnp.float32)

    pyramid = [(prev, nxt)]
    for _ in range(levels - 1):
        p, q = pyramid[-1]
        if min(p.shape) * pyr_scale < max(poly_n * 2, 8):
            break
        pyramid.append((_downscale(p, pyr_scale), _downscale(q, pyr_scale)))

    flow = jnp.zeros((*pyramid[-1][0].shape, 2), jnp.float32)
    for li in range(len(pyramid) - 1, -1, -1):
        p, q = pyramid[li]
        if flow.shape[:2] != p.shape:
            scale_y = p.shape[0] / flow.shape[0]
            scale_x = p.shape[1] / flow.shape[1]
            flow = jax.image.resize(flow, (*p.shape, 2), "linear")
            flow = flow * jnp.asarray([scale_x, scale_y], jnp.float32)
        A1, b1 = poly_exp(p, poly_n, poly_sigma)
        A2, b2 = poly_exp(q, poly_n, poly_sigma)
        for _ in range(iterations):
            flow = _flow_iteration(A1, b1, A2, b2, flow, winsize)
    return flow


def _minmax(v: np.ndarray) -> np.ndarray:
    lo, hi = np.min(v), np.max(v)
    return (v - lo) / (hi - lo) if hi > lo else np.zeros_like(v)


def get_optic_flow(video: np.ndarray, backend: str = "jax") -> Dict:
    """Per-trial flow features with the reference's reductions.

    `video`: (T, H, W) grayscale. Returns {'of', 'of-2d', 'of-video', 'me'}
    (the reference also computes frame-difference motion energy inline).

    `backend`: 'jax' (host CPU — flow is an offline ETL op and the large
    unrolled pyramid program compiles in seconds there, vs minutes through a
    remote TPU compile service), 'jax-accel' (default jax device), or 'cv2'.
    """
    video = np.asarray(video, dtype=np.float32)
    me = np.mean(np.abs(np.diff(video, axis=0)), axis=(1, 2))
    me = _minmax(me)

    if backend == "cv2":
        import cv2
        fields = np.stack([
            cv2.calcOpticalFlowFarneback(video[i], video[i + 1], None,
                                         0.5, 3, 15, 3, 5, 1.2, 0)
            for i in range(len(video) - 1)], axis=0)
    else:
        flow_fn = jax.vmap(farneback_flow)
        if backend == "jax":
            cpus = jax.devices("cpu")
            with jax.default_device(cpus[0]):
                fields = np.asarray(flow_fn(jnp.asarray(video[:-1]),
                                            jnp.asarray(video[1:])))
        else:
            fields = np.asarray(flow_fn(jnp.asarray(video[:-1]),
                                        jnp.asarray(video[1:])))

    raw = fields.copy()
    absf = np.abs(fields)
    vec_x_med = _minmax(np.median(absf[..., 0], axis=(1, 2)))
    vec_y_med = _minmax(np.median(absf[..., 1], axis=(1, 2)))
    clip = absf.copy()
    for c in range(2):
        clip[..., c] = np.clip(clip[..., c],
                               np.percentile(clip[..., c], 10),
                               np.percentile(clip[..., c], 90))
    clip_of = _minmax(np.mean(clip, axis=(1, 2, 3)))

    rep = lambda v: np.append(v, v[-1])
    return {
        "of": rep(clip_of),
        "of-2d": np.stack([rep(vec_x_med), rep(vec_y_med)], axis=1),
        "of-video": raw,
        "me": rep(me),
    }
