"""Signal / preprocessing ops: Gaussian smoothing, standardization, one-hot.

Parity targets:
- ``scipy.ndimage.gaussian_filter1d(y, sigma, axis)`` as used on spike counts
  (``/root/reference/src/train_rrr.py:118``) — reflect padding, truncate=4.
- ``_std`` (``/root/reference/src/utils/utils.py:107-112``): standardize over
  the leading (trial) axis with std clipped at 1e-8.
- ``_one_hot`` (``utils.py:114-119``): per-trial categorical -> (K, T, n_cats)
  indicator repeated across T timesteps.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * (x / sigma) ** 2)
    return phi / phi.sum()


def gaussian_filter1d(arr, sigma: float, axis: int = -1,
                      truncate: float = 4.0) -> jnp.ndarray:
    """Gaussian smoothing along one axis with scipy's 'reflect' boundary."""
    arr = jnp.asarray(arr, dtype=jnp.float32)
    radius = int(truncate * float(sigma) + 0.5)
    kernel = jnp.asarray(_gaussian_kernel1d(sigma, radius), dtype=jnp.float32)

    moved = jnp.moveaxis(arr, axis, -1)
    lead_shape = moved.shape[:-1]
    length = moved.shape[-1]
    flat = moved.reshape(-1, length)

    # scipy 'reflect' == (d c b a | a b c d | d c b a) == jnp 'symmetric'
    padded = jnp.pad(flat, ((0, 0), (radius, radius)), mode="symmetric")
    out = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="valid"))(padded)
    return jnp.moveaxis(out.reshape(*lead_shape, length), -1, axis)


def standardize(arr) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Standardize over the leading axis. Returns (standardized, mean, std);
    std clipped at 1e-8 (reference `_std`). Host-side numpy: this runs once
    per session during data prep, not in the train step."""
    arr = np.asarray(arr)
    mean = np.mean(arr, axis=0)
    std = np.clip(np.std(arr, axis=0), 1e-8, None)
    return (arr - mean) / std, mean, std


def one_hot_per_trial(arr, T: int, categories=None) -> np.ndarray:
    """Categorical per-trial values -> (K, T, n_categories) indicators.

    `arr` is (K,) or (K, 1); unique values are sorted and each becomes a
    channel that is constant across the T timesteps (reference `_one_hot`).
    Pass `categories` to pin the channel set (e.g. the union across splits,
    so train/test encodings stay aligned when a split misses a value).
    """
    arr = np.asarray(arr).reshape(len(arr), -1)[:, 0]
    cats = np.sort(np.unique(arr)) if categories is None \
        else np.sort(np.asarray(categories))
    out = np.zeros((len(arr), T, len(cats)))
    for i, c in enumerate(cats):
        out[:, :, i] = (arr == c)[:, None]
    return out


def minmax_per_trial(arr: np.ndarray) -> np.ndarray:
    """Min-max normalize each leading-axis slice to [0, 1]."""
    arr = np.asarray(arr, dtype=np.float64)
    lo = arr.min(axis=tuple(range(1, arr.ndim)), keepdims=True)
    hi = arr.max(axis=tuple(range(1, arr.ndim)), keepdims=True)
    return (arr - lo) / np.clip(hi - lo, 1e-12, None)
