"""CEBRA-style temporal contrastive embedder and PCA embedding.

The reference calls the external ``cebra`` package
(``/root/reference/src/utils/utils.py:306-360``: offset10-model, out_dim 3-5,
5000 iterations, batch 512) to embed whisker-video frames, and sklearn PCA as
a baseline. This module provides the framework's own TPU-native equivalents:

- :class:`CEBRA`: a 1-D temporal conv encoder with a 10-frame receptive
  field (kernel 2 then three residual kernel-3 blocks then kernel 3 — the
  "offset10" layout), trained with the InfoNCE objective and temporal
  positive sampling, jitted end-to-end;
- :func:`get_cebra_embedding` / :func:`get_pca_embedding` with the
  reference's (N, T, C, H, W) video conventions and output shapes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from video_spike_tpu.ops.contrastive import info_nce

RECEPTIVE_FIELD = 10


class Offset10Encoder(nn.Module):
    """Temporal conv encoder, receptive field 10, normalized output."""

    num_units: int = 32
    out_dim: int = 3
    dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T, d)
        x = nn.Conv(self.num_units, kernel_size=(2,), padding="VALID")(x)
        x = nn.gelu(x)
        for _ in range(3):
            y = nn.Conv(self.num_units, kernel_size=(3,), padding="VALID")(x)
            y = nn.gelu(y)
            x = x[:, 1:-1] + y  # residual, trimmed to VALID output
        x = nn.Conv(self.out_dim, kernel_size=(3,), padding="VALID")(x)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.clip(norm, 1e-12)


class CEBRA:
    """Temporal-contrastive embedding with the CEBRA training recipe."""

    def __init__(self, output_dimension: int = 3, num_units: int = 32,
                 batch_size: int = 512, max_iterations: int = 5000,
                 time_offset: int = 10, learning_rate: float = 3e-4,
                 temperature: float = 1.0, seed: int = 0):
        self.out_dim = output_dimension
        self.batch_size = batch_size
        self.max_iterations = max_iterations
        self.time_offset = time_offset
        self.temperature = temperature
        self.model = Offset10Encoder(num_units, output_dimension)
        self.tx = optax.adam(learning_rate)
        self.key = jax.random.PRNGKey(seed)
        self.params = None
        self.losses_: list = []

    # ------------------------------------------------------------------
    def _windows(self, X: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
        """Gather (B, RECEPTIVE_FIELD, d) windows ending at idx."""
        offs = jnp.arange(RECEPTIVE_FIELD)
        gather = idx[:, None] + offs[None, :]
        return X[gather]

    def fit(self, X: np.ndarray) -> "CEBRA":
        """X: (n_samples, d) time series."""
        X = jnp.asarray(np.asarray(X, dtype=np.float32))
        n = X.shape[0]
        max_start = n - RECEPTIVE_FIELD - self.time_offset - 1
        assert max_start > 1, f"series too short: {n}"

        self.params = self.model.init(
            self.key, jnp.zeros((1, RECEPTIVE_FIELD, X.shape[1])))
        opt_state = self.tx.init(self.params)
        model, tx, temp = self.model, self.tx, self.temperature
        windows, toff, bs = self._windows, self.time_offset, self.batch_size

        def loss_fn(params, X, key):
            k1, k2, k3 = jax.random.split(key, 3)
            anchor = jax.random.randint(k1, (bs,), 0, max_start)
            delta = jax.random.randint(k2, (bs,), 1, toff + 1)
            negi = jax.random.randint(k3, (bs,), 0, max_start)
            ref = model.apply(params, windows(X, anchor))[:, 0]
            pos = model.apply(params, windows(X, anchor + delta))[:, 0]
            neg = model.apply(params, windows(X, negi))[:, 0]
            return info_nce(ref, pos, neg, temp)["loss"]

        # The whole fit is ONE device program: a lax.scan over iterations
        # instead of a Python loop of per-step dispatches (the reference
        # drives torch one step at a time; here 5000 host dispatches
        # through the device link cost ~40 ms each — 201 s of overhead for
        # ~1 s of compute). X is a jit ARGUMENT, not a closure capture: a
        # captured array is baked into the program as a constant, which
        # bloats the HLO by the dataset size (a 60k-frame session is
        # ~384 MB — the remote TPU compile service rejects it, HTTP 413).
        @jax.jit
        def run(params, opt_state, X, base_key):
            def body(carry, i):
                params, opt_state = carry
                key = jax.random.fold_in(base_key, i)
                loss, grads = jax.value_and_grad(loss_fn)(params, X, key)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(self.max_iterations))
            return params, losses

        params, losses = run(self.params, opt_state, X, self.key)
        # same trace the per-step loop recorded: every 100th iteration
        self.losses_ = [float(l) for l in np.asarray(losses)[::100]]
        self.params = params
        return self

    def transform(self, X: np.ndarray) -> np.ndarray:
        """Embed every timestep; edges are replicate-padded so the output
        length matches the input (cebra.transform convention)."""
        assert self.params is not None, "fit first"
        X = np.asarray(X, dtype=np.float32)
        left = RECEPTIVE_FIELD // 2
        right = RECEPTIVE_FIELD - 1 - left
        Xp = np.concatenate([np.repeat(X[:1], left, 0), X,
                             np.repeat(X[-1:], right, 0)], axis=0)
        out = jax.jit(self.model.apply)(self.params,
                                        jnp.asarray(Xp)[None])[0]
        emb = np.asarray(out)
        assert emb.shape[0] == X.shape[0], (emb.shape, X.shape)
        return emb


def get_cebra_embedding(video: np.ndarray, out_dim: int = 3,
                        save_path: Optional[str] = None,
                        max_iterations: int = 5000,
                        batch_size: int = 512) -> np.ndarray:
    """(N, T, C, H, W) grayscale video -> (N, T, out_dim) embedding
    (parity with ``/root/reference/src/utils/utils.py:306-330``)."""
    video = np.asarray(video)
    data = video.squeeze(2) if video.ndim == 5 else video
    n, t = data.shape[:2]
    flat = data.reshape(n * t, -1)
    model = CEBRA(output_dimension=out_dim, batch_size=batch_size,
                  max_iterations=max_iterations)
    model.fit(flat)
    emb = model.transform(flat)
    assert emb.shape == (n * t, out_dim)
    if save_path:
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.plot(model.losses_)
        ax.set_xlabel("iteration / 100")
        ax.set_ylabel("InfoNCE loss")
        fig.savefig(save_path + "_loss.png")
        plt.close(fig)
        from video_spike_tpu.viz.embeddings import plot_embeddings
        fig = plot_embeddings(emb[:2000])
        fig.savefig(save_path + "_embedding.png")
    return emb.reshape(n, t, out_dim)


def get_pca_embedding(video: np.ndarray, out_dim: int = 5) -> np.ndarray:
    """(N, T, C, H, W) video -> (N, T, out_dim) PCA projection, computed via
    the Gram-matrix eigendecomposition on device (D can be ~10^4 pixels but
    n*t is small, so the n x n path is the cheap one)."""
    video = np.asarray(video)
    data = video.squeeze(2) if video.ndim == 5 else video
    n, t = data.shape[:2]
    flat = jnp.asarray(data.reshape(n * t, -1), dtype=jnp.float32)
    centered = flat - jnp.mean(flat, axis=0, keepdims=True)
    m, d = centered.shape
    if m <= d:
        gram = centered @ centered.T
        vals, vecs = jnp.linalg.eigh(gram)
        order = jnp.argsort(vals)[::-1][:out_dim]
        # principal scores = U * s = eigvecs * sqrt(eigvals)
        emb = vecs[:, order] * jnp.sqrt(jnp.clip(vals[order], 0))
    else:
        cov = centered.T @ centered
        vals, vecs = jnp.linalg.eigh(cov)
        order = jnp.argsort(vals)[::-1][:out_dim]
        emb = centered @ vecs[:, order]
    emb = np.asarray(emb)
    assert emb.shape == (m, out_dim)
    return emb.reshape(n, t, out_dim)
