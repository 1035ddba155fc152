"""CEBRA-style embedder + PCA: shapes, convergence, CLI path."""

import os

import numpy as np
import pytest

from video_spike_tpu.models.cebra import (
    CEBRA,
    get_cebra_embedding,
    get_pca_embedding,
)


def _latent_series(n=1200, d=40, seed=0):
    """Time series driven by a slow 2-D latent + noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    latent = np.stack([np.sin(2 * np.pi * t / 200),
                       np.cos(2 * np.pi * t / 317)], axis=1)
    mix = rng.normal(size=(2, d))
    return latent @ mix + 0.1 * rng.normal(size=(n, d)), latent


def test_cebra_fit_transform_shapes():
    X, _ = _latent_series()
    model = CEBRA(output_dimension=3, max_iterations=50, batch_size=64)
    model.fit(X)
    emb = model.transform(X)
    assert emb.shape == (1200, 3)
    # normalized embeddings
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-4)


@pytest.fixture(scope="module")
def fitted_cebra():
    """One 600-iteration fit shared by the convergence + structure tests
    (identical hyperparameters; fitting twice cost the suite ~40 s)."""
    X, _ = _latent_series()
    model = CEBRA(output_dimension=3, max_iterations=600, batch_size=128)
    model.fit(X)
    return model, X


@pytest.mark.slow
def test_cebra_loss_decreases(fitted_cebra):
    model, _ = fitted_cebra
    assert model.losses_[-1] < model.losses_[0] - 0.1, model.losses_


def test_cebra_temporal_structure(fitted_cebra):
    """Neighboring frames should be closer in embedding space than random."""
    model, X = fitted_cebra
    emb = model.transform(X)
    d_neighbor = np.linalg.norm(emb[1:] - emb[:-1], axis=1).mean()
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(emb))
    d_random = np.linalg.norm(emb[perm] - emb, axis=1).mean()
    assert d_neighbor < 0.5 * d_random, (d_neighbor, d_random)


def test_pca_embedding_matches_sklearn(rng):
    video = rng.normal(size=(4, 30, 1, 8, 10)).astype(np.float32)
    emb = get_pca_embedding(video, out_dim=3)
    assert emb.shape == (4, 30, 3)
    from sklearn.decomposition import PCA
    flat = video.squeeze(2).reshape(120, -1)
    ref = PCA(n_components=3).fit_transform(flat).reshape(4, 30, 3)
    # PCA components are sign/rotation ambiguous only up to sign per component
    for k in range(3):
        a, b = emb[..., k].ravel(), ref[..., k].ravel()
        corr = abs(np.corrcoef(a, b)[0, 1])
        assert corr > 0.99, (k, corr)


def test_get_cebra_embedding_video_shape(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    video = rng.integers(0, 255, (3, 60, 1, 8, 8)).astype(np.float32)
    emb = get_cebra_embedding(video, out_dim=3, max_iterations=20,
                              batch_size=32, save_path="t")
    assert emb.shape == (3, 60, 3)
    assert os.path.exists("t_loss.png") and os.path.exists("t_embedding.png")
