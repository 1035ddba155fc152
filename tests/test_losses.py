"""Golden tests for Poisson NLL and contrastive losses vs torch (CPU)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from video_spike_tpu.ops.contrastive import (
    clip_contrastive_loss,
    dot_similarity,
    euclidean_similarity,
    info_nce,
    infonce_from_dists,
    loss_fn_,
)
from video_spike_tpu.ops.poisson import poisson_nll, poisson_nll_mean


def test_poisson_nll_matches_torch(rng):
    x = rng.normal(size=(4, 10, 7)).astype(np.float32)
    t = rng.poisson(1.0, size=(4, 10, 7)).astype(np.float32)
    ours = np.asarray(poisson_nll(jnp.asarray(x), jnp.asarray(t)))
    ref = torch.nn.PoissonNLLLoss(log_input=True, reduction="none")(
        torch.from_numpy(x), torch.from_numpy(t)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_poisson_nll_mean_and_grad(rng):
    x = rng.normal(size=(8, 100, 32)).astype(np.float32)
    t = rng.poisson(1.0, size=(8, 100, 32)).astype(np.float32)
    ours = float(poisson_nll_mean(jnp.asarray(x), jnp.asarray(t)))
    ref = float(torch.nn.PoissonNLLLoss(log_input=True)(
        torch.from_numpy(x), torch.from_numpy(t)))
    assert np.isclose(ours, ref, rtol=1e-5)

    g = jax.grad(lambda a: poisson_nll_mean(a, jnp.asarray(t)))(jnp.asarray(x))
    xt = torch.from_numpy(x).requires_grad_(True)
    torch.nn.PoissonNLLLoss(log_input=True)(xt, torch.from_numpy(t)).backward()
    np.testing.assert_allclose(np.asarray(g), xt.grad.numpy(),
                               rtol=1e-4, atol=1e-6)


def _torch_info_nce(ref, pos, neg, tau=1.0):
    ref, pos, neg = map(torch.from_numpy, (ref, pos, neg))
    pos_dist = torch.einsum("nd,nd->n", ref, pos) / tau
    neg_dist = torch.einsum("nd,md->nm", ref, neg) / tau
    c, _ = neg_dist.max(dim=1, keepdim=True)
    pos_dist = pos_dist - c.squeeze(1)
    neg_dist = neg_dist - c
    pos_loss = -pos_dist.mean()
    neg_loss = torch.logsumexp(neg_dist, dim=1).mean()
    return float(pos_loss + neg_loss), float(pos_loss), float(neg_loss)


def test_info_nce_matches_reference_math(rng):
    n, d = 32, 8
    ref = rng.normal(size=(n, d)).astype(np.float32)
    pos = rng.normal(size=(n, d)).astype(np.float32)
    neg = rng.normal(size=(n, d)).astype(np.float32)
    for tau in (1.0, 0.1):
        out = info_nce(jnp.asarray(ref), jnp.asarray(pos), jnp.asarray(neg), tau)
        want_loss, want_pos, want_neg = _torch_info_nce(ref, pos, neg, tau)
        assert np.isclose(float(out["loss"]), want_loss, rtol=1e-4)
        assert np.isclose(float(out["pos_loss"]), want_pos, rtol=1e-4)
        assert np.isclose(float(out["neg_loss"]), want_neg, rtol=1e-4)


def test_similarities(rng):
    n, d = 6, 4
    r, p, ng = (rng.normal(size=(n, d)).astype(np.float32) for _ in range(3))
    pd, nd = dot_similarity(*map(jnp.asarray, (r, p, ng)))
    np.testing.assert_allclose(np.asarray(pd), np.einsum("ni,ni->n", r, p),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nd), r @ ng.T, rtol=1e-5)
    pe, ne = euclidean_similarity(*map(jnp.asarray, (r, p, ng)))
    want_pe = -np.sum((r - p) ** 2, axis=1)
    want_ne = -((r[:, None] - ng[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(pe), want_pe, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ne), want_ne, rtol=1e-4, atol=1e-5)


def test_loss_fn_dispatch(rng):
    z = rng.normal(size=(8, 3)).astype(np.float32)
    z = z / np.linalg.norm(z, axis=1, keepdims=True)
    recon = jnp.float32(0.5)
    mk = lambda **kw: {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                       for k, v in kw.items()}
    # MAE-only
    out = loss_fn_(mk(recon_loss=recon, z=z), None, None)
    assert np.isclose(float(out["loss"]), 0.5)
    # contrast + recon
    trip = [mk(z=z, recon_loss=recon, temp=jnp.float32(1.0)) for _ in range(3)]
    out = loss_fn_(*trip)
    assert "contrast_loss" in out and "recon_loss" in out
    assert np.isclose(float(out["recon_loss"]), 0.5)
    # z + temp only
    trip = [mk(z=z, temp=jnp.float32(1.0)) for _ in range(3)]
    out = loss_fn_(*trip)
    assert set(out) == {"loss", "pos_loss", "neg_loss"}


def test_clip_loss_identity_alignment():
    sim = 10.0 * jnp.eye(8)
    loss, acc = clip_contrastive_loss(sim)
    assert float(acc) == 1.0
    assert float(loss) < 0.01


def test_infonce_from_dists(rng):
    pd = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))
    nd = jnp.asarray(rng.normal(size=(5, 5)).astype(np.float32))
    loss, align, uniform = infonce_from_dists(pd, nd)
    assert np.isclose(float(loss), float(align) + float(uniform), rtol=1e-6)
