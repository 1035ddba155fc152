"""Rematerialization knob (``remat: true`` in model configs).

``jax.checkpoint`` on the transformer blocks trades one extra forward of
FLOPs for O(depth) less activation HBM — the standard TPU lever for
batch/model sizes past the recipe shapes (SURVEY.md §7 design stance; the
reference has no equivalent, torch's ``checkpoint`` is never used there).
The contract these tests pin: remat changes NOTHING observable except
memory — parameter trees, forward outputs, and gradients are identical, so
checkpoints are interchangeable across the setting.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_spike_tpu.core.registry import NAME2MODEL
from video_spike_tpu.models.vtt import VideoTemporalTransformer

VIT_CFG = dict(
    image_size=16, patch_size=8, num_channels=1, hidden_size=32,
    num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
    decoder_hidden_size=32, decoder_num_hidden_layers=1,
    decoder_num_attention_heads=4, decoder_intermediate_size=64,
    mask_ratio=0.5, norm_pix_loss=False, embed_size=3)


def _tree_paths(tree):
    return {jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_leaves_with_path(tree)}


@pytest.mark.slow
def test_vit_mae_remat_identical(rng):
    x = jnp.asarray(rng.normal(size=(4, 1, 16, 16)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    outs, grads, trees = [], [], []
    for remat in (False, True):
        model = NAME2MODEL["ContrastViTMAE"].from_config(
            dict(VIT_CFG, remat=remat))
        params = model.init({"params": key, "masking": key}, x)
        trees.append(_tree_paths(params))

        def loss_fn(p):
            out = model.apply(p, x, rngs={"masking": jax.random.PRNGKey(7)})
            return out["recon_loss"] + jnp.sum(out["z"] ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        outs.append(float(loss))
        grads.append(g)
    # the knob must not rename/reshape anything: checkpoints interchange
    assert trees[0] == trees[1]
    assert outs[0] == outs[1], outs
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_videomae_pretrain_remat_identical(rng):
    video = jnp.asarray(rng.normal(size=(2, 4, 3, 16, 16))
                        .astype(np.float32))
    key = jax.random.PRNGKey(1)
    cfg = dict(image_size=16, patch_size=8, num_channels=3, num_frames=4,
               tubelet_size=2, hidden_size=32, num_hidden_layers=1,
               num_attention_heads=2, intermediate_size=64)
    losses, trees = [], []
    for remat in (False, True):
        model = NAME2MODEL["VideoMAEForPreTraining"].from_config(
            dict(cfg, remat=remat))
        params = model.init({"params": key, "masking": key}, video)
        trees.append(_tree_paths(params))
        out = model.apply(params, video, mask_ratio=0.5,
                          rngs={"masking": jax.random.PRNGKey(3)})
        losses.append(float(out["recon_loss"]))
    assert trees[0] == trees[1]
    assert losses[0] == losses[1], losses


@pytest.mark.slow
def test_vtt_remat_identical(rng):
    video = jnp.asarray(rng.integers(0, 255, (2, 8, 1, 32, 32))
                        .astype(np.uint8))
    sids = jnp.zeros((2,), jnp.int32)
    key = jax.random.PRNGKey(2)
    outs, grad_norms, trees = [], [], []
    for remat in (False, True):
        model = VideoTemporalTransformer.from_config({
            "n_sessions": 2, "max_neurons": 8, "t_frames": 8,
            "t_bins": 10, "patch_size": 16, "hidden_size": 32,
            "frame_depth": 1, "temporal_depth": 1,
            "num_attention_heads": 2, "intermediate_size": 64,
            "remat": remat})
        params = model.init(key, video, sids)
        trees.append(_tree_paths(params))

        def loss_fn(p):
            return jnp.mean(model.apply(p, video, sids) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        outs.append(float(loss))
        grad_norms.append([float(jnp.linalg.norm(v.astype(jnp.float32)))
                           for v in jax.tree.leaves(g)])
    assert trees[0] == trees[1]
    assert outs[0] == outs[1], outs
    np.testing.assert_allclose(grad_norms[0], grad_norms[1],
                               rtol=1e-6, atol=1e-8)
