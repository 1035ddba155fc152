"""ViT-MAE family: masking, patchify, shapes, losses, wrappers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_spike_tpu.models.vit_mae import (
    MAE,
    ContrastViT,
    ContrastViTMAE,
    ViTMAEBackbone,
    patchify,
    random_masking,
    sincos_pos_embed_2d,
    unpatchify,
)

TINY = dict(image_size=32, patch_size=8, num_channels=1, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, decoder_hidden_size=32,
            decoder_num_hidden_layers=1, decoder_num_attention_heads=4,
            decoder_intermediate_size=64, mask_ratio=0.75,
            norm_pix_loss=False, embed_size=3)


def test_random_masking_properties(rng):
    x = jnp.asarray(rng.normal(size=(4, 16, 8)).astype(np.float32))
    xm, mask, ids_restore = random_masking(x, 0.75, jax.random.PRNGKey(0))
    assert xm.shape == (4, 4, 8)          # 25% kept
    assert mask.shape == (4, 16)
    np.testing.assert_allclose(np.asarray(mask).sum(axis=1), 12)  # 75% removed
    # restore indices are a permutation
    ids = np.asarray(ids_restore)
    for b in range(4):
        assert sorted(ids[b]) == list(range(16))
    # kept positions (mask==0) carry the original tokens after restore
    full = jnp.concatenate(
        [xm, jnp.zeros((4, 12, 8))], axis=1)
    restored = jnp.take_along_axis(full, ids_restore[:, :, None], axis=1)
    kept = np.asarray(mask) == 0
    np.testing.assert_allclose(np.asarray(restored)[kept],
                               np.asarray(x)[kept], rtol=1e-6)


def test_masking_zero_ratio(rng):
    x = jnp.asarray(rng.normal(size=(2, 9, 4)).astype(np.float32))
    xm, mask, _ = random_masking(x, 0.0, jax.random.PRNGKey(0))
    assert xm.shape == x.shape
    assert float(jnp.sum(mask)) == 0.0


def test_patchify_roundtrip(rng):
    imgs = jnp.asarray(rng.normal(size=(2, 3, 16, 16)).astype(np.float32))
    p = patchify(imgs, 8)
    assert p.shape == (2, 4, 192)
    back = unpatchify(p, 8, 3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(imgs), rtol=1e-6)


def test_pos_embed_shape():
    pe = sincos_pos_embed_2d(64, 4)
    assert pe.shape == (17, 64)
    assert np.allclose(pe[0], 0)  # cls slot zero


@pytest.fixture(scope="module")
def tiny_imgs():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(4, 1, 32, 32)).astype(np.float32))


def test_backbone_forward(tiny_imgs):
    kwargs = {k: v for k, v in TINY.items() if k != "embed_size"}
    model = ViTMAEBackbone(**kwargs)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "masking": jax.random.PRNGKey(1)}, tiny_imgs)
    cls_latent, loss = model.apply(params, tiny_imgs,
                                   rngs={"masking": jax.random.PRNGKey(2)})
    assert cls_latent.shape == (4, 64)
    assert float(loss) > 0
    # zero mask ratio -> loss is 0/eps-guarded (no masked patches)
    _, loss0 = model.apply(params, tiny_imgs, mask_ratio=0.0)
    assert float(loss0) == 0.0


def test_mae_wrapper_normalized(tiny_imgs):
    model = MAE(config=TINY)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "masking": jax.random.PRNGKey(1)}, tiny_imgs)
    out = model.apply(params, tiny_imgs,
                      rngs={"masking": jax.random.PRNGKey(2)})
    assert set(out) == {"z", "recon_loss"}
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out["z"]), axis=1),
                               1.0, rtol=1e-5)


def test_contrast_vit_no_masking(tiny_imgs):
    model = ContrastViT(config=TINY)
    params = model.init(jax.random.PRNGKey(0), tiny_imgs)
    out = model.apply(params, tiny_imgs)
    assert set(out) == {"z", "temp"}
    assert out["z"].shape == (4, 3)
    assert abs(float(out["temp"]) - 1.0) < 1e-6  # exp(0) init
    # deterministic (no masking rng needed)
    out2 = model.apply(params, tiny_imgs)
    np.testing.assert_allclose(np.asarray(out["z"]), np.asarray(out2["z"]))


def test_contrast_vit_mae_full(tiny_imgs):
    model = ContrastViTMAE(config=TINY)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "masking": jax.random.PRNGKey(1)}, tiny_imgs)
    out = model.apply(params, tiny_imgs,
                      rngs={"masking": jax.random.PRNGKey(2)})
    assert set(out) == {"z", "recon_loss", "temp"}
    # gradient flows into both the backbone and the projection
    def loss(p):
        o = model.apply(p, tiny_imgs, rngs={"masking": jax.random.PRNGKey(2)})
        return o["recon_loss"] + jnp.sum(o["z"] ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_recon_loss_decreases_with_training(tiny_imgs):
    """Few AdamW steps on fixed images should reduce reconstruction loss."""
    import optax

    model = MAE(config=TINY)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "masking": jax.random.PRNGKey(1)}, tiny_imgs)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            return model.apply(p, tiny_imgs, rngs={"masking": key})["recon_loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(30):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses[:3] + losses[-3:]
