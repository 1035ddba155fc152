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


def test_hf_weight_conversion_golden(rng):
    """Converted HF VideoMAEModel weights reproduce torch outputs."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from video_spike_tpu.models.hf_convert import convert_hf_videomae

    cfg = transformers.VideoMAEConfig(
        image_size=32, patch_size=8, num_channels=3, num_frames=4,
        tubelet_size=2, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48, use_mean_pooling=True)
    torch.manual_seed(0)
    hf = transformers.VideoMAEModel(cfg).eval()
    video = rng.normal(size=(2, 4, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(video)).last_hidden_state.numpy()

    backbone = VideoMAEBackbone(
        image_size=32, patch_size=8, num_channels=3, num_frames=4,
        tubelet_size=2, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48, hf_compat=True,
        dtype=jnp.float32)
    converted = convert_hf_videomae(hf.state_dict(), num_layers=2)
    out = backbone.apply({"params": converted}, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_hf_conversion_rejects_bad_tree(rng):
    from video_spike_tpu.models.hf_convert import (
        convert_hf_videomae,
        graft_backbone_into_probe,
    )

    with pytest.raises(KeyError):
        convert_hf_videomae({"bogus": np.zeros(3)}, num_layers=1)

    model = VideoMAEProbe(config=TINY)
    video = jnp.zeros((1, 120, 1, 32, 32), jnp.uint8)
    params = model.init(jax.random.PRNGKey(0), video)
    with pytest.raises(ValueError):
        graft_backbone_into_probe(params, {"patch_embed": {}, "encoder": {}})


@pytest.mark.slow
def test_pretrain_to_probe_graft_beats_random(rng):
    """Grafting a pretrained encoder into the frozen probe must (a) load
    cleanly, (b) change the probe features, and (c) produce frozen features
    that linearly decode the synthetic signal better than random-init
    features (the reference's reason for using pretrained MCG-NJU weights,
    /root/reference/src/model/videomae.py:8)."""
    import optax
    from video_spike_tpu.models.hf_convert import graft_backbone_into_probe

    cfg = dict(TINY, hf_compat=False, num_frames=4, image_size=32)

    # synthetic: latent scalar drives a moving blob (and the decode target);
    # a per-trial texture distractor keeps the task from being linearly
    # trivial for random projections. The pretrained encoder's edge shows in
    # the few-shot readout regime (24 train rows), which is also the probe's
    # real operating point (~hundreds of trials vs 1.2M backbone params).
    K, T = 96, 8
    lat = rng.uniform(-0.8, 0.8, size=(K,)).astype(np.float32)
    xs = np.linspace(-1, 1, 32)
    grid = np.exp(-((xs[None, :, None] - lat[:, None, None]) ** 2
                    + (xs[None, None, :]) ** 2) / 0.08)
    noise = rng.uniform(0, 0.6, size=(K, 1, 32, 32))
    img = np.clip((0.6 * grid[:, None] + noise) * 255 / 1.2,
                  0, 255).astype(np.uint8)
    video = np.repeat(img[:, None], T, axis=1)  # (K, T, 1, 32, 32)
    target = np.stack([lat, lat ** 2], axis=1)

    # pretrain the masked-video model on these frames
    pre_cfg = {k: v for k, v in cfg.items() if k not in ("encoder", "decoder")}
    pre = VideoMAEForPreTraining(config=pre_cfg)
    clip = jnp.asarray(np.repeat(video[:, :4], 3, axis=2)
                       .astype(np.float32) / 255.0)
    params = pre.init({"params": jax.random.PRNGKey(0),
                       "masking": jax.random.PRNGKey(1)}, clip[:2])
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        def loss_fn(p):
            return pre.apply(p, batch, mask_ratio=0.5,
                             rngs={"masking": key})["recon_loss"]
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    # 24 steps is enough signal for the graft-beats-random assertion below
    # (100 steps cost this test 114 s of the suite's round-2 budget)
    losses = []
    for i in range(24):
        idx = (np.arange(16) + 16 * i) % K
        params, opt_state, loss = step(params, opt_state, clip[idx],
                                       jax.random.PRNGKey(100 + i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::12]

    probe = VideoMAEProbe(config=cfg)
    vid = jnp.asarray(video)
    probe_params = probe.init(jax.random.PRNGKey(3), vid[:1])
    backbone = {"patch_embed": params["params"]["patch_embed"],
                "encoder": params["params"]["encoder"]}
    grafted = graft_backbone_into_probe(probe_params, backbone)

    feats = {}
    for name, p in [("random", probe_params), ("pretrained", grafted)]:
        bb = VideoMAEBackbone(
            image_size=32, patch_size=cfg["patch_size"], num_channels=3,
            num_frames=4, tubelet_size=2, hidden_size=cfg["hidden_size"],
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=cfg["intermediate_size"], hf_compat=False)
        x = preprocess_frames(vid, num_frames=4, image_size=32,
                              source_frames=T)
        h = bb.apply({"params": p["params"]["video_mae"]}, x)
        feats[name] = np.asarray(h.mean(axis=1), dtype=np.float64)
    assert not np.allclose(feats["random"], feats["pretrained"])

    def ridge_val_mse(F):
        Ftr, Fva = F[:24], F[72:]
        ytr, yva = target[:24], target[72:]
        mu, sd = Ftr.mean(0), Ftr.std(0) + 1e-6
        Ftr, Fva = (Ftr - mu) / sd, (Fva - mu) / sd
        A = Ftr.T @ Ftr + 1.0 * np.eye(F.shape[1])
        W = np.linalg.solve(A, Ftr.T @ ytr)
        return float(np.mean((Fva @ W - yva) ** 2))

    mse_rand = ridge_val_mse(feats["random"])
    mse_pre = ridge_val_mse(feats["pretrained"])
    assert mse_pre < mse_rand, (mse_pre, mse_rand)


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


def test_frozen_backbone_excluded_from_optimizer(rng):
    """stop_gradient alone does not freeze under AdamW: decoupled weight
    decay shrinks zero-grad params. The trainer must exclude the backbone
    from the optimizer entirely (the reference's requires_grad=False
    contract, /root/reference/src/model/videomae.py:8-12)."""
    from video_spike_tpu.core.config import DictConfig
    from video_spike_tpu.train.base import make_optimizer

    model = VideoMAEProbe(config=TINY)
    assert model.frozen_param_paths() == ("video_mae",)

    video = jnp.asarray(rng.integers(0, 255, (2, 120, 1, 32, 32))
                        .astype(np.uint8))
    ap = jnp.asarray(rng.poisson(1.0, (2, 100, 4)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)

    cfg = DictConfig({"optimizer": {"lr": 1e-2, "wd": 0.5}})
    tx, _ = make_optimizer(cfg, 100,
                           frozen_paths=model.frozen_param_paths())
    opt_state = tx.init(params)

    # no Adam moments are allocated for the frozen backbone
    n_params = sum(x.size for x in jax.tree.leaves(params))
    n_state = sum(x.size for x in jax.tree.leaves(opt_state)
                  if hasattr(x, "size"))
    n_backbone = sum(x.size for x in
                     jax.tree.leaves(params["params"]["video_mae"]))
    assert n_state < 2 * (n_params - n_backbone) + 1000

    import optax
    from video_spike_tpu.ops.poisson import poisson_nll_mean

    def loss_fn(p):
        return poisson_nll_mean(model.apply(p, video), ap)

    for _ in range(2):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    before = model.init(jax.random.PRNGKey(0), video)
    for a, b in zip(jax.tree.leaves(before["params"]["video_mae"]),
                    jax.tree.leaves(params["params"]["video_mae"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the heads did train
    assert any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(before["params"]["encoder_head"]),
                        jax.tree.leaves(params["params"]["encoder_head"])))


def test_probe_trainer_caches_frozen_features(tmp_path):
    """BaseTrainer + frozen probe: trials are encoded once, steady-state
    steps and staged evals run only the head, and the frozen backbone is
    bit-stable across epochs."""
    from video_spike_tpu.core.config import config_from_kwargs, update_config
    from video_spike_tpu.data.dataset import (
        get_metadata_from_loader, make_loader, split_dataset)
    from video_spike_tpu.data.synthetic import make_synthetic_session
    from video_spike_tpu.train.base import BaseTrainer

    data_dir = tmp_path / "data"
    make_synthetic_session(data_dir, eid="probecache", n_trials=16,
                           n_neurons=4, seed=3, height=32, width=32)
    config = config_from_kwargs(
        {"model": "include:configs/model/videomae/videomae.yaml"})
    config = update_config("configs/train/vmae_video.yaml", config)
    config["dirs"]["data_dir"] = str(data_dir)
    config["training"]["num_epochs"] = 3
    config["training"]["train_batch_size"] = 8
    config["optimizer"]["lr"] = 1e-3
    for k, v in TINY.items():   # shrink the backbone for CPU
        config["model"][k] = v
    split = split_dataset(str(data_dir), "probecache", seed=0)
    train_dl, val_dl, test_dl = make_loader(config, split)
    meta = get_metadata_from_loader(train_dl, config)
    config["model"]["decoder"]["output_dim"] = meta["output_dim"]
    model = VideoMAEProbe.from_config(config.model)
    t = BaseTrainer(model, train_dl, val_dl, test_dl, config,
                    eid="probecache", dataset_split_dict=split,
                    log_dir=str(tmp_path / "log"))
    assert t._frozen_split
    first = t.train_epoch()
    # staged data is (trials, L, D) features, not (trials, T, C, H, W) video
    assert t._dev_data[0].ndim == 3
    backbone_after_1 = jax.tree.map(np.asarray,
                                    t.params["params"]["video_mae"])
    heads_after_1 = jax.tree.map(np.asarray,
                                 t.params["params"]["encoder_head"])
    for _ in range(4):
        last = t.train_epoch()
    assert np.isfinite(first["train_loss"])
    assert np.isfinite(last["train_loss"])
    # the backbone is bit-stable; the head actually trains
    for a, b in zip(jax.tree.leaves(backbone_after_1),
                    jax.tree.leaves(t.params["params"]["video_mae"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(
        float(np.abs(a - np.asarray(b)).max()) > 0
        for a, b in zip(jax.tree.leaves(heads_after_1),
                        jax.tree.leaves(t.params["params"]["encoder_head"])))
    # staged eval holds (trials, L, D) features and runs only the head
    ev = t.eval_epoch()
    assert np.isfinite(ev["eval_res"]["eval_bps"])
    (x, ap_d, n_valid, ap, eids) = t._eval_input_cache["eval"][0]
    assert x.ndim == 3


def test_probe_unfrozen_finetunes_backbone(rng):
    """freeze_backbone=False must disable both the optimizer mask and the
    feature cache: gradients flow and the backbone actually moves."""
    import optax
    from video_spike_tpu.core.config import DictConfig
    from video_spike_tpu.ops.poisson import poisson_nll_mean
    from video_spike_tpu.train.base import make_optimizer

    cfg = dict(TINY, freeze_backbone=False)
    model = VideoMAEProbe(config=cfg)
    assert model.frozen_param_paths() == ()
    video = jnp.asarray(rng.integers(0, 255, (2, 120, 1, 32, 32))
                        .astype(np.uint8))
    ap = jnp.asarray(rng.poisson(1.0, (2, 100, 4)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)
    before = jax.tree.map(np.asarray, params["params"]["video_mae"])
    tx, _ = make_optimizer(DictConfig({"optimizer": {"lr": 1e-2}}), 100,
                           frozen_paths=model.frozen_param_paths())
    opt_state = tx.init(params)
    for _ in range(2):
        grads = jax.grad(
            lambda p: poisson_nll_mean(model.apply(p, video), ap))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    assert any(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
        for a, b in zip(jax.tree.leaves(before),
                        jax.tree.leaves(params["params"]["video_mae"])))
