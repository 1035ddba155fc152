"""VideoMAE: tubelet video transformer, masked-video pretraining, and the
frozen-backbone spike-probe used by the reference.

Capability parity with ``/root/reference/src/model/videomae/
modeling_videomae.py`` (vendored HF VideoMAE) and the probe wrapper
``/root/reference/src/model/videomae.py:4-36``:

- 3-D tubelet patch embedding (2-frame tubelets x 16x16 patches,
  ``modeling_videomae.py:146``), fixed 1-D sinusoid position table (``:101``);
- encoder (12x768) and a pretraining decoder with mask tokens for masked
  video modeling (``VideoMAEForPreTraining`` ``:790``);
- ``VideoMAEProbe``: uniformly samples 16 of the 120 trial frames
  (``videomae.py:10-11``), repeats grayscale to RGB, resizes to 224 and
  applies ImageNet normalization (the reference runs HF AutoImageProcessor
  inside forward under no_grad, ``videomae.py:17-28``), runs the FROZEN
  backbone (stop_gradient), and trains a two-layer readout
  ``Linear(1568*768 -> enc_out) -> Linear(-> 100*N)`` (``videomae.py:13-14``).

TPU notes: frame preprocessing (resize + normalize + RGB repeat) happens on
device inside the jitted step; the frozen backbone runs in bf16 under
stop_gradient so no activation memory is kept for it.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from video_spike_tpu.models.vit_mae import Encoder, random_masking, sincos_pos_embed_1d

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class TubeletEmbed(nn.Module):
    """(B, T, C, H, W) -> (B, L, D) via 3-D conv with tubelet strides."""

    hidden_size: int = 768
    patch_size: int = 16
    tubelet_size: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, video):
        # to (B, T, H, W, C) for lax conv via nn.Conv over 3 spatial dims
        x = jnp.transpose(video, (0, 1, 3, 4, 2)).astype(self.dtype)
        x = nn.Conv(self.hidden_size,
                    kernel_size=(self.tubelet_size, self.patch_size,
                                 self.patch_size),
                    strides=(self.tubelet_size, self.patch_size,
                             self.patch_size),
                    padding="VALID", dtype=self.dtype)(x)
        b, t, h, w, d = x.shape
        return x.reshape(b, t * h * w, d)


class VideoMAEBackbone(nn.Module):
    """Encoder over tubelet tokens with fixed sinusoid position table."""

    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    num_frames: int = 16
    tubelet_size: int = 2
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    dtype: Any = jnp.bfloat16
    # hf_compat hosts released HF VideoMAE weights faithfully: the
    # interleaved sinusoid table and no final layernorm (HF
    # ``VideoMAEModel`` with ``use_mean_pooling=True``, the MCG-NJU config)
    hf_compat: bool = False
    remat: bool = False  # see vit_mae.Encoder.remat

    @property
    def seq_len(self) -> int:
        return (self.num_frames // self.tubelet_size) * \
            (self.image_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, video):
        x = TubeletEmbed(self.hidden_size, self.patch_size,
                         self.tubelet_size, self.dtype,
                         name="patch_embed")(video)
        pos = jnp.asarray(sincos_pos_embed_1d(self.hidden_size, self.seq_len,
                                              interleaved=self.hf_compat))
        x = x + pos[None].astype(x.dtype)
        x = Encoder(self.num_hidden_layers, self.hidden_size,
                    self.num_attention_heads, self.intermediate_size,
                    self.dtype, final_norm=not self.hf_compat,
                    gelu_approx=not self.hf_compat,  # HF "gelu" = exact erf
                    ln_dtype=jnp.float32 if self.hf_compat else None,
                    remat=self.remat, name="encoder")(x)
        return x  # (B, L, D) last hidden state


class VideoMAEForPreTraining(nn.Module):
    """Masked video modeling: encode visible tubelets, decode all, regress
    masked tubelet pixels (``modeling_videomae.py:790-972`` capability)."""

    config: Any

    decoder_hidden_size: int = 384
    decoder_num_hidden_layers: int = 4
    decoder_num_attention_heads: int = 6
    decoder_intermediate_size: int = 1536

    @classmethod
    def from_config(cls, config) -> "VideoMAEForPreTraining":
        return cls(config=dict(config))

    @nn.compact
    def __call__(self, video, mask_ratio: float = 0.9,
                 rng: Optional[jax.Array] = None) -> Dict:
        cfg = self.config
        c = cfg.get("num_channels", 3)
        p = cfg.get("patch_size", 16)
        tub = cfg.get("tubelet_size", 2)
        hidden = cfg.get("hidden_size", 768)

        embed = TubeletEmbed(hidden, p, tub, name="patch_embed")
        tokens = embed(video)
        L = tokens.shape[1]
        pos = jnp.asarray(sincos_pos_embed_1d(hidden, L))
        tokens = tokens + pos[None].astype(tokens.dtype)

        if rng is None:
            rng = self.make_rng("masking")
        visible, mask, ids_restore = random_masking(tokens, mask_ratio, rng)
        enc = Encoder(cfg.get("num_hidden_layers", 12), hidden,
                      cfg.get("num_attention_heads", 12),
                      cfg.get("intermediate_size", 3072),
                      remat=bool(cfg.get("remat", False)),
                      name="encoder")(visible)

        # decoder over the full restored sequence
        dec_dim = self.decoder_hidden_size
        x = nn.Dense(dec_dim, name="decoder_embed")(enc)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, dec_dim))
        B = x.shape[0]
        n_masked = L - x.shape[1]
        x_full = jnp.concatenate(
            [x, jnp.broadcast_to(mask_token.astype(x.dtype),
                                 (B, n_masked, dec_dim))], axis=1)
        x_full = jnp.take_along_axis(x_full, ids_restore[:, :, None], axis=1)
        dec_pos = jnp.asarray(sincos_pos_embed_1d(dec_dim, L))
        x_full = x_full + dec_pos[None].astype(x_full.dtype)
        dec = Encoder(self.decoder_num_hidden_layers, dec_dim,
                      self.decoder_num_attention_heads,
                      self.decoder_intermediate_size,
                      remat=bool(cfg.get("remat", False)),
                      name="decoder")(x_full)
        pred = nn.Dense(tub * p * p * c, dtype=jnp.float32,
                        name="decoder_pred")(dec)

        target = tubelet_patchify(video.astype(jnp.float32), tub, p)
        loss = jnp.mean((pred - target) ** 2, axis=-1)
        loss = jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return {"recon_loss": loss, "logits": pred, "mask": mask}


def tubelet_patchify(video: jax.Array, tubelet: int, patch: int) -> jax.Array:
    """(B, T, C, H, W) -> (B, L, tubelet*patch*patch*C) tubelet pixels."""
    B, T, C, H, W = video.shape
    t, h, w = T // tubelet, H // patch, W // patch
    x = video.reshape(B, t, tubelet, C, h, patch, w, patch)
    x = jnp.einsum("btschpwq->bthwspqc", x)
    return x.reshape(B, t * h * w, tubelet * patch * patch * C)


def preprocess_frames(video: jax.Array, num_frames: int = 16,
                      image_size: int = 224,
                      source_frames: int = 120) -> jax.Array:
    """(B, T, 1, H, W) uint8/float trial video -> (B, 16, 3, 224, 224)
    normalized frames: uniform frame subsample, grayscale->RGB, resize,
    ImageNet normalization (the reference's AutoImageProcessor equivalent)."""
    idx = (np.linspace(0, 1, num_frames) * (source_frames - 1)).astype(int)
    x = video[:, idx].astype(jnp.float32) / 255.0
    b, t, c, h, w = x.shape
    if (h, w) != (image_size, image_size):
        x = jax.image.resize(x, (b, t, c, image_size, image_size),
                             method="linear")
    if c == 1:
        x = jnp.repeat(x, 3, axis=2)
    mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD).reshape(1, 1, 3, 1, 1)
    return (x - mean) / std


class VideoMAEProbe(nn.Module):
    """Frozen VideoMAE backbone + trainable linear readout to spike rates."""

    config: Any

    @classmethod
    def from_config(cls, config) -> "VideoMAEProbe":
        return cls(config=dict(config))

    def frozen_param_paths(self) -> tuple:
        """Top-level param subtrees the optimizer must not touch.

        The reference freezes the backbone by excluding its params from the
        torch optimizer (requires_grad=False before AdamW construction,
        ``/root/reference/src/model/videomae.py:8-12``), so weight decay
        never shrinks the frozen weights. stop_gradient alone does NOT
        reproduce that here: AdamW's decoupled decay updates params with
        zero grads. The trainer masks these subtrees out of the optimizer
        (``train/base.py:make_optimizer``), which also skips allocating
        86M-param Adam moments for the backbone.
        """
        return (("video_mae",)
                if self.config.get("freeze_backbone", True) else ())

    def setup(self):
        cfg = self.config
        self.video_mae = VideoMAEBackbone(
            image_size=cfg.get("image_size", 224),
            patch_size=cfg.get("patch_size", 16),
            num_channels=3, num_frames=cfg.get("num_frames", 16),
            tubelet_size=cfg.get("tubelet_size", 2),
            hidden_size=cfg.get("hidden_size", 768),
            num_hidden_layers=cfg.get("num_hidden_layers", 12),
            num_attention_heads=cfg.get("num_attention_heads", 12),
            intermediate_size=cfg.get("intermediate_size", 3072),
            # default True: the probe's purpose is hosting released HF
            # weights (reference freezes MCG-NJU/videomae-base,
            # /root/reference/src/model/videomae.py:8); set False when
            # grafting a backbone pretrained by this framework
            hf_compat=cfg.get("hf_compat", True),
            remat=bool(cfg.get("remat", False)))
        self.encoder_head = nn.Dense(cfg["encoder"]["output_dim"])
        self.decoder_head = nn.Dense(cfg["decoder"]["output_dim"])

    def encode(self, video):
        """Frozen feature path: preprocess + backbone (+ stop_gradient).

        Exposed separately from ``__call__`` so the trainer can compute
        embeddings ONCE per trial and train the head on cached features —
        the frozen backbone makes them invariant across epochs (and the
        optimizer mask above guarantees the params can't drift). bf16
        output: exactly what the fused path feeds the head."""
        cfg = self.config
        x = preprocess_frames(video, cfg.get("num_frames", 16),
                              cfg.get("image_size", 224),
                              source_frames=video.shape[1])
        hidden = self.video_mae(x)
        if cfg.get("freeze_backbone", True):
            hidden = jax.lax.stop_gradient(hidden)
        return hidden

    def head(self, hidden):
        """Trainable readout over (B, L, D) backbone features."""
        b = hidden.shape[0]
        flat = hidden.reshape(b, -1).astype(jnp.float32)
        out_dim = self.config["decoder"]["output_dim"]
        x = self.encoder_head(flat)
        x = self.decoder_head(x)
        return x.reshape(b, 100, out_dim // 100)

    def __call__(self, video):
        return self.head(self.encode(video))
