"""ViT-MAE (masked autoencoder) and its contrastive wrappers.

Capability parity with the reference stack
(``/root/reference/src/model/vit_mae/modeling_vit_mae.py`` — vendored HF
ViT-MAE — and the wrappers in ``vit_mae.py:7-94``):

- patch embedding (conv stride=patch), fixed 2-D sin-cos position embeddings,
  CLS token;
- random masking by argsorted uniform noise keeping ``L*(1-mask_ratio)``
  patches (``modeling_vit_mae.py:269``), with ``ids_restore``;
- pre-LN transformer encoder; decoder with mask tokens and its own sin-cos
  table; per-patch pixel regression; masked-patch MSE ``forward_loss``
  (``modeling_vit_mae.py:1092``), optional ``norm_pix_loss``;
- wrappers: ``MAE`` (L2-normalized CLS + recon loss), ``ContrastViT``
  (mask_ratio 0, projection head + learnable temperature, no decoder),
  ``ContrastViTMAE`` (projection + recon + temperature).

Written TPU-first: bf16 matmuls with f32 layernorms/softmax accumulation,
static shapes (mask_ratio is an apply-time static argument, so the
``transform()`` path that forces mask_ratio=0 is just a second jit cache
entry), gathers instead of boolean indexing.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


# ---------------------------------------------------------------------------
# position embeddings (2-D sin-cos, matching the HF/MAE recipe)
# ---------------------------------------------------------------------------

def _sincos_1d(dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(dim // 2, dtype=np.float64)
    omega = 1.0 / 10000 ** (omega / (dim / 2.0))
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_pos_embed_2d(dim: int, grid_size: int,
                        cls_token: bool = True) -> np.ndarray:
    grid_h = np.arange(grid_size, dtype=np.float64)
    grid_w = np.arange(grid_size, dtype=np.float64)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first (HF convention)
    grid = np.stack(grid, axis=0).reshape(2, -1)
    emb = np.concatenate(
        [_sincos_1d(dim // 2, grid[0]), _sincos_1d(dim // 2, grid[1])], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros((1, dim)), emb], axis=0)
    return emb.astype(np.float32)


def sincos_pos_embed_1d(dim: int, length: int,
                        interleaved: bool = False) -> np.ndarray:
    """1-D sinusoid table. ``interleaved=True`` matches the HF VideoMAE
    layout (``get_sinusoid_encoding_table``: even dims sin, odd dims cos,
    frequency shared per pair) — required when hosting released HF weights;
    the default concatenated layout is the framework-native convention."""
    if interleaved:
        pos = np.arange(length, dtype=np.float64)[:, None]
        angle = pos / np.power(10000, 2 * (np.arange(dim) // 2) / dim)
        angle[:, 0::2] = np.sin(angle[:, 0::2])
        angle[:, 1::2] = np.cos(angle[:, 1::2])
        return angle.astype(np.float32)
    return _sincos_1d(dim, np.arange(length, dtype=np.float64)).astype(
        np.float32)


# ---------------------------------------------------------------------------
# masking / patchify
# ---------------------------------------------------------------------------

def random_masking(x: jax.Array, mask_ratio: float, rng: jax.Array):
    """Keep a random (1-mask_ratio) subset of the sequence.

    Returns (x_masked, mask, ids_restore); mask is 1 where REMOVED
    (``modeling_vit_mae.py:269-306`` semantics).
    """
    B, L, D = x.shape
    len_keep = int(L * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (B, L))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    mask = jnp.ones((B, L))
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_masked, mask, ids_restore


def patchify(imgs: jax.Array, patch: int) -> jax.Array:
    """(B, C, H, W) -> (B, L, patch*patch*C), HF channel-last-pixel order."""
    B, C, H, W = imgs.shape
    h, w = H // patch, W // patch
    x = imgs.reshape(B, C, h, patch, w, patch)
    x = jnp.einsum("nchpwq->nhwpqc", x)
    return x.reshape(B, h * w, patch * patch * C)


def unpatchify(patches: jax.Array, patch: int, channels: int) -> jax.Array:
    B, L, _ = patches.shape
    h = w = int(np.sqrt(L))
    x = patches.reshape(B, h, w, patch, patch, channels)
    x = jnp.einsum("nhwpqc->nchpwq", x)
    return x.reshape(B, channels, h * patch, w * patch)


# ---------------------------------------------------------------------------
# transformer blocks
# ---------------------------------------------------------------------------

class SelfAttention(nn.Module):
    """Multi-head self-attention in the transpose-free (B, S, H, D) layout
    (9x faster than the head-transposed layout on these shapes — measured
    numbers in :mod:`video_spike_tpu.ops.attention`)."""

    hidden: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from video_spike_tpu.ops.attention import attention_bshd

        B, S, _ = x.shape
        head_dim = self.hidden // self.heads
        qkv = nn.Dense(3 * self.hidden, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, S, 3, self.heads, head_dim)
        out = attention_bshd(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        out = out.reshape(B, S, self.hidden)
        return nn.Dense(self.hidden, dtype=self.dtype, name="proj")(
            out.astype(self.dtype))


class Block(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int
    dtype: Any = jnp.bfloat16
    eps: float = 1e-12
    # tanh GELU by default (-22% on the VTT frame-encoder step, BASELINE.md;
    # architecturally equivalent for from-scratch training). Weight-import
    # backbones set gelu_approx=False for HF "gelu" (erf) semantics.
    gelu_approx: bool = True
    # LayerNorm IO dtype; None follows the block's compute dtype. flax keeps
    # the statistics in f32 either way (`_compute_stats` upcasts
    # half-precision inputs), and both LN outputs feed bf16 matmuls that
    # discard the extra bits — outputs are bit-identical
    # (scripts/profile_ln_dtype.py). Measured impact: a 27% win when the
    # residual stream is f32 (the isolated A/B's input was f32), but the
    # production models already carry a bf16 residual stream, so the
    # end-to-end VTT step is unchanged (40.0 vs 40.2 ms) — this field
    # exists to keep the precision policy explicit and uniform, not as a
    # perf lever. Weight-import (hf_compat) paths pin f32.
    ln_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        ln = self.dtype if self.ln_dtype is None else self.ln_dtype
        y = nn.LayerNorm(epsilon=self.eps, dtype=ln)(x)
        y = SelfAttention(self.hidden, self.heads, self.dtype)(y)
        x = x + y
        y = nn.LayerNorm(epsilon=self.eps, dtype=ln)(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=self.gelu_approx)
        y = nn.Dense(self.hidden, dtype=self.dtype)(y)
        return x + y


class Encoder(nn.Module):
    depth: int
    hidden: int
    heads: int
    mlp_dim: int
    dtype: Any = jnp.bfloat16
    eps: float = 1e-12
    final_norm: bool = True  # HF VideoMAEModel(use_mean_pooling) omits it
    gelu_approx: bool = True  # see Block
    ln_dtype: Any = None      # see Block; weight-import paths pin f32
    # rematerialize block activations in the backward pass (jax.checkpoint):
    # trades ~one extra forward of FLOPs for O(depth) less activation HBM —
    # the standard TPU lever for batch/model sizes past the recipe shapes.
    # Parameter trees and numerics are identical either way (tested), so
    # checkpoints are interchangeable across the setting.
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        # explicit names keep the parameter tree identical to the
        # auto-named plain path (nn.remat would auto-name CheckpointBlock_i)
        block_cls = nn.remat(Block) if self.remat else Block
        for i in range(self.depth):
            x = block_cls(self.hidden, self.heads, self.mlp_dim, self.dtype,
                          self.eps, gelu_approx=self.gelu_approx,
                          ln_dtype=self.ln_dtype, name=f"Block_{i}")(x)
        if self.final_norm:
            x = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32)(x)
        return x


# ---------------------------------------------------------------------------
# ViT-MAE backbone
# ---------------------------------------------------------------------------

class ViTMAEBackbone(nn.Module):
    """Encoder (+ optional decoder) with random masking."""

    image_size: int = 144
    patch_size: int = 16
    num_channels: int = 1
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    decoder_hidden_size: int = 512
    decoder_num_hidden_layers: int = 8
    decoder_num_attention_heads: int = 16
    decoder_intermediate_size: int = 2048
    mask_ratio: float = 0.75
    norm_pix_loss: bool = False
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.bfloat16
    remat: bool = False  # see Encoder.remat

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    def setup(self):
        self.patch_embed = nn.Conv(
            self.hidden_size, kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed")
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.hidden_size))
        self.pos_embed = jnp.asarray(
            sincos_pos_embed_2d(self.hidden_size, self.grid))
        self.encoder = Encoder(self.num_hidden_layers, self.hidden_size,
                               self.num_attention_heads,
                               self.intermediate_size, self.dtype,
                               self.layer_norm_eps, remat=self.remat,
                               name="encoder")
        # decoder
        self.decoder_embed = nn.Dense(self.decoder_hidden_size,
                                      dtype=self.dtype, name="decoder_embed")
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02),
            (1, 1, self.decoder_hidden_size))
        self.decoder_pos_embed = jnp.asarray(
            sincos_pos_embed_2d(self.decoder_hidden_size, self.grid))
        self.decoder = Encoder(self.decoder_num_hidden_layers,
                               self.decoder_hidden_size,
                               self.decoder_num_attention_heads,
                               self.decoder_intermediate_size, self.dtype,
                               self.layer_norm_eps, remat=self.remat,
                               name="decoder")
        self.decoder_pred = nn.Dense(
            self.patch_size ** 2 * self.num_channels, dtype=jnp.float32,
            name="decoder_pred")

    def encode(self, imgs: jax.Array, mask_ratio: float,
               rng: Optional[jax.Array] = None):
        """imgs: (B, C, H, W) -> (latent incl. CLS, mask, ids_restore)."""
        x = jnp.transpose(imgs, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        x = self.patch_embed(x)
        B, h, w, D = x.shape
        x = x.reshape(B, h * w, D)
        x = x + self.pos_embed[None, 1:].astype(self.dtype)
        if mask_ratio > 0:
            if rng is None:
                rng = self.make_rng("masking")
            x, mask, ids_restore = random_masking(x, mask_ratio, rng)
        else:
            L = x.shape[1]
            mask = jnp.zeros((B, L))
            ids_restore = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
        cls = (self.cls_token + self.pos_embed[None, :1]).astype(self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)), x], axis=1)
        latent = self.encoder(x)
        return latent, mask, ids_restore

    def decode(self, latent: jax.Array, ids_restore: jax.Array) -> jax.Array:
        x = self.decoder_embed(latent)
        B, _, D = x.shape
        L = ids_restore.shape[1]
        n_masked = L + 1 - x.shape[1]
        mask_tokens = jnp.broadcast_to(
            self.mask_token.astype(x.dtype), (B, n_masked, D))
        x_ = jnp.concatenate([x[:, 1:], mask_tokens], axis=1)
        x_ = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)
        x = jnp.concatenate([x[:, :1], x_], axis=1)
        x = x + self.decoder_pos_embed[None].astype(x.dtype)
        x = self.decoder(x)
        return self.decoder_pred(x)[:, 1:]  # drop CLS

    def forward_loss(self, imgs: jax.Array, pred: jax.Array,
                     mask: jax.Array) -> jax.Array:
        """Masked-patch MSE (``modeling_vit_mae.py:1092-1117``)."""
        target = patchify(imgs.astype(jnp.float32), self.patch_size)
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        loss = jnp.mean((pred - target) ** 2, axis=-1)
        return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def __call__(self, imgs: jax.Array, mask_ratio: Optional[float] = None,
                 rng: Optional[jax.Array] = None):
        """Full MAE pass -> (cls_latent, recon_loss)
        (parity with ``vit_mae.py:61-94``)."""
        ratio = self.mask_ratio if mask_ratio is None else mask_ratio
        latent, mask, ids_restore = self.encode(imgs, ratio, rng)
        pred = self.decode(latent, ids_restore)
        loss = self.forward_loss(imgs, pred, mask)
        cls_latent = latent[:, 0].astype(jnp.float32)
        return cls_latent, loss


def _backbone_kwargs(config) -> dict:
    keys = ("image_size", "patch_size", "num_channels", "hidden_size",
            "num_hidden_layers", "num_attention_heads", "intermediate_size",
            "decoder_hidden_size", "decoder_num_hidden_layers",
            "decoder_num_attention_heads", "decoder_intermediate_size",
            "mask_ratio", "norm_pix_loss", "layer_norm_eps", "remat")
    return {k: config[k] for k in keys if k in config}


# ---------------------------------------------------------------------------
# wrappers (the model-zoo entries)
# ---------------------------------------------------------------------------

class MAE(nn.Module):
    """Reconstruction-only wrapper: z = L2-normalized CLS latent
    (``vit_mae.py:45-58``)."""

    config: Any

    @classmethod
    def from_config(cls, config) -> "MAE":
        return cls(config=dict(config))

    @nn.compact
    def __call__(self, x, mask_ratio: Optional[float] = None) -> Dict:
        backbone = ViTMAEBackbone(**_backbone_kwargs(self.config),
                                  name="vit_mae")
        cls_latent, recon = backbone(x, mask_ratio)
        z = cls_latent / jnp.linalg.norm(cls_latent, axis=-1, keepdims=True)
        return {"z": z, "recon_loss": recon}


class ContrastViT(nn.Module):
    """Unmasked encoder + projection head + learnable temperature
    (``vit_mae.py:26-44``). No decoder runs."""

    config: Any

    @classmethod
    def from_config(cls, config) -> "ContrastViT":
        return cls(config=dict(config))

    @nn.compact
    def __call__(self, x, mask_ratio: Optional[float] = None) -> Dict:
        cfg = _backbone_kwargs(self.config)
        cfg["mask_ratio"] = 0.0  # reference forces no masking
        backbone = ViTMAEBackbone(**cfg, name="vit")
        latent, _, _ = backbone.encode(x, 0.0)
        cls_latent = latent[:, 0].astype(jnp.float32)
        z = nn.Dense(self.config["embed_size"], name="proj")(cls_latent)
        z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        log_temp = self.param("temperature", nn.initializers.zeros, ())
        return {"z": z, "temp": 1.0 / jnp.exp(log_temp)}


class ContrastViTMAE(nn.Module):
    """Masked autoencoding + contrastive projection (``vit_mae.py:7-24``)."""

    config: Any

    @classmethod
    def from_config(cls, config) -> "ContrastViTMAE":
        return cls(config=dict(config))

    @nn.compact
    def __call__(self, x, mask_ratio: Optional[float] = None) -> Dict:
        backbone = ViTMAEBackbone(**_backbone_kwargs(self.config),
                                  name="vit_mae")
        cls_latent, recon = backbone(x, mask_ratio)
        z = nn.Dense(self.config["embed_size"], name="proj")(cls_latent)
        z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        log_temp = self.param("temperature", nn.initializers.zeros, ())
        return {"z": z, "recon_loss": recon, "temp": 1.0 / jnp.exp(log_temp)}
