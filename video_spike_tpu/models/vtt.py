"""Video Temporal Transformer (VTT): end-to-end video -> spike model with
multi-session heads.

This is the framework's flagship (BASELINE.json config 5: "end-to-end video
encoder + temporal transformer spike model, multi-session sharded") — the
capability the reference approximates with the frozen VideoMAE probe
(``/root/reference/src/model/videomae.py``) but trained end-to-end:

- a shared per-frame patch encoder (factorized ViViT-style: spatial
  attention within each frame, batched as (B*T, tokens, D) so the MXU sees
  one large matmul per layer);
- a temporal transformer over the (B, T=120, D) frame embeddings;
- a learned time-resampling from the 120 camera frames to the 100 spike
  bins (einsum with a (T_frames, T_bins) matrix initialized to linear
  interpolation);
- per-session readout heads stored as a stacked (S, D, N_max) tensor with a
  per-sample gather, so sessions with different neuron counts train in the
  same sharded batch (pad to ``max_space_length`` and mask the loss).

Sharding: batch over the mesh ``data`` axis; the stacked session heads and
the MLP widths shard naturally over ``model``.

The production shape lives in ``configs/model/vtt_video.yaml`` (round-3
sweep, BASELINE.md "VTT shape sweep": hidden 512 x depth 2/2 with TWO
256-wide attention heads — 64-wide heads under-fill the 128x128 MXU and
were the single biggest cost in the round-2 shape). The class defaults
below are the historical round-1/2 shape kept for the recorded profiles.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from video_spike_tpu.models.vit_mae import Block, sincos_pos_embed_1d, sincos_pos_embed_2d


def time_resample_init(t_frames: int, t_bins: int) -> np.ndarray:
    """(T_frames, T_bins) linear-interpolation matrix (learned from there)."""
    M = np.zeros((t_frames, t_bins), dtype=np.float32)
    src = np.linspace(0, t_frames - 1, t_bins)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, t_frames - 1)
    frac = src - lo
    for j in range(t_bins):
        M[lo[j], j] += 1 - frac[j]
        M[hi[j], j] += frac[j]
    return M


class _PatchifyMatmul(nn.Module):
    """Stride-P patchify as an explicit reshape + one MXU dot: bit-equal to
    ``nn.Conv(features, (P, P), strides=(P, P), padding="VALID")`` with the
    SAME (P, P, C, D) kernel parameter (read as a (P²C, D) matrix; patch
    pixels flatten in the kernel's (h, w, c) order)."""

    features: int
    patch: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        n, H, W, c = x.shape
        p = self.patch
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        patches = x.reshape(n, H // p, p, W // p, p, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(n, (H // p) * (W // p), p * p * c)
        return (jnp.einsum(
            "nsk,kd->nsd", patches,
            kernel.reshape(p * p * c, self.features).astype(self.dtype))
            + bias.astype(self.dtype))


class FrameEncoder(nn.Module):
    """Shared per-frame ViT: patchify -> spatial blocks -> mean-pool.

    The ``matmul_patchify`` / ``pool_before_norm`` flags are round-5
    MFU-attempt variants (VERDICT r4 #6, profile-guided attack on the
    recorded LN/relayout overhead between the encoder's small matmuls):

    - ``matmul_patchify``: express the stride-16 patchify Conv as an
      explicit patch-reshape + one (N*S, P²C)x(P²C, D) dot. Bit-equal math
      and the SAME parameter tree (the Conv kernel (P, P, C, D) is read as
      a (P²C, D) matrix), so checkpoints are interchangeable. Measured on
      chip at the recipe shape: 24.75 -> 23.81 ms/step (MFU 34.3 -> 35.6%,
      BASELINE.md round-5 variant table) — XLA's conv lowering loses to the
      plain MXU matmul here, so this is the DEFAULT; the flag remains for
      A/B.
    - ``pool_before_norm``: mean-pool the token axis BEFORE the final f32
      LayerNorm, normalizing the (N, D) pooled embedding instead of the
      full (N, S, D) grid — S× less f32 LN traffic. NOT numerically
      equivalent (architectural variant; quality-gated before any default
      flip).
    """

    patch_size: int = 16
    hidden: int = 256
    depth: int = 4
    heads: int = 4
    mlp_dim: int = 512
    dtype: Any = jnp.bfloat16
    remat: bool = False  # see vit_mae.Encoder.remat
    matmul_patchify: bool = True
    pool_before_norm: bool = False

    @nn.compact
    def __call__(self, frames):
        # frames: (N, C, H, W) -> (N, D)
        x = jnp.transpose(frames, (0, 2, 3, 1)).astype(self.dtype)
        p = self.patch_size
        if self.matmul_patchify:
            # named Conv_0 so the param tree (Conv_0/{kernel, bias}, same
            # shapes, same initializers) matches the Conv path exactly
            x = _PatchifyMatmul(self.hidden, p, self.dtype,
                                name="Conv_0")(x)
        else:
            x = nn.Conv(self.hidden, (p, p), strides=(p, p),
                        padding="VALID", dtype=self.dtype)(x)
            n, h, w, d = x.shape
            x = x.reshape(n, h * w, d)
        grid = int(np.sqrt(x.shape[1]))
        pos = sincos_pos_embed_2d(self.hidden, grid, cls_token=False)
        x = x + jnp.asarray(pos)[None].astype(x.dtype)
        block_cls = nn.remat(Block) if self.remat else Block
        for i in range(self.depth):
            x = block_cls(self.hidden, self.heads, self.mlp_dim,
                          self.dtype, name=f"Block_{i}")(x)
        if self.pool_before_norm:
            x = jnp.mean(x.astype(jnp.float32), axis=1)  # (N, D)
            return nn.LayerNorm(dtype=jnp.float32)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        return jnp.mean(x, axis=1)  # (N, D)


class VideoTemporalTransformer(nn.Module):
    """Video (B, T, 1, H, W) -> per-session log-rates (B, T_bins, N_max)."""

    n_sessions: int
    max_neurons: int
    t_frames: int = 120
    t_bins: int = 100
    patch_size: int = 16
    hidden: int = 256
    frame_depth: int = 4
    temporal_depth: int = 4
    heads: int = 4
    mlp_dim: int = 512
    dtype: Any = jnp.bfloat16
    # Encode every k-th frame only. 60 Hz face video is temporally highly
    # redundant and the frame encoder is ~95% of the train step
    # (BASELINE.md profile); the learned time-resample maps whatever frame
    # count survives onto the 100 spike bins. Same lever the reference's
    # VideoMAE probe pulls harder (16 of 120 frames,
    # /root/reference/src/model/videomae.py:10-11). Measured speed/quality
    # trade in BASELINE.md ("frame-stride" section).
    frame_stride: int = 1
    remat: bool = False  # see vit_mae.Encoder.remat
    matmul_patchify: bool = True  # see FrameEncoder (round-5 MFU variants)
    pool_before_norm: bool = False

    @classmethod
    def from_config(cls, config) -> "VideoTemporalTransformer":
        return cls(
            n_sessions=config["n_sessions"],
            max_neurons=config["max_neurons"],
            t_frames=config.get("t_frames", 120),
            t_bins=config.get("t_bins", 100),
            patch_size=config.get("patch_size", 16),
            hidden=config.get("hidden_size", 256),
            frame_depth=config.get("frame_depth", 4),
            temporal_depth=config.get("temporal_depth", 4),
            heads=config.get("num_attention_heads", 4),
            mlp_dim=config.get("intermediate_size", 512),
            frame_stride=config.get("frame_stride", 1),
            remat=bool(config.get("remat", False)),
            matmul_patchify=bool(config.get("matmul_patchify", True)),
            pool_before_norm=bool(config.get("pool_before_norm", False)),
        )

    @nn.compact
    def __call__(self, video, session_ids):
        """video: (B, T, 1, H, W) uint8/float; session_ids: (B,) int32."""
        if self.frame_stride > 1:
            video = video[:, ::self.frame_stride]
        B, T = video.shape[:2]
        x = video.astype(jnp.float32) / 255.0
        frames = x.reshape(B * T, *x.shape[2:])
        emb = FrameEncoder(self.patch_size, self.hidden, self.frame_depth,
                           self.heads, self.mlp_dim, self.dtype,
                           remat=self.remat,
                           matmul_patchify=self.matmul_patchify,
                           pool_before_norm=self.pool_before_norm,
                           name="frame_encoder")(frames)
        h = emb.reshape(B, T, self.hidden)

        pos = sincos_pos_embed_1d(self.hidden, T)
        h = h + jnp.asarray(pos)[None].astype(h.dtype)
        block_cls = nn.remat(Block) if self.remat else Block
        for i in range(self.temporal_depth):
            h = block_cls(self.hidden, self.heads, self.mlp_dim, self.dtype,
                          name=f"Block_{i}")(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="temporal_norm")(h)

        # learned time resampling (encoded frames -> spike bins); T already
        # reflects frame_stride
        resample = self.param(
            "time_resample",
            lambda key: jnp.asarray(time_resample_init(T, self.t_bins)))
        h = jnp.einsum("btd,tz->bzd", h, resample,
                       preferred_element_type=jnp.float32)

        # per-session heads: stacked (S, D, N_max) + (S, N_max)
        W = self.param("session_heads", nn.initializers.normal(0.02),
                       (self.n_sessions, self.hidden, self.max_neurons))
        b = self.param("session_bias", nn.initializers.zeros,
                       (self.n_sessions, self.max_neurons))
        Wb = W[session_ids]                   # (B, D, N_max)
        bb = b[session_ids]                   # (B, N_max)
        out = jnp.einsum("bzd,bdn->bzn", h.astype(jnp.float32), Wb,
                         preferred_element_type=jnp.float32)
        return out + bb[:, None, :]
