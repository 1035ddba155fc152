"""HuggingFace-checkpoint and pretrain-checkpoint import for VideoMAE.

The reference's probe is only meaningful because its frozen backbone carries
*pretrained* weights (``/root/reference/src/model/videomae.py:8`` loads
``MCG-NJU/videomae-base``). This module provides the two ways to fill
:class:`~video_spike_tpu.models.videomae.VideoMAEProbe`'s backbone:

- :func:`convert_hf_videomae` — translate a torch ``state_dict`` with HF
  VideoMAE naming (``videomae.embeddings...``, ``encoder.layer.{i}...``)
  into the flax parameter tree of ``VideoMAEBackbone(hf_compat=True)``.
  Handles the HF quirks: Conv3d kernel layout, per-projection q/v biases
  with the key bias fixed at zero, torch (out, in) Linear weights.
- :func:`graft_backbone_into_probe` — copy a backbone tree (from either the
  converter or this framework's own ``VideoMAEForPreTraining`` checkpoint)
  into an initialized probe parameter tree.
- :func:`load_pretrained_into_probe` — dispatch on the checkpoint path: a
  directory is an orbax checkpoint written by the pretraining CLI; a file is
  a torch ``state_dict`` (``.bin``/``.pt``/``.pth``) or a ``.npz`` of the
  same names.

No network access is performed anywhere; weights must already be on disk.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping

import numpy as np


def _t(w) -> np.ndarray:
    """torch tensor / array -> numpy float32."""
    if hasattr(w, "detach"):
        w = w.detach().cpu().numpy()
    return np.asarray(w, dtype=np.float32)


def convert_hf_videomae(state_dict: Mapping, num_layers: int,
                        prefix: str = "") -> Dict:
    """HF VideoMAE(Model) state_dict -> ``VideoMAEBackbone(hf_compat=True)``
    parameter tree (the ``{"patch_embed": ..., "encoder": ...}`` subtree).

    ``prefix`` strips a leading scope, e.g. ``"videomae."`` for a
    ``VideoMAEForPreTraining`` state_dict.
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}

    def get(name):
        if name not in sd:
            raise KeyError(
                f"missing {prefix}{name} in state_dict; have e.g. "
                f"{sorted(sd)[:5]}")
        return _t(sd[name])

    # Conv3d (out, in, kT, kH, kW) -> flax (kT, kH, kW, in, out)
    conv_w = get("embeddings.patch_embeddings.projection.weight")
    patch_embed = {"Conv_0": {
        "kernel": np.transpose(conv_w, (2, 3, 4, 1, 0)),
        "bias": get("embeddings.patch_embeddings.projection.bias"),
    }}

    encoder = {}
    for i in range(num_layers):
        base = f"encoder.layer.{i}."
        wq = get(base + "attention.attention.query.weight")
        wk = get(base + "attention.attention.key.weight")
        wv = get(base + "attention.attention.value.weight")
        hidden = wq.shape[1]
        # HF VideoMAE: query/value carry biases, the key bias is pinned to
        # zeros at forward time (modeling_videomae.VideoMAESelfAttention)
        bq = (_t(sd[base + "attention.attention.q_bias"])
              if base + "attention.attention.q_bias" in sd
              else np.zeros(hidden, np.float32))
        bv = (_t(sd[base + "attention.attention.v_bias"])
              if base + "attention.attention.v_bias" in sd
              else np.zeros(hidden, np.float32))
        encoder[f"Block_{i}"] = {
            "LayerNorm_0": {"scale": get(base + "layernorm_before.weight"),
                            "bias": get(base + "layernorm_before.bias")},
            "SelfAttention_0": {
                "qkv": {"kernel": np.concatenate(
                            [wq.T, wk.T, wv.T], axis=1),
                        "bias": np.concatenate(
                            [bq, np.zeros(hidden, np.float32), bv])},
                "proj": {"kernel": get(base + "attention.output.dense.weight").T,
                         "bias": get(base + "attention.output.dense.bias")},
            },
            "LayerNorm_1": {"scale": get(base + "layernorm_after.weight"),
                            "bias": get(base + "layernorm_after.bias")},
            "Dense_0": {"kernel": get(base + "intermediate.dense.weight").T,
                        "bias": get(base + "intermediate.dense.bias")},
            "Dense_1": {"kernel": get(base + "output.dense.weight").T,
                        "bias": get(base + "output.dense.bias")},
        }
    return {"patch_embed": patch_embed, "encoder": encoder}


def graft_backbone_into_probe(probe_params: Dict, backbone: Dict) -> Dict:
    """Return probe params with ``video_mae`` replaced by ``backbone``
    (shape-checked leaf by leaf so silent architecture drift can't load)."""
    import jax

    target = probe_params["params"]["video_mae"]
    t_leaves = dict(jax.tree_util.tree_leaves_with_path(target))
    b_leaves = dict(jax.tree_util.tree_leaves_with_path(backbone))
    if set(t_leaves) != set(b_leaves):
        missing = set(t_leaves) ^ set(b_leaves)
        raise ValueError(
            f"backbone tree does not match the probe backbone "
            f"(hf_compat mismatch? differing keys: {sorted(str(m) for m in missing)[:4]})")
    for path, leaf in t_leaves.items():
        if tuple(leaf.shape) != tuple(b_leaves[path].shape):
            raise ValueError(f"shape mismatch at {path}: probe "
                             f"{leaf.shape} vs checkpoint {b_leaves[path].shape}")
    new = dict(probe_params["params"])
    new["video_mae"] = jax.tree.map(
        lambda t, b: np.asarray(b, dtype=np.asarray(t).dtype),
        target, backbone)
    out = dict(probe_params)
    out["params"] = new
    return out


def load_pretrained_into_probe(probe_params: Dict, path: str) -> Dict:
    """Fill the probe backbone from ``path`` — an orbax checkpoint directory
    written by ``cli/pretrain_videomae`` (this framework's pretraining), a
    torch state_dict file, or an ``.npz`` with HF names."""
    depth = len(probe_params["params"]["video_mae"]["encoder"]) - (
        1 if "LayerNorm_0" in probe_params["params"]["video_mae"]["encoder"]
        else 0)
    if os.path.isdir(path):
        from video_spike_tpu.train.checkpoint import load_checkpoint
        restored = load_checkpoint(os.path.dirname(path),
                                   os.path.basename(path), None)
        params = restored["params"]["params"]
        backbone = {"patch_embed": params["patch_embed"],
                    "encoder": params["encoder"]}
        return graft_backbone_into_probe(probe_params, backbone)
    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
    prefix = ("videomae."
              if any(k.startswith("videomae.") for k in sd) else "")
    backbone = convert_hf_videomae(sd, num_layers=depth, prefix=prefix)
    return graft_backbone_into_probe(probe_params, backbone)
