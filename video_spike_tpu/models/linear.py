"""Linear (MLP) video->spike readout.

Capability parity with ``/root/reference/src/model/linear.py:3-56``: an
encoder MLP (hidden dims + ReLU, linear head) into a decoder MLP, applied to
the flattened concatenation of the input modalities, output reshaped to
(B, T_bins, N) with ``T_bins = output_dim // 100`` fixed at 100.

TPU notes: the first matmul is enormous for raw video input
((B, 1_966_080) x (1_966_080, 256) — ~500M params, see
``/root/reference/config/model/linear_video.yaml:6``). The kernel is stored
f32 and cast to bf16 for the MXU; under a (data, model) mesh the trainer
shards this kernel's contracting dimension over ``model`` so each chip holds
1/n of it and the activation psum rides ICI.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class MLP(nn.Module):
    hidden_dims: Sequence[int]
    output_dim: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for h in self.hidden_dims:
            x = nn.Dense(h, dtype=self.compute_dtype, name=None)(x)
            x = nn.relu(x)
        return nn.Dense(self.output_dim, dtype=self.compute_dtype)(x)


class LinearModel(nn.Module):
    """Encoder/decoder MLP emitting per-bin log-rates."""

    encoder_hidden: Sequence[int]
    encoder_out: int
    decoder_hidden: Sequence[int]
    output_dim: int           # T_bins * n_neurons
    t_bins: int = 100
    compute_dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def from_config(cls, config) -> "LinearModel":
        """Build from a model config with encoder/decoder sections
        (same YAML schema as the reference ``config/model/linear_*.yaml``)."""
        return cls(
            encoder_hidden=tuple(config.encoder.hidden_dims),
            encoder_out=config.encoder.output_dim,
            decoder_hidden=tuple(config.decoder.hidden_dims),
            output_dim=config.decoder.output_dim,
        )

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        if x.dtype == jnp.uint8:
            # raw pixels: scale to [0, 1] on device. (The reference feeds
            # 0-255 floats straight into the MLP — with lr 5e-5 and default
            # init the Poisson exp() head overflows; unit-scaled inputs are
            # the numerically sane equivalent.)
            x = x.astype(self.compute_dtype) / 255.0
        x = x.reshape(b, -1).astype(self.compute_dtype)
        x = MLP(self.encoder_hidden, self.encoder_out,
                self.compute_dtype, name="encoder")(x)
        x = MLP(self.decoder_hidden, self.output_dim,
                self.compute_dtype, name="decoder")(x)
        x = x.astype(jnp.float32)
        return x.reshape(b, self.t_bins, self.output_dim // self.t_bins)


def first_layer_sharding_rules(params, mesh, min_dim: int = 1 << 18):
    """Return a params-shaped pytree of NamedShardings: kernels whose input
    dimension exceeds `min_dim` are sharded over the ``model`` axis (tensor
    parallel contraction); everything else is replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if names and names[-1] == "kernel" and leaf.ndim == 2 \
                and leaf.shape[0] >= min_dim:
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
