"""Checkpoint-backed inference session with static-shape bucketed batching.

XLA compiles one executable per input shape; a serving path that jits on
whatever batch size arrives would recompile constantly (minutes per shape
through this environment's remote TPU compile service). The session instead
pads every request batch up to a fixed bucket (powers of two by default),
compiles each bucket once on first use, and strips the padding from the
output. Optionally every bucket is pre-compiled at startup (``warmup()``)
so no request ever pays a compile.
"""

from __future__ import annotations

import bisect
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


class InferenceSession:
    """Jitted, bucket-batched ``model.apply`` over fixed params.

    ``extra_inputs`` covers models whose apply takes more than the data
    batch (the VTT flagship takes per-sample session ids): pass a dict
    ``{name: default_value}`` used when a request omits them.
    """

    def __init__(self, model, params, bucket_sizes: Sequence[int] = (
            1, 2, 4, 8, 16, 32), needs_session_ids: bool = False,
            mesh=None, sharding_rules=None):
        """``mesh`` + ``sharding_rules`` serve a model sharded exactly as it
        trains (e.g. the ~500M-param video readout's kernel split over the
        ``model`` axis via ``models.linear.first_layer_sharding_rules``);
        rules take ``(params, mesh)`` and return a sharding pytree. The
        request batch is replicated — at serving batch sizes the win is
        fitting/splitting the weights, not splitting the batch."""
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            rules = (sharding_rules(params, mesh) if sharding_rules
                     else jax.tree.map(
                         lambda _: jax.sharding.NamedSharding(
                             mesh, jax.sharding.PartitionSpec()), params))
            params = jax.device_put(params, rules)
        self.params = params
        self.buckets = sorted(set(int(b) for b in bucket_sizes))
        self.needs_session_ids = needs_session_ids
        self._compiled = {}     # bucket -> jitted fn
        self.stats = {"requests": 0, "padded_rows": 0, "compiles": 0}

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, model_config, ckpt_dir: str,
                        ckpt_name: str = "model_best", sample_input=None,
                        **kwargs) -> "InferenceSession":
        """Build the model from its config (registry name + from_config,
        the trainers' convention) and restore ``model_best`` params."""
        from video_spike_tpu.core.config import DictConfig
        from video_spike_tpu.core.registry import NAME2MODEL
        from video_spike_tpu.train.checkpoint import load_checkpoint

        if not isinstance(model_config, DictConfig):
            model_config = DictConfig(model_config)  # dot access on reads
        model = NAME2MODEL[model_config["model_class"]].from_config(
            model_config)
        needs_sids = model_config["model_class"] == "VideoTransformer"
        if sample_input is not None:
            init_args = (jnp.asarray(sample_input[:1]),)
            if needs_sids:
                init_args += (jnp.zeros((1,), jnp.int32),)
            target = {"params": model.init(jax.random.PRNGKey(0),
                                           *init_args), "epoch": 0}
            params = load_checkpoint(ckpt_dir, ckpt_name, target)["params"]
        else:
            params = load_checkpoint(ckpt_dir, ckpt_name)["params"]
        return cls(model, params, needs_session_ids=needs_sids, **kwargs)

    # ------------------------------------------------------------------
    def _bucket_for(self, n: int) -> int:
        i = bisect.bisect_left(self.buckets, n)
        if i == len(self.buckets):
            raise ValueError(
                f"batch of {n} exceeds the largest bucket "
                f"{self.buckets[-1]}; raise bucket_sizes")
        return self.buckets[i]

    def _fn(self, bucket: int) -> Callable:
        fn = self._compiled.get(bucket)
        if fn is None:
            if self.needs_session_ids:
                fn = jax.jit(lambda p, x, s: self.model.apply(p, x, s))
            else:
                fn = jax.jit(lambda p, x: self.model.apply(p, x))
            self._compiled[bucket] = fn
            self.stats["compiles"] += 1
        return fn

    def warmup(self, sample_row: np.ndarray,
               session_id: int = 0) -> None:
        """Compile every bucket up front (no request pays a compile)."""
        for b in self.buckets:
            self.predict(np.repeat(sample_row[None], b, axis=0),
                         session_ids=np.full((b,), session_id, np.int32)
                         if self.needs_session_ids else None)

    # ------------------------------------------------------------------
    def predict(self, inputs: np.ndarray,
                session_ids: Optional[np.ndarray] = None) -> np.ndarray:
        """Pad to the next bucket, run the compiled executable, unpad."""
        inputs = np.asarray(inputs)
        n = inputs.shape[0]
        if n == 0:
            raise ValueError("empty batch: predict needs at least one row")
        bucket = self._bucket_for(n)
        pad = bucket - n
        if pad:
            inputs = np.concatenate(
                [inputs, np.repeat(inputs[-1:], pad, axis=0)], axis=0)
        args = [self.params, jnp.asarray(inputs)]
        if self.needs_session_ids:
            sids = (np.zeros(n, np.int32) if session_ids is None
                    else np.asarray(session_ids, np.int32))
            if pad:
                sids = np.concatenate([sids, np.repeat(sids[-1:], pad)])
            args.append(jnp.asarray(sids))
        out = self._fn(bucket)(*args)
        self.stats["requests"] += 1
        self.stats["padded_rows"] += pad
        return np.asarray(out)[:n]
