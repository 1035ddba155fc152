"""Ahead-of-time model export: serialize the jitted forward as StableHLO.

A deployment artifact the reference cannot produce (its deploy story is
"install torch and unpickle the model object",
``/root/reference/src/trainer/base.py:285-291``): ``export_forward`` bakes
the checkpoint into a self-contained StableHLO module that any JAX runtime
of a compatible version can load and run without the framework, its
configs, or Python model code — the serving-container story for TPU pods.

Batch polymorphism: exported with a symbolic batch dimension when the
lowering allows it (pure matmul/attention graphs do), so one artifact
serves any batch size; models whose lowering needs static shapes fall
back to the fixed sample batch size.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_forward(model, params, sample_input: np.ndarray,
                   session_ids: Optional[np.ndarray] = None,
                   polymorphic_batch: bool = True):
    """Return the serialized bytes of ``model.apply(params, ...)`` with the
    params baked in as constants."""
    sample = jnp.asarray(sample_input)
    args = [sample]
    if session_ids is not None:
        args.append(jnp.asarray(session_ids))

    if session_ids is None:
        fn = jax.jit(lambda x: model.apply(params, x))
    else:
        fn = jax.jit(lambda x, s: model.apply(params, x, s))

    def specs(symbolic: bool):
        if not symbolic:
            return [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
        (b,) = jax_export.symbolic_shape("b")
        return [jax.ShapeDtypeStruct((b,) + a.shape[1:], a.dtype)
                for a in args]

    if polymorphic_batch:
        try:
            return jax_export.export(fn)(*specs(True)).serialize()
        except Exception:   # lowering needs static shapes -> fixed batch
            pass
    return jax_export.export(fn)(*specs(False)).serialize()


def save_exported(model, params, sample_input, path: str | Path,
                  **kwargs) -> str:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(export_forward(model, params, sample_input, **kwargs))
    return str(path)


def load_exported(path: str | Path) -> Callable:
    """Load a serialized module; returns ``f(x[, session_ids]) -> out``."""
    exported = jax_export.deserialize(Path(path).read_bytes())

    def call(*args):
        return exported.call(*(jnp.asarray(a) for a in args))

    return call
