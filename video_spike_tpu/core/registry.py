"""Model registry mapping config names to constructors.

Parity with ``NAME2MODEL`` in the reference
(``/root/reference/src/utils/utils.py:28-34``), plus a decorator so new model
families self-register. Constructors are imported lazily to keep `import
video_spike_tpu` light (flax model modules pull in jax compilation machinery).
"""

from __future__ import annotations

import importlib
from typing import Callable, Dict

_LAZY: Dict[str, str] = {
    # name -> "module:attr"
    "Linear": "video_spike_tpu.models.linear:LinearModel",
    "VideoMAE": "video_spike_tpu.models.videomae:VideoMAEProbe",
    "ContrastViT": "video_spike_tpu.models.vit_mae:ContrastViT",
    "ContrastViTMAE": "video_spike_tpu.models.vit_mae:ContrastViTMAE",
    "MAE": "video_spike_tpu.models.vit_mae:MAE",
    "VideoTransformer": "video_spike_tpu.models.vtt:VideoTemporalTransformer",
    "VideoMAEForPreTraining":
        "video_spike_tpu.models.videomae:VideoMAEForPreTraining",
}

_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    """Decorator: ``@register_model("MyModel")`` adds a constructor."""

    def wrap(ctor):
        _REGISTRY[name] = ctor
        return ctor

    return wrap


def get_model(name: str) -> Callable:
    if name in _REGISTRY:
        return _REGISTRY[name]
    if name in _LAZY:
        module_name, attr = _LAZY[name].split(":")
        ctor = getattr(importlib.import_module(module_name), attr)
        _REGISTRY[name] = ctor
        return ctor
    raise KeyError(f"Unknown model {name!r}; known: {sorted(set(_REGISTRY) | set(_LAZY))}")


class _LazyName2Model:
    """Dict-like view so call sites can keep the reference idiom
    ``NAME2MODEL[config.model.model_class]``."""

    def __getitem__(self, name: str) -> Callable:
        return get_model(name)

    def __contains__(self, name: str) -> bool:
        return name in _REGISTRY or name in _LAZY

    def keys(self):
        return sorted(set(_REGISTRY) | set(_LAZY))


NAME2MODEL = _LazyName2Model()
