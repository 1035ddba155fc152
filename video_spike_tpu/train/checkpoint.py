"""Checkpoint save/load.

The reference pickles whole model objects (``/root/reference/src/trainer/
base.py:285-291``) and never saves optimizer state. Here checkpoints are
Orbax pytrees holding params, optimizer state, and step/epoch, giving true
resume (a capability upgrade noted in SURVEY.md §5.4); artifact naming keeps
the ``model_best`` / ``model_last`` contract.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(directory: str | Path, name: str, tree: Any) -> str:
    """Save `tree` under `directory/name`, replacing any previous copy."""
    path = (Path(directory) / name).resolve()
    ckptr = ocp.StandardCheckpointer()
    if path.exists():
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, tree)
    ckptr.wait_until_finished()
    return str(path)


def load_checkpoint(directory: str | Path, name: str,
                    target: Optional[Any] = None) -> Any:
    """Load the pytree at `directory/name`; `target` restores dtypes/shapes
    and shardings when given."""
    path = (Path(directory) / name).resolve()
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def checkpoint_exists(directory: str | Path, name: str) -> bool:
    return (Path(directory) / name).exists()
