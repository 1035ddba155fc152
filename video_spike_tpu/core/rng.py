"""Seeding and PRNG-key plumbing.

The reference seeds global numpy/torch state (``/root/reference/src/utils/
utils.py:49-59``). JAX is functional: we seed the host-side numpy/python RNGs
(used by data shuffling and fixture generation) and hand out an explicit
`jax.random` key tree for device-side randomness.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return a fresh root JAX PRNG key."""
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.PRNGKey(seed)


class KeySequence:
    """Stateful convenience wrapper yielding fresh subkeys.

    Keeps trainer code readable without threading keys manually through every
    helper; each ``next()`` is a `jax.random.fold_in` on an incrementing
    counter, so streams stay reproducible given the seed.
    """

    def __init__(self, key_or_seed):
        if isinstance(key_or_seed, int):
            key_or_seed = jax.random.PRNGKey(key_or_seed)
        self._key = key_or_seed
        self._count = 0

    def next(self) -> jax.Array:
        self._count += 1
        return jax.random.fold_in(self._key, self._count)

    def __call__(self) -> jax.Array:
        return self.next()
