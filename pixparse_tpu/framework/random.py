"""Seeding.

The reference seeds torch/numpy/random with ``seed + rank``
(``framework/random.py:8-11``). Here host-side RNG (numpy/random — data
pipeline, augmentations) is seeded the same way, and device-side randomness is
a threaded ``jax.random`` key derived from the same value, which is the
idiomatic JAX replacement for global torch RNG state.
"""

from __future__ import annotations

import random as _random

import numpy as np


def random_seed(seed: int = 42, rank: int = 0) -> int:
    effective = seed + rank
    np.random.seed(effective)
    _random.seed(effective)
    return effective


def jax_key(seed: int = 42, rank: int = 0):
    import jax

    return jax.random.PRNGKey(seed + rank)
