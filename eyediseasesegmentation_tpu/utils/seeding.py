"""Seeding discipline.

The reference seeds python/numpy/torch/cudnn with SEED=1999 (``pipeline.py:36-40``).
On TPU the equivalent is: one ``jax.random.PRNGKey`` per experiment, split
deterministically for data order, augmentation, and param init; numpy seeded for
host-side shuffles.
"""

from __future__ import annotations

import random

import jax
import numpy as np

DEFAULT_SEED = 1999


def set_global_seed(seed: int = DEFAULT_SEED) -> jax.Array:
    """Seed host RNGs and return the root JAX key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def key_iter(key: jax.Array):
    """Infinite deterministic stream of PRNG keys."""
    while True:
        key, sub = jax.random.split(key)
        yield sub
