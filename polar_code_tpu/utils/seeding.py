"""Deterministic seeding helpers.

The reference (`dl_scl_polar/utils/seeding.py:21-31`) seeds Python, NumPy and
torch global RNG state.  The TPU-native framework is built on `jax.random`
explicit keys instead of global state: every random draw derives from a root
key via `jax.random.fold_in` with structured tags (snr point, chunk, device
shard, ...), which makes results reproducible independent of batch size and
device count.

`seed_all` is kept for API compatibility with the reference; it seeds the
host-side RNGs (Python `random`, NumPy) that construction / dataset-shuffling
code may use, and records the seed for `make_key`.
"""

from __future__ import annotations

import os
import random

import numpy as np
import jax


def seed_all(seed: int, deterministic: bool = True) -> None:
    """Seed host-side RNGs (Python, NumPy).  Device RNG uses explicit keys."""

    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)


def make_key(seed: int) -> jax.Array:
    """Root PRNG key for a run."""

    return jax.random.key(seed)


def fold_key(key: jax.Array, *tags: int) -> jax.Array:
    """Derive a sub-key by folding in a sequence of integer tags.

    Deterministic in the tags regardless of the order in which chunks are
    executed or which device they land on, so sweeps are reproducible across
    batch sizes and meshes.
    """

    for tag in tags:
        key = jax.random.fold_in(key, tag)
    return key
