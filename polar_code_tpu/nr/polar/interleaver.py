"""5G NR-style sub-block interleaver as static gathers.

Reference semantics: `dl_scl_polar/nr/polar/interleaver.py` — fixed block
size 32, pad to a block multiple with −1, permutation
``order[i] = (i % 32)·num_blocks + i // 32`` (row-column transpose);
deinterleave via the inverse permutation.

The permutation depends only on the length, so it is precomputed host-side
and applied as one gather along the last axis — batch-friendly and jittable.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

INTERLEAVER_BLOCK = 32


@functools.lru_cache(maxsize=None)
def interleave_order(length: int, mode: str = "default") -> np.ndarray:
    """Forward permutation for a padded length (row-column transpose)."""

    block = INTERLEAVER_BLOCK
    num_blocks = (length + block - 1) // block
    total = num_blocks * block
    i = np.arange(total)
    order = ((i % block) * num_blocks + i // block).astype(np.int32)
    order.setflags(write=False)
    return order


def subblock_interleave(bits: jnp.ndarray, mode: str = "default") -> jnp.ndarray:
    """Interleave along the last axis; pads with −1 to a block multiple."""

    length = int(bits.shape[-1])
    order = interleave_order(length, mode)
    total = order.size
    if total != length:
        pad = jnp.full((*bits.shape[:-1], total - length), -1, dtype=bits.dtype)
        bits = jnp.concatenate([bits, pad], axis=-1)
    return bits[..., order]


def subblock_deinterleave(
    bits: jnp.ndarray, original_len: int, mode: str = "default"
) -> jnp.ndarray:
    """Invert the interleaver along the last axis (zero-pads short inputs)."""

    order = interleave_order(original_len, mode)
    total = order.size
    cur = int(bits.shape[-1])
    if cur < total:
        pad = jnp.zeros((*bits.shape[:-1], total - cur), dtype=bits.dtype)
        bits = jnp.concatenate([bits, pad], axis=-1)
    inverse = np.argsort(order)
    return bits[..., inverse][..., :original_len]


__all__ = ["subblock_interleave", "subblock_deinterleave", "INTERLEAVER_BLOCK"]
