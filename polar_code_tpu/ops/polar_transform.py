"""Batched Arikan polar transform (encoder).

Reference semantics: `dl_scl_polar/polar/polar.py:17-29` — n stages of in-place
XOR butterflies in *natural* order (no bit-reversal), `x[left] ^= x[right]`.

TPU-native form: the codeword axis is the last axis; each stage is a reshape
to [..., blocks, 2, step] plus one vectorized XOR.  log2(N) fused elementwise
ops over the whole batch — no Python per-frame loops, no scatter.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def polar_transform(u: jnp.ndarray) -> jnp.ndarray:
    """Apply the polar transform along the last axis.  u: int [..., N]."""

    N = int(u.shape[-1])
    n = int(math.log2(N))
    if 1 << n != N:
        raise ValueError("N must be a power of two")
    lead = u.shape[:-1]
    x = u
    for stage in range(n):
        step = 1 << stage
        x = x.reshape(*lead, N // (2 * step), 2, step)
        left = x[..., 0, :] ^ x[..., 1, :]
        x = jnp.stack([left, x[..., 1, :]], axis=-2)
    return x.reshape(*lead, N)


def encode_batch(msg_bits: jnp.ndarray, info_set: np.ndarray, N: int) -> jnp.ndarray:
    """Scatter info bits into u (frozen = 0) and polar-transform.

    msg_bits: int [..., K]; info_set: static int vector; returns [..., N].
    """

    info_set = np.asarray(info_set)
    K = int(info_set.size)
    if int(msg_bits.shape[-1]) != K:
        raise ValueError(f"msg_bits must have trailing length {K}")
    lead = msg_bits.shape[:-1]
    u = jnp.zeros((*lead, N), dtype=msg_bits.dtype)
    u = u.at[..., info_set].set(msg_bits)
    return polar_transform(u)


__all__ = ["polar_transform", "encode_batch"]
