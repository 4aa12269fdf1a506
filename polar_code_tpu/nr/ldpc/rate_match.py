"""Simplified NR LDPC rate matching (puncture / repeat) — batched.

Reference semantics: `dl_scl_polar/nr/ldpc/rate_match.py` — truncate or
tile-repeat; derate fills punctured positions with 0.0 (unlike the polar
derate's −1.0 quirk) and averages repeats.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rate_match_ldpc(codeword: jnp.ndarray, E: int) -> jnp.ndarray:
    N = int(codeword.shape[-1])
    if E <= N:
        return codeword[..., :E]
    idx = np.arange(E) % N
    return codeword[..., idx]


def derate_match_ldpc(llr: jnp.ndarray, N: int) -> jnp.ndarray:
    E = int(llr.shape[-1])
    lead = llr.shape[:-1]
    if E <= N:
        fill = jnp.zeros((*lead, N - E), dtype=llr.dtype)
        return jnp.concatenate([llr, fill], axis=-1)
    reps = E // N
    remainder = E % N
    accum = llr[..., : reps * N].reshape(*lead, reps, N).sum(axis=-2)
    counts = np.full(N, reps, dtype=np.float64)
    if remainder:
        tail = jnp.zeros((*lead, N), dtype=llr.dtype)
        tail = tail.at[..., :remainder].set(llr[..., reps * N :])
        accum = accum + tail
        counts[:remainder] += 1
    counts[counts == 0] = 1
    return accum / jnp.asarray(counts, dtype=llr.dtype)


__all__ = ["rate_match_ldpc", "derate_match_ldpc"]
