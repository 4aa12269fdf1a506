"""NR polar rate matching (puncture / repeat) — batched static ops.

Reference semantics: `dl_scl_polar/nr/polar/rate_match.py` —
``E ≤ N``: truncate; ``E > N``: tile-repeat.  Derate: ``E < N`` fills the
missing tail with −1.0 (reference quirk, *not* 0 — preserved exactly);
``E > N`` averages the repeated LLRs (full repeats plus the remainder
prefix).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rate_match_polar(bits: jnp.ndarray, E: int, mode: str = "puncture") -> jnp.ndarray:
    """Select E transmitted bits along the last axis."""

    N = int(bits.shape[-1])
    if E <= N:
        return bits[..., :E]
    idx = np.arange(E) % N
    return bits[..., idx]


def derate_match_polar(llr_E: jnp.ndarray, N: int, mode: str = "puncture") -> jnp.ndarray:
    """Map E received LLRs back to N decoder inputs along the last axis."""

    E = int(llr_E.shape[-1])
    lead = llr_E.shape[:-1]
    if E <= N:
        fill = jnp.full((*lead, N - E), -1.0, dtype=llr_E.dtype)
        return jnp.concatenate([llr_E, fill], axis=-1)
    reps = E // N
    remainder = E % N
    accum = llr_E[..., : reps * N].reshape(*lead, reps, N).sum(axis=-2)
    counts = np.full(N, reps, dtype=np.float64)
    if remainder:
        tail = jnp.zeros((*lead, N), dtype=llr_E.dtype)
        tail = tail.at[..., :remainder].set(llr_E[..., reps * N :])
        accum = accum + tail
        counts[:remainder] += 1
    counts[counts == 0] = 1
    return accum / jnp.asarray(counts, dtype=llr_E.dtype)


__all__ = ["rate_match_polar", "derate_match_polar"]
