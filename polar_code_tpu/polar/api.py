"""Scalar reference-compatible API over the batched TPU decoders.

Mirrors the call signatures of the reference modules
(`dl_scl_polar/polar/polar.py`, `scl.py`) so existing reference-style code
and tests can switch frameworks without edits.  Each call wraps a batch of
one; heavy workloads should use the batched APIs directly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..ops.polar_transform import encode_batch
from ..ops.sc import sc_decode as sc_decode  # re-export
from ..ops.scl import decode_scl_batch
from .construct import construct_info_set


def encode(msg_bits: np.ndarray) -> np.ndarray:
    """Encode with the default P(N, K) code (reference `polar.encode`)."""

    cfg = config.DEFAULTS
    msg_bits = np.asarray(msg_bits)
    if msg_bits.ndim != 1:
        raise ValueError("msg_bits must be 1D")
    if msg_bits.size != cfg.K:
        raise ValueError(f"msg_bits must have length {cfg.K}")
    info_set = construct_info_set(cfg.N, cfg.K)
    out = encode_batch(jnp.asarray(msg_bits.astype(np.int8) & 1)[None], info_set, cfg.N)
    return np.asarray(out[0], dtype=np.int8)


@functools.lru_cache(maxsize=32)
def _jitted_scl(info_set_key, M, crc, has_force, dtype_name):
    dtype = jnp.dtype(dtype_name)
    info_set = np.asarray(info_set_key, dtype=np.int64)

    if has_force:
        def run(llr, forced):
            return decode_scl_batch(
                llr, info_set, M, crc, force_info_bits=forced, dtype=dtype
            )
    else:
        def run(llr):
            return decode_scl_batch(llr, info_set, M, crc, dtype=dtype)

    return jax.jit(run)


def decode_scl(
    llr: np.ndarray,
    info_set: np.ndarray,
    M: int,
    crc: Optional[str] = None,
    *,
    force_info_bits: Optional[np.ndarray] = None,
    dtype=jnp.float64,
) -> dict:
    """Reference-compatible SCL decode of one frame → dict of numpy arrays.

    Matches `dl_scl_polar/polar/scl.py:108-209`: returns `candidates`,
    `metrics`, `best_path_bits`, `info_llrs`, `best_path_info_llrs`, with the
    candidate list trimmed to the number of reachable paths.
    """

    llr = np.asarray(llr)
    if M <= 0:
        raise ValueError("List size M must be positive")
    info_set = np.asarray(info_set)
    if info_set.ndim != 1:
        raise ValueError("info_set must be a 1D array")
    forced = None
    if force_info_bits is not None:
        force_info_bits = np.asarray(force_info_bits)
        if force_info_bits.ndim != 1:
            raise ValueError("force_info_bits must be 1D when provided")
        if force_info_bits.size != info_set.size:
            raise ValueError("force_info_bits length must match info_set")
        if not np.all(np.isin(force_info_bits, (-1, 0, 1))):
            raise ValueError("force_info_bits entries must be -1, 0, or 1")
        forced = jnp.asarray(force_info_bits.astype(np.int8))[None]

    fn = _jitted_scl(
        tuple(int(i) for i in info_set), M, crc, forced is not None, jnp.dtype(dtype).name
    )
    res = fn(jnp.asarray(llr)[None], forced) if forced is not None else fn(jnp.asarray(llr)[None])

    valid = np.asarray(res.valid[0])
    n_real = int(valid.sum())
    candidates = [np.asarray(res.candidates[0, p], dtype=np.int8) for p in range(n_real)]
    metrics = [float(res.metrics[0, p]) for p in range(n_real)]
    info_llrs = [np.asarray(res.info_llrs[0, p], dtype=float) for p in range(n_real)]
    best_index = int(res.best_index[0]) if n_real else None
    return {
        "candidates": candidates,
        "metrics": metrics,
        "best_path_bits": candidates[best_index] if best_index is not None else None,
        "info_llrs": info_llrs,
        "best_path_info_llrs": info_llrs[best_index] if best_index is not None else None,
    }


__all__ = ["encode", "sc_decode", "decode_scl", "construct_info_set"]
