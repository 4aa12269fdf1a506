"""Rate-matched polar SCL wrappers following the simplified 5G NR flow.

Reference semantics: `dl_scl_polar/nr/polar/scl_nr.py:23-57` —
encode = CRC → polar(N) → sub-block interleave → rate match(E);
decode = derate → deinterleave → SCL → {"payload", "crc_pass",
"best_path_bits"} where "payload" is the first len(info_set) bits of the
best path (i.e. all info+CRC bits, reference quirk preserved).

Both batched (jnp, [B, ·]) and scalar (1D numpy) entry points.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ...ops.crc import attach_crc_batch, check_crc_batch
from ...ops.polar_transform import encode_batch
from ...ops.scl import decode_scl_batch
from .interleaver import subblock_deinterleave, subblock_interleave
from .rate_match import derate_match_polar, rate_match_polar


def encode_rate_matched_batch(
    payload_bits: jnp.ndarray,
    crc_poly: str,
    N: int,
    E: int,
    info_set: np.ndarray,
    ilv_mode: str = "default",
) -> jnp.ndarray:
    """payload [..., Kp] → transmitted bits [..., E]."""

    msg = attach_crc_batch(payload_bits, crc_poly)
    codeword = encode_batch(msg, info_set, N)
    ilv = subblock_interleave(codeword, mode=ilv_mode)
    return rate_match_polar(ilv, E)


def decode_rate_matched_scl_batch(
    llr_E: jnp.ndarray,
    crc_poly: str,
    N: int,
    E: int,
    info_set: np.ndarray,
    M: int,
    ilv_mode: str = "default",
    *,
    dtype=jnp.float32,
    backend: str = "xla",
) -> Dict[str, jnp.ndarray]:
    """llr [B, E] → {"payload" [B, K], "crc_pass" [B], "best_path_bits" [B, K]}."""

    llr_internal = derate_match_polar(llr_E, N)
    llr_internal = subblock_deinterleave(llr_internal, N, mode=ilv_mode)
    if backend == "pallas":
        from ...ops.scl_pallas import decode_scl_pallas

        bits = decode_scl_pallas(llr_internal, info_set, M, crc_poly)["best_path_bits"]
    else:
        res = decode_scl_batch(llr_internal, info_set, M, crc_poly, dtype=dtype)
        bits = res.best_path_bits
    return {
        "payload": bits[:, : len(np.asarray(info_set))],
        "crc_pass": check_crc_batch(bits, crc_poly),
        "best_path_bits": bits,
    }


# Scalar reference-compatible wrappers -------------------------------------

def encode_rate_matched(
    payload_bits: np.ndarray,
    crc_poly: str,
    N: int,
    E: int,
    info_set: np.ndarray,
    ilv_mode: str = "default",
) -> np.ndarray:
    out = encode_rate_matched_batch(
        jnp.asarray(np.asarray(payload_bits).astype(np.int8))[None],
        crc_poly, N, E, info_set, ilv_mode,
    )
    return np.asarray(out[0], dtype=np.int8)


def decode_rate_matched_scl(
    llr_E: np.ndarray,
    crc_poly: str,
    N: int,
    E: int,
    info_set: np.ndarray,
    M: int,
    ilv_mode: str = "default",
) -> Dict[str, np.ndarray]:
    res = decode_rate_matched_scl_batch(
        jnp.asarray(np.asarray(llr_E, dtype=np.float64))[None],
        crc_poly, N, E, info_set, M, ilv_mode, dtype=jnp.float64,
    )
    bits = np.asarray(res["best_path_bits"][0], dtype=np.int8)
    return {
        "payload": np.asarray(res["payload"][0], dtype=np.int8),
        "crc_pass": bool(res["crc_pass"][0]),
        "best_path_bits": bits,
    }


__all__ = [
    "encode_rate_matched",
    "decode_rate_matched_scl",
    "encode_rate_matched_batch",
    "decode_rate_matched_scl_batch",
]
