"""CRC as GF(2) linear algebra — batched, XLA-friendly.

The reference computes CRCs by schoolbook GF(2) long division per frame
(`dl_scl_polar/polar/crc.py:19-56`).  Long division is linear over GF(2), so
we precompute (host-side, once per (poly, length)):

* a generator matrix ``G [deg, Kp]`` with ``parity = G @ msg (mod 2)``, and
* a check matrix ``Hc = [G | I_deg]`` with
  ``syndrome = Hc @ (msg ‖ crc) (mod 2)``; the CRC passes iff the syndrome is
  all-zero.

On device both become one small matmul (float32, exact — entries are counts
≤ K < 2^24) followed by ``mod 2``.  This removes the sequential division loop
entirely and batches over frames and SCL paths.

Polynomials are hex strings as in the reference (e.g. "0x1864CFB" = CRC-24A);
the leading 1 of the hex value is the x^deg term.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def poly_to_bits(poly: str) -> np.ndarray:
    """Hex polynomial string → int8 coefficient vector (MSB first)."""

    if not poly:
        raise ValueError("CRC polynomial string must be non-empty")
    value = int(poly, 16)
    bit_length = value.bit_length()
    bits = [(value >> i) & 1 for i in reversed(range(bit_length))]
    return np.array(bits, dtype=np.int8)


def crc_degree(poly: str) -> int:
    degree = poly_to_bits(poly).size - 1
    if degree <= 0:
        raise ValueError("Polynomial degree must be positive")
    return degree


def _remainder(buffer: np.ndarray, poly_bits: np.ndarray) -> np.ndarray:
    """GF(2) long-division remainder of `buffer` by `poly_bits` (host)."""

    degree = poly_bits.size - 1
    buf = buffer.copy()
    for i in range(buf.size - degree):
        if buf[i]:
            buf[i : i + degree + 1] ^= poly_bits
    return buf[-degree:]


@functools.lru_cache(maxsize=None)
def generator_matrix(poly: str, msg_len: int) -> np.ndarray:
    """G [deg, msg_len] with parity(msg) = G @ msg mod 2.

    Column i is the remainder of x^(deg + msg_len - 1 - i) mod g(x), i.e. the
    parity of the i-th unit message.
    """

    poly_bits = poly_to_bits(poly)
    degree = poly_bits.size - 1
    G = np.zeros((degree, msg_len), dtype=np.int8)
    for i in range(msg_len):
        buf = np.zeros(msg_len + degree, dtype=np.int8)
        buf[i] = 1
        G[:, i] = _remainder(buf, poly_bits)
    G.setflags(write=False)
    return G


@functools.lru_cache(maxsize=None)
def check_matrix(poly: str, total_len: int) -> np.ndarray:
    """Hc [deg, total_len] with syndrome(msg‖crc) = Hc @ bits mod 2."""

    degree = crc_degree(poly)
    if total_len <= degree:
        raise ValueError("Message too short for the provided CRC polynomial")
    G = generator_matrix(poly, total_len - degree)
    Hc = np.concatenate([G, np.eye(degree, dtype=np.int8)], axis=1)
    Hc.setflags(write=False)
    return Hc


# ------------------------------------------------------------------
# Batched device ops (jnp; usable inside jit)
# ------------------------------------------------------------------

def attach_crc_batch(msg_bits: jnp.ndarray, poly: str) -> jnp.ndarray:
    """Append CRC parity bits along the last axis.  msg_bits: int [..., Kp]."""

    G = jnp.asarray(generator_matrix(poly, int(msg_bits.shape[-1])), jnp.float32)
    parity = jnp.mod(jnp.matmul(msg_bits.astype(jnp.float32), G.T), 2.0)
    return jnp.concatenate([msg_bits, parity.astype(msg_bits.dtype)], axis=-1)


def check_crc_batch(bits: jnp.ndarray, poly: str, axis: int = -1) -> jnp.ndarray:
    """CRC pass/fail along `axis`.  Returns bool array with `axis` removed."""

    Hc = jnp.asarray(check_matrix(poly, int(bits.shape[axis])), jnp.float32)
    syndrome = jnp.mod(jnp.tensordot(Hc, bits.astype(jnp.float32), axes=([1], [axis])), 2.0)
    # tensordot puts the syndrome axis first; reduce it away.
    return jnp.all(syndrome == 0.0, axis=0)


# ------------------------------------------------------------------
# Scalar host API (reference-compatible signatures)
# ------------------------------------------------------------------

def attach_crc(msg_bits: np.ndarray, poly: str) -> np.ndarray:
    """Append CRC parity bits (host, 1D; matches dl_scl_polar.polar.crc.attach_crc)."""

    msg_bits = np.asarray(msg_bits)
    if msg_bits.ndim != 1:
        raise ValueError("msg_bits must be a 1D array")
    msg_bits = (msg_bits.astype(np.int8) & 1)
    G = generator_matrix(poly, msg_bits.size)
    parity = (G.astype(np.int32) @ msg_bits.astype(np.int32)) % 2
    return np.concatenate([msg_bits, parity.astype(np.int8)])


def check_crc(msg_with_crc: np.ndarray, poly: str) -> bool:
    """True iff the CRC checks out (host, 1D)."""

    msg_with_crc = np.asarray(msg_with_crc)
    if msg_with_crc.ndim != 1:
        raise ValueError("msg_with_crc must be a 1D array")
    bits = (msg_with_crc.astype(np.int8) & 1)
    Hc = check_matrix(poly, bits.size)
    syndrome = (Hc.astype(np.int32) @ bits.astype(np.int32)) % 2
    return not syndrome.any()


__all__ = [
    "poly_to_bits",
    "crc_degree",
    "generator_matrix",
    "check_matrix",
    "attach_crc_batch",
    "check_crc_batch",
    "attach_crc",
    "check_crc",
]
