"""Systematic LDPC encoding with a precomputed GF(2) parity solver.

The reference (`dl_scl_polar/nr/ldpc/encode.py`) runs full GF(2) Gaussian
elimination *per frame*.  Encoding is linear, so we solve once on the host:
with H = [H_sys | H_par], the parity satisfies H_par·p = H_sys·d (mod 2),
hence p = P·d with P = H_par⁻¹·H_sys precomputed by eliminating on H_par.
On device, encoding a batch is one small matmul mod 2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _gf2_inverse(A: np.ndarray) -> np.ndarray:
    """Invert a square GF(2) matrix by Gauss-Jordan elimination."""

    A = (A.copy() % 2).astype(np.uint8)
    n = A.shape[0]
    if A.shape[1] != n:
        raise ValueError("matrix must be square")
    aug = np.concatenate([A, np.eye(n, dtype=np.uint8)], axis=1)
    for col in range(n):
        pivot = None
        for r in range(col, n):
            if aug[r, col]:
                pivot = r
                break
        if pivot is None:
            raise ValueError("parity submatrix is singular over GF(2)")
        if pivot != col:
            aug[[col, pivot]] = aug[[pivot, col]]
        for r in range(n):
            if r != col and aug[r, col]:
                aug[r] ^= aug[col]
    return aug[:, n:]


def parity_solver_matrix(H: np.ndarray, k: int) -> np.ndarray:
    """P [(n−k), k] with parity = P @ payload mod 2."""

    H = np.asarray(H)
    m, n = H.shape
    if n - k != m:
        raise ValueError("expected square parity part: n - k must equal m")
    H_sys = (H[:, :k] % 2).astype(np.uint8)
    H_par = (H[:, k:] % 2).astype(np.uint8)
    P = (_gf2_inverse(H_par) @ H_sys) % 2
    return P.astype(np.int8)


def encode_ldpc_batch(payload: jnp.ndarray, H: np.ndarray) -> jnp.ndarray:
    """payload int [..., k] → codeword int8 [..., n]."""

    m, n = H.shape
    k = int(payload.shape[-1])
    if n <= k:
        raise ValueError("Parity-check matrix too small for payload length")
    P = jnp.asarray(parity_solver_matrix(np.asarray(H), k), jnp.float32)
    parity = jnp.mod(jnp.matmul(payload.astype(jnp.float32), P.T), 2.0)
    return jnp.concatenate(
        [payload.astype(jnp.int8), parity.astype(jnp.int8)], axis=-1
    )


def encode_ldpc(payload: np.ndarray, H: np.ndarray) -> np.ndarray:
    """Scalar reference-compatible API (1D payload)."""

    payload = np.asarray(payload)
    if payload.ndim != 1:
        raise ValueError("payload must be 1D")
    H = np.asarray(H)
    P = parity_solver_matrix(H, payload.size)
    parity = (P.astype(np.int32) @ payload.astype(np.int32)) % 2
    return np.concatenate([payload.astype(np.int8), parity.astype(np.int8)])


__all__ = ["encode_ldpc", "encode_ldpc_batch", "parity_solver_matrix"]
