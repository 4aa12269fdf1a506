"""BPSK modulation, AWGN, and LLR computation — batched.

Two energy conventions exist in the reference and both are preserved:

* FER sweeps (`eval/run_fer_sweep.py:62-67`): σ² = 1 / (2 · (K/N) · Eb/N0)
  — the code rate counts all K info+CRC bits.
* Unified BER sweeps (`eval/run_ber_sweep.py:105-109`):
  Es/N0 = Eb/N0 · (K_payload/E), σ² = 1/(2·Es/N0) — CRC bits are overhead.

LLR for BPSK(0→+1, 1→−1) over AWGN: llr = 2y/σ².
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def bpsk(bits: jnp.ndarray) -> jnp.ndarray:
    """Map {0,1} → {+1.0, −1.0}."""

    return 1.0 - 2.0 * bits.astype(jnp.float32)


def noise_var_coded(ebno_db: float, k_bits: int, n_bits: int) -> float:
    """σ² with rate = k_bits/n_bits (FER-sweep convention)."""

    ebno_lin = 10.0 ** (ebno_db / 10.0)
    rate = k_bits / n_bits
    return 1.0 / (2.0 * rate * ebno_lin)


def noise_var_uncoded(ebno_db: float) -> float:
    ebno_lin = 10.0 ** (ebno_db / 10.0)
    return 1.0 / (2.0 * ebno_lin)


def awgn_llr(
    key: jax.Array,
    symbols: jnp.ndarray,
    noise_var,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Add AWGN at σ²=noise_var and return channel LLRs (2y/σ²).

    noise_var may be a Python float or a traced scalar (so one compilation
    serves a whole Eb/N0 sweep).
    """

    noise_var = jnp.asarray(noise_var, dtype)
    sigma = jnp.sqrt(noise_var)
    noise = sigma * jax.random.normal(key, symbols.shape, dtype=dtype)
    received = symbols.astype(dtype) + noise
    return (2.0 / noise_var) * received


__all__ = ["bpsk", "noise_var_coded", "noise_var_uncoded", "awgn_llr"]
