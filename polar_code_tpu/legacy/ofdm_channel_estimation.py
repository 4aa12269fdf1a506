"""OFDM LS channel-estimation demo (reference `ofdm_channel_estimation.py`).

Comb-type pilots, frequency-selective Rayleigh channel via FFT of random
taps, least-squares estimation with linear interpolation; returns
(channel MSE, BER).  The per-symbol Python loop of the reference is
vectorized across all OFDM symbols at once.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np


@dataclass(frozen=True)
class OFDMSimulationConfig:
    num_subcarriers: int = 64
    pilot_spacing: int = 4
    num_ofdm_symbols: int = 1000
    snr_db: float = 15.0
    channel_taps: int = 8
    seed: int | None = 0

    def pilot_indices(self) -> np.ndarray:
        pilots = np.arange(0, self.num_subcarriers, self.pilot_spacing)
        if pilots[-1] != self.num_subcarriers - 1:
            pilots = np.append(pilots, self.num_subcarriers - 1)
        return pilots


CONFIG = OFDMSimulationConfig()


def generate_bpsk_symbols(size, rng: np.random.Generator) -> np.ndarray:
    bits = rng.integers(0, 2, size=size)
    return 1 - 2 * bits


def rayleigh_frequency_response(
    num_subcarriers: int, channel_taps: int, rng: np.random.Generator, count: int = 1
) -> np.ndarray:
    """[count, num_subcarriers] random frequency-selective responses."""

    taps = (
        rng.normal(size=(count, channel_taps))
        + 1j * rng.normal(size=(count, channel_taps))
    ) / np.sqrt(2 * channel_taps)
    impulse = np.zeros((count, num_subcarriers), dtype=np.complex128)
    impulse[:, :channel_taps] = taps
    return np.fft.fft(impulse, axis=-1)


def add_awgn(signal: np.ndarray, snr_db: float, rng: np.random.Generator) -> np.ndarray:
    symbol_energy = np.mean(np.abs(signal) ** 2, axis=-1, keepdims=True)
    snr_linear = 10 ** (snr_db / 10.0)
    noise_variance = symbol_energy / snr_linear
    noise = (
        rng.normal(size=signal.shape) + 1j * rng.normal(size=signal.shape)
    ) * np.sqrt(noise_variance / 2.0)
    return signal + noise


def ls_channel_estimate(
    transmitted: np.ndarray, received: np.ndarray, pilot_indices: np.ndarray
) -> np.ndarray:
    """LS estimate at pilots + linear interpolation (supports [S, N] batches)."""

    eps = 1e-12
    tx_p = transmitted[..., pilot_indices]
    rx_p = received[..., pilot_indices]
    safe_tx = np.where(np.abs(tx_p) < eps, eps, tx_p)
    pilot_est = rx_p / safe_tx
    all_idx = np.arange(transmitted.shape[-1])
    if transmitted.ndim == 1:
        re = np.interp(all_idx, pilot_indices, pilot_est.real)
        im = np.interp(all_idx, pilot_indices, pilot_est.imag)
        return re + 1j * im
    out = np.empty(transmitted.shape, dtype=np.complex128)
    for s in range(transmitted.shape[0]):
        out[s] = np.interp(all_idx, pilot_indices, pilot_est[s].real) + 1j * np.interp(
            all_idx, pilot_indices, pilot_est[s].imag
        )
    return out


def simulate(config: OFDMSimulationConfig) -> Tuple[float, float]:
    if config.num_subcarriers < 2:
        raise ValueError("num_subcarriers must be at least 2")
    if config.pilot_spacing < 1:
        raise ValueError("pilot_spacing must be positive")

    rng = np.random.default_rng(config.seed)
    pilots = config.pilot_indices()
    S, N = config.num_ofdm_symbols, config.num_subcarriers

    tx = generate_bpsk_symbols((S, N), rng).astype(np.complex128)
    tx[:, pilots] = generate_bpsk_symbols((S, pilots.size), rng)

    H = rayleigh_frequency_response(N, config.channel_taps, rng, count=S)
    rx = add_awgn(H * tx, config.snr_db, rng)

    H_est = ls_channel_estimate(tx, rx, pilots)
    channel_mse = float(np.mean(np.abs(H_est - H) ** 2))

    safe_est = np.where(np.abs(H_est) < 1e-12, 1e-12, H_est)
    equalized = rx / safe_est
    bits = (tx.real < 0).astype(int)
    detected = (np.sign(equalized.real) < 0).astype(int)
    ber = float(np.mean(bits != detected))
    return channel_mse, ber


def main(config: OFDMSimulationConfig = CONFIG) -> None:
    channel_mse, ber = simulate(config)
    print("OFDM LS Channel Estimation Results")
    print(f"  Num subcarriers       : {config.num_subcarriers}")
    print(f"  Pilot spacing         : {config.pilot_spacing}")
    print(f"  OFDM symbols simulated: {config.num_ofdm_symbols}")
    print(f"  SNR (dB)              : {config.snr_db}")
    print(f"  Channel taps          : {config.channel_taps}")
    print(f"  Average channel MSE   : {channel_mse:.4e}")
    print(f"  Bit error rate        : {ber:.4e}")


if __name__ == "__main__":
    main()
