"""Fast CPU smoke tests for the legacy drivers (tiny configurations)."""

import numpy as np


def test_ofdm_channel_estimation_demo():
    from polar_code_tpu.legacy.ofdm_channel_estimation import (
        OFDMSimulationConfig, simulate,
    )

    mse, ber = simulate(OFDMSimulationConfig(num_ofdm_symbols=100, seed=0))
    assert 0.0 < mse < 1.0
    assert 0.0 <= ber < 0.2


def test_crc_polar_vs_uncoded_driver():
    from polar_code_tpu.legacy.crc_polar_vs_uncoded import (
        SimulationConfig, simulate,
    )

    res = simulate(SimulationConfig(
        n=32, k_info=16, crc_length=8, crc_poly=0xA6, list_size=2,
        snr_points=(3.0,), target_frame_errors=5, max_frames=64,
        batch=32, seed=0, plot_results=False,
    ))
    assert len(res) == 1
    r = res[0]
    assert 0.0 <= r.coded_fer <= 1.0
    assert r.frames_run >= 32


def test_legacy_simulator_driver(tmp_path):
    from polar_code_tpu.legacy.simulator import LegacySimConfig, run

    out = run(LegacySimConfig(
        N=32, R=0.5, crc_len=8, crc_poly=0xA6, list_size=1, list_size_max=2,
        conv_gen=[1, 0, 1, 1], snr_range=[4.0], err_cnt=5, max_frames=64,
        batch=32, seed=0,
    ), out_dir=str(tmp_path))
    assert len(out.fer) == 1 and 0.0 <= out.fer[0] <= 1.0
    csvs = list(tmp_path.glob("PAC*.csv"))
    assert len(csvs) == 1
    text = csvs[0].read_text()
    assert "SNR:" in text and "BER:" in text and "FER:" in text


def test_crc_polar_ofdm_ls_driver():
    from polar_code_tpu.legacy.crc_polar_ofdm_ls import SimulationConfig, simulate

    res = simulate(SimulationConfig(
        n=32, k_info=16, crc_length=8, crc_poly=0xA6, list_size=2,
        snr_points=(12.0,), target_frame_errors=5, max_frames=32,
        num_subcarriers=32, pilot_spacing=4, channel_taps=4,
        batch=16, seed=0, plot_results=False,
    ))
    r = res[0]
    assert 0.0 <= r.perfect_fer <= r.ls_fer <= 1.0 or r.ls_fer <= 1.0
    assert r.avg_channel_mse > 0


def test_legacy_functions_helpers():
    from polar_code_tpu.legacy.functions import (
        bin2dec, bitreversed, conv_1bit, conv_encode, fails, getNextState,
        lowerconv, upperconv,
    )

    assert bitreversed(1, 3) == 4
    assert fails(np.array([0, 1, 1]), np.array([1, 1, 0])) == 2
    assert lowerconv(0, 2.0, 3.0) == 5.0
    assert lowerconv(1, 2.0, 3.0) == 1.0
    assert upperconv(-2.0, 3.0) == -2.0
    assert conv_1bit(1, [1, 0], [1, 1, 1]) == 0
    assert getNextState(1, [0, 0], 2) == [1, 0]
    out = conv_encode(np.array([1, 0, 0, 0]), [1, 1], 1)
    assert out.shape == (4,)
    assert bin2dec([1, 0, 1]) == 5
