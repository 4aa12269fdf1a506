"""In-process unified BER sweeps with toy codes (ref category 5)."""

import numpy as np

from polar_code_tpu.eval import run_ber_sweep

CSV_HEADER = (
    "scheme,code,N_or_E,K_payload,K_crc,rate,params,EbN0_dB,"
    "bits_total,bit_errors,ber,fer,avg_work"
)


def _run(argv):
    args = run_ber_sweep.parse_args(argv)
    return run_ber_sweep.run(args), args


def _common(tmp_path, scheme_args, extra=()):
    out = tmp_path / "out.csv"
    argv = scheme_args + [
        "--EbN0_lo", "2.0", "--EbN0_hi", "3.0", "--EbN0_step", "1.0",
        "--bits_cap", "640", "--err_cap", "100000",
        "--seed", "0", "--batch", "16", "--out", str(out),
    ] + list(extra)
    rows, args = _run(argv)
    run_ber_sweep.write_csv(rows, out)
    text = out.read_text().strip().splitlines()
    assert text[0] == CSV_HEADER
    assert len(text) == 1 + len(rows) == 3
    return rows


def test_polar_scl_toy_sweep(tmp_path):
    rows = _common(
        tmp_path,
        ["--scheme", "polar_scl", "--K_payload", "4", "--K_crc", "4",
         "--E", "16", "--N", "16", "--crc_poly", "0x17", "--M", "2"],
    )
    for row in rows:
        assert row["scheme"] == "polar_scl"
        assert row["N_or_E"] == 16
        assert row["K_payload"] == 4
        assert row["bits_total"] >= 640
        assert 0.0 <= row["ber"] <= 1.0
        assert row["avg_work"] == 0.0


def test_dl_scl_toy_sweep(tmp_path):
    beta = np.eye(8, dtype=np.float32)
    beta_path = tmp_path / "beta.npy"
    np.save(beta_path, beta)
    rows = _common(
        tmp_path,
        ["--scheme", "dl_scl", "--K_payload", "4", "--K_crc", "4",
         "--E", "16", "--N", "16", "--crc_poly", "0x17", "--M", "2",
         "--retries", "3", "--beta", str(beta_path)],
    )
    for row in rows:
        assert row["scheme"] == "dl_scl"
        assert row["params"] == "M=2,retries=3"
        assert 0.0 <= row["avg_work"] <= 3.0


def test_nr_polar_toy_sweep(tmp_path):
    rows = _common(
        tmp_path,
        ["--scheme", "nr_polar_scl", "--K_payload", "4", "--K_crc", "4",
         "--E", "24", "--N", "16", "--crc_poly", "0x17", "--M", "2"],
    )
    for row in rows:
        assert row["scheme"] == "nr_polar_scl"
        assert row["N_or_E"] == 24
        assert row["rate"] == 4 / 24


def test_nr_ldpc_toy_sweep(tmp_path):
    # demo BG: k = 3Z must equal K_payload + K_crc; Z=4 → K_total=12
    rows = _common(
        tmp_path,
        ["--scheme", "nr_ldpc", "--K_payload", "8", "--K_crc", "4",
         "--E", "24", "--crc_poly", "0x17", "--bg", "2", "--Z", "4",
         "--max_iter", "10", "--alpha", "0.8"],
    )
    for row in rows:
        assert row["scheme"] == "nr_ldpc"
        assert 0.0 <= row["avg_work"] <= 10.0


def test_ldpc_bg_size_mismatch_raises(tmp_path):
    import pytest

    out = tmp_path / "out.csv"
    argv = [
        "--scheme", "nr_ldpc", "--K_payload", "9", "--K_crc", "4",
        "--E", "24", "--Z", "4", "--EbN0_lo", "2.0", "--EbN0_hi", "2.0",
        "--out", str(out),
    ]
    args = run_ber_sweep.parse_args(argv)
    with pytest.raises(ValueError, match="mismatch"):
        run_ber_sweep.run(args)


def test_dl_scl_requires_beta():
    import pytest

    with pytest.raises(ValueError, match="beta"):
        run_ber_sweep.parse_args([
            "--scheme", "dl_scl", "--K_payload", "4", "--K_crc", "4",
            "--E", "16", "--EbN0_lo", "2.0", "--EbN0_hi", "2.0",
            "--out", "x.csv",
        ])
