"""Sweep checkpoint/resume tests (toy configs on CPU)."""

import json

import numpy as np

from polar_code_tpu.eval import run_ber_sweep, run_fer_sweep
from polar_code_tpu.utils.resume import SweepState


def test_sweep_state_roundtrip(tmp_path):
    path = tmp_path / "state.json"
    s = SweepState(str(path), {"a": 1})
    assert s.get(5.0) is None
    s.record(5.0, {"x": 1.5})
    # same config resumes
    s2 = SweepState(str(path), {"a": 1})
    assert s2.get(5.0) == {"x": 1.5}
    # different config starts fresh
    s3 = SweepState(str(path), {"a": 2})
    assert s3.get(5.0) is None
    # corrupt file tolerated
    path.write_text("{not json")
    s4 = SweepState(str(path), {"a": 1})
    assert s4.get(5.0) is None


def test_fer_sweep_resume(tmp_path):
    state = tmp_path / "fer_state.json"
    argv = [
        "--M", "1", "--frames", "64", "--snr_lo", "5.0", "--snr_hi", "5.5",
        "--snr_step", "0.5", "--retries", "1", "--batch", "32",
        "--out_dir", str(tmp_path / "r1"), "--plot_dir", str(tmp_path / "p1"),
        "--state", str(state),
    ]
    run_fer_sweep.main(argv)
    first = (tmp_path / "r1" / "fer_M1.csv").read_text()
    data = json.loads(state.read_text())
    assert len(data["rows"]) == 2

    # tamper with the state rows; a resumed run must serve them verbatim
    for key in data["rows"]:
        data["rows"][key]["fer_scl"] = 0.123456
    state.write_text(json.dumps(data))
    argv[argv.index(str(tmp_path / "r1"))] = str(tmp_path / "r2")
    run_fer_sweep.main(argv)
    second = (tmp_path / "r2" / "fer_M1.csv").read_text()
    assert "1.234560e-01" in second
    assert first != second


def test_ber_sweep_resume(tmp_path):
    state = tmp_path / "ber_state.json"
    out1 = tmp_path / "one.csv"
    argv = [
        "--scheme", "polar_scl", "--K_payload", "4", "--K_crc", "4",
        "--E", "16", "--N", "16", "--crc_poly", "0x17", "--M", "2",
        "--EbN0_lo", "2.0", "--EbN0_hi", "3.0", "--EbN0_step", "1.0",
        "--bits_cap", "256", "--err_cap", "100000", "--batch", "16",
        "--out", str(out1), "--state", str(state),
    ]
    run_ber_sweep.main(argv)
    data = json.loads(state.read_text())
    assert len(data["rows"]) == 2
    out2 = tmp_path / "two.csv"
    argv[argv.index(str(out1))] = str(out2)
    run_ber_sweep.main(argv)
    assert out1.read_text() == out2.read_text()
