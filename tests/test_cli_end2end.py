"""End-to-end CLI pipeline (ref category 6): dataset → β train → FER sweep.

Runs the real entry functions with argparse-parsed flags on miniature
configurations, asserting artifact existence and exact CSV headers —
including the `--include_uncoded` column variant.
"""

import numpy as np

from polar_code_tpu.eval import run_fer_sweep
from polar_code_tpu.train import make_dataset, train_beta


def test_pipeline_end2end(tmp_path):
    data_prefix = tmp_path / "data" / "train_M2_snr0_seed0"
    # 1. dataset generation at low SNR so failures (and repairs) occur
    make_dataset.main([
        "--M", "2", "--snr_db", "1.0", "--frames", "192",
        "--seed", "0", "--out", str(data_prefix), "--batch", "64",
    ])
    shard = data_prefix.parent / f"{data_prefix.name}_part0.npz"
    assert shard.exists()
    data = np.load(shard)
    assert data["abs_l0"].ndim == 2 and data["abs_l0"].shape[1] == 64
    assert data["abs_l0"].shape[0] == data["flip_idx"].size > 0
    assert data["abs_l0"].dtype == np.float32
    import json

    meta = json.loads(str(data["meta"]))
    assert meta["M"] == 2 and meta["frames"] == 192
    assert meta["samples"] == data["flip_idx"].size

    # 2. β training (1 epoch)
    train_beta.main([
        "--M", "2", "--data", str(shard), "--epochs", "1",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "logs"),
    ])
    ckpt = tmp_path / "ckpt" / "beta_M2.npy"
    log = tmp_path / "logs" / "train_M2.csv"
    assert ckpt.exists() and log.exists()
    beta = np.load(ckpt)
    assert beta.shape == (64, 64)
    np.testing.assert_allclose(beta, beta.T)
    np.testing.assert_allclose(np.diag(beta), np.ones(64))
    lines = log.read_text().strip().splitlines()
    assert lines[0] == "epoch,train_loss,train_acc,val_loss,val_acc"
    assert len(lines) == 2

    # 3. FER sweep with the trained β, including the uncoded baseline
    run_fer_sweep.main([
        "--M", "2", "--frames", "128", "--snr_lo", "5.0", "--snr_hi", "5.0",
        "--snr_step", "0.5", "--retries", "2", "--beta", str(ckpt),
        "--out_dir", str(tmp_path / "results"), "--plot_dir", str(tmp_path / "plots"),
        "--batch", "64", "--include_uncoded",
    ])
    csv_path = tmp_path / "results" / "fer_M2.csv"
    png_path = tmp_path / "plots" / "fer_M2.png"
    assert csv_path.exists() and png_path.exists()
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0] == "snr_db,fer_uncoded,ber_uncoded,fer_scl,ber_scl,fer_dl,ber_dl"
    assert len(lines) == 2
    vals = lines[1].split(",")
    assert float(vals[0]) == 5.0
    fer_scl, fer_dl = float(vals[3]), float(vals[5])
    assert 0.0 <= fer_dl <= fer_scl <= 1.0


def test_fer_sweep_headers_without_uncoded(tmp_path):
    run_fer_sweep.main([
        "--M", "1", "--frames", "32", "--snr_lo", "6.0", "--snr_hi", "6.0",
        "--out_dir", str(tmp_path / "results"), "--plot_dir", str(tmp_path / "plots"),
        "--batch", "32",
    ])
    csv_path = tmp_path / "results" / "fer_M1.csv"
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0] == "snr_db,fer_scl,ber_scl,fer_dl,ber_dl"


def test_pipeline_end2end_custom_code(tmp_path):
    """The DL-SCL workload generalizes beyond the reference's fixed
    P(128,64): dataset → β train → FER sweep at P(64,32) with the
    corrected construction (no reference counterpart for --N/--K)."""

    data_prefix = tmp_path / "data" / "train_M2_n64"
    make_dataset.main([
        "--M", "2", "--N", "64", "--K", "32",
        "--construction", "gaussian_bitrev",
        "--snr_db", "1.0", "--frames", "192",
        "--seed", "0", "--out", str(data_prefix), "--batch", "64",
    ])
    shard = data_prefix.parent / f"{data_prefix.name}_part0.npz"
    data = np.load(shard)
    assert data["abs_l0"].shape[1] == 32  # K, not the default 64
    import json

    meta = json.loads(str(data["meta"]))
    assert meta["N"] == 64 and meta["K"] == 32
    assert meta["construction"] == "gaussian_bitrev"

    train_beta.main([
        "--M", "2", "--data", str(shard), "--epochs", "1",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "logs"),
    ])
    beta = np.load(tmp_path / "ckpt" / "beta_M2.npy")
    assert beta.shape == (32, 32)  # dim follows the dataset

    run_fer_sweep.main([
        "--M", "2", "--N", "64", "--K", "32",
        "--construction", "gaussian_bitrev",
        "--frames", "128", "--snr_lo", "4.0", "--snr_hi", "4.0",
        "--retries", "2", "--beta", str(tmp_path / "ckpt" / "beta_M2.npy"),
        "--out_dir", str(tmp_path / "results"),
        "--plot_dir", str(tmp_path / "plots"), "--batch", "64",
    ])
    lines = (tmp_path / "results" / "fer_M2.csv").read_text().strip().splitlines()
    assert lines[0] == "snr_db,fer_scl,ber_scl,fer_dl,ber_dl"
    vals = lines[1].split(",")
    assert 0.0 <= float(vals[3]) <= float(vals[1]) <= 1.0
