"""Artifact interchangeability with the reference (datasets, β checkpoints)."""

import os

import numpy as np
import pytest

from polar_code_tpu.train import train_beta

from .ref_compat import REFERENCE_ROOT, reference_available

REF_SHARD = os.path.join(REFERENCE_ROOT, "data", "train_M1_snr5_seed0_part0.npz")
REF_BETA = os.path.join(REFERENCE_ROOT, "checkpoints", "beta_M1.npy")


def test_our_trainer_consumes_reference_shard(tmp_path):
    if not reference_available() or not os.path.exists(REF_SHARD):
        pytest.skip("reference artifacts not mounted")
    train_beta.main([
        "--M", "1", "--data", REF_SHARD, "--epochs", "1",
        "--checkpoint_dir", str(tmp_path / "ckpt"), "--log_dir", str(tmp_path / "logs"),
    ])
    beta = np.load(tmp_path / "ckpt" / "beta_M1.npy")
    assert beta.shape == (64, 64)
    np.testing.assert_allclose(beta, beta.T)
    np.testing.assert_allclose(np.diag(beta), np.ones(64))


def test_reference_beta_checkpoint_loads_in_our_sweep():
    if not reference_available() or not os.path.exists(REF_BETA):
        pytest.skip("reference artifacts not mounted")
    from polar_code_tpu.dlscl.beta import beta_from_checkpoint

    beta = beta_from_checkpoint(REF_BETA)
    assert beta.shape == (64, 64)
    np.testing.assert_allclose(beta, beta.T, atol=1e-6)
    np.testing.assert_allclose(np.diag(beta), np.ones(64), atol=1e-6)
    # usable by the batched retry pipeline
    import jax.numpy as jnp

    from polar_code_tpu.dlscl.flip import decode_with_retries_batch
    from polar_code_tpu.polar.construct import construct_info_set

    rng = np.random.default_rng(0)
    llr = jnp.asarray(rng.normal(0, 3, size=(4, 128)), jnp.float32)
    out = decode_with_retries_batch(
        llr, construct_info_set(128, 64), 1, 2, crc="0x1864CFB",
        beta=jnp.asarray(beta), dtype=jnp.float32,
    )
    assert out["best_path_bits"].shape == (4, 64)


def test_our_shard_loads_in_reference_trainer_loader():
    if not reference_available():
        pytest.skip("reference not mounted")
    import sys

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from dl_scl_polar.train.train_beta import _load_dataset

    shard = "data/train_M1_snr5_seed0_part0.npz"
    if not os.path.exists(shard):
        pytest.skip("local shard not present")
    abs_l0, labels = _load_dataset([shard])
    assert abs_l0.shape[1] == 64
    assert abs_l0.shape[0] == labels.shape[0] > 0
