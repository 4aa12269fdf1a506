"""Deterministic round-trip tests for construction/encode/SC (ref category 1)."""

import numpy as np
import jax.numpy as jnp

from polar_code_tpu.ops.polar_transform import encode_batch, polar_transform
from polar_code_tpu.ops.sc import sc_decode_batch
from polar_code_tpu.polar.construct import construct_info_set

N, K = 128, 64


def test_polar_transform_involution():
    # The Arikan transform is its own inverse over GF(2).
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.integers(0, 2, size=(8, N)).astype(np.int8))
    x = polar_transform(u)
    np.testing.assert_array_equal(np.asarray(polar_transform(x)), np.asarray(u))


def test_encode_sc_roundtrip_noiseless():
    info_set = construct_info_set(N, K)
    rng = np.random.default_rng(1)
    msg = rng.integers(0, 2, size=(16, K)).astype(np.int8)
    code = encode_batch(jnp.asarray(msg), info_set, N)
    llr = jnp.asarray((1.0 - 2.0 * np.asarray(code)) * 1e6)
    decoded = sc_decode_batch(llr, info_set)
    np.testing.assert_array_equal(np.asarray(decoded), msg)


def test_sc_high_snr_awgn():
    info_set = construct_info_set(N, K)
    rng = np.random.default_rng(2)
    msg = rng.integers(0, 2, size=(16, K)).astype(np.int8)
    code = np.asarray(encode_batch(jnp.asarray(msg), info_set, N))
    snr_lin = 10 ** (8.0 / 10.0)
    nv = 1.0 / (2.0 * (K / N) * snr_lin)
    y = (1.0 - 2.0 * code) + rng.normal(0, np.sqrt(nv), size=code.shape)
    llr = jnp.asarray(2.0 * y / nv)
    decoded = np.asarray(sc_decode_batch(llr, info_set))
    assert np.mean(np.all(decoded == msg, axis=1)) >= 0.9


def test_construct_info_set_validation():
    import pytest

    with pytest.raises(ValueError):
        construct_info_set(100, 50)  # not a power of two
    with pytest.raises(ValueError):
        construct_info_set(128, 0)
    with pytest.raises(ValueError):
        construct_info_set(128, 64, method="bogus")
