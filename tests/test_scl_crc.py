"""CRC semantics + SCL gain tests (ref categories 1 and 4, deterministic form)."""

import numpy as np
import jax.numpy as jnp

from polar_code_tpu.ops.crc import attach_crc, attach_crc_batch, check_crc, check_crc_batch
from polar_code_tpu.ops.polar_transform import encode_batch
from polar_code_tpu.ops.sc import sc_decode_batch
from polar_code_tpu.ops.scl import decode_scl_batch
from polar_code_tpu.polar.construct import construct_info_set

N, K = 128, 64
CRC = "0x1864CFB"


def test_crc_roundtrip_and_flip():
    rng = np.random.default_rng(0)
    for _ in range(8):
        payload = rng.integers(0, 2, size=40).astype(np.int8)
        msg = attach_crc(payload, CRC)
        assert msg.size == 64
        assert check_crc(msg, CRC)
        for flip in (0, 17, 63):
            bad = msg.copy()
            bad[flip] ^= 1
            assert not check_crc(bad, CRC)


def test_crc_batch_matches_scalar():
    rng = np.random.default_rng(1)
    payloads = rng.integers(0, 2, size=(32, 40)).astype(np.int8)
    batched = np.asarray(attach_crc_batch(jnp.asarray(payloads), CRC)).copy()
    for row, p in zip(batched, payloads):
        np.testing.assert_array_equal(row, attach_crc(p, CRC))
    ok = np.asarray(check_crc_batch(jnp.asarray(batched), CRC))
    assert ok.all()
    batched[:, 5] ^= 1
    ok = np.asarray(check_crc_batch(jnp.asarray(batched), CRC))
    assert not ok.any()


def test_scl_recovers_where_sc_fails():
    """At moderate SNR, CRC-aided SCL M=8 must strictly beat SC on frames."""

    info_set = construct_info_set(N, K)
    rng = np.random.default_rng(1234)
    B = 256
    payload = rng.integers(0, 2, size=(B, 40)).astype(np.int8)
    msg = np.asarray(attach_crc_batch(jnp.asarray(payload), CRC))
    code = np.asarray(encode_batch(jnp.asarray(msg), info_set, N))
    nv = 1.0 / (2.0 * (K / N) * 10 ** (4.5 / 10.0))
    y = (1.0 - 2.0 * code) + rng.normal(0, np.sqrt(nv), size=code.shape)
    llr = jnp.asarray(2.0 * y / nv, jnp.float32)

    sc_bits = np.asarray(sc_decode_batch(llr, info_set))
    sc_ok = np.all(sc_bits == msg, axis=1)

    res = decode_scl_batch(llr, info_set, 8, CRC)
    scl_ok = np.all(np.asarray(res.best_path_bits) == msg, axis=1)

    # SCL must recover at least one SC failure and lose no SC success to a
    # wrong CRC-passing candidate more often than it gains.
    assert scl_ok.sum() > sc_ok.sum()
    assert np.any(scl_ok & ~sc_ok)


def test_scl_candidates_are_metric_sorted():
    info_set = construct_info_set(N, K)
    rng = np.random.default_rng(7)
    llr = jnp.asarray(rng.normal(0, 3.0, size=(4, N)), jnp.float32)
    res = decode_scl_batch(llr, info_set, 8, CRC)
    mets = np.asarray(res.metrics)
    assert (np.diff(mets, axis=1) >= -1e-6).all()
