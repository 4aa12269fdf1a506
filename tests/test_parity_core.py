"""Bit-for-bit parity of construction/encode/CRC/SC/SCL vs the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_code_tpu.polar.construct import construct_info_set
from polar_code_tpu.ops.crc import attach_crc, check_crc
from polar_code_tpu.ops.polar_transform import encode_batch
from polar_code_tpu.ops.sc import sc_decode_batch
from polar_code_tpu.ops.scl import decode_scl_batch

from .ref_compat import import_reference

N, K = 128, 64
CRC_POLY = "0x1864CFB"


@pytest.fixture(scope="module")
def ref():
    return import_reference()


@pytest.fixture(scope="module")
def info_set():
    return construct_info_set(N, K)


def _random_llrs(count, snr_db=5.0, seed=123):
    rng = np.random.default_rng(seed)
    rate = K / N
    nv = 1.0 / (2.0 * rate * 10 ** (snr_db / 10.0))
    out = []
    for _ in range(count):
        bits = rng.integers(0, 2, size=N)
        sym = 1.0 - 2.0 * bits
        y = sym + rng.normal(0.0, np.sqrt(nv), size=N)
        out.append(2.0 * y / nv)
    return np.stack(out)


def test_info_set_matches_reference(ref, info_set):
    ref_set = ref.polar.polar.construct_info_set(N, K)
    np.testing.assert_array_equal(info_set, ref_set)
    ref_pw = ref.polar.polar.construct_info_set(N, K, method="polarization")
    ours_pw = construct_info_set(N, K, method="polarization")
    np.testing.assert_array_equal(ours_pw, ref_pw)


def test_encode_matches_reference(ref, info_set):
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 2, size=(32, K)).astype(np.int8)
    ours = np.asarray(encode_batch(jnp.asarray(msgs), info_set, N))
    for row, msg in zip(ours, msgs):
        np.testing.assert_array_equal(row, ref.polar.polar.encode(msg))


def test_crc_matches_reference(ref):
    rng = np.random.default_rng(1)
    for _ in range(16):
        payload = rng.integers(0, 2, size=40).astype(np.int8)
        ours = attach_crc(payload, CRC_POLY)
        theirs = ref.polar.crc.attach_crc(payload, CRC_POLY)
        np.testing.assert_array_equal(ours, theirs)
        assert check_crc(ours, CRC_POLY)
        bad = ours.copy()
        bad[7] ^= 1
        assert check_crc(bad, CRC_POLY) == ref.polar.crc.check_crc(bad, CRC_POLY) == False  # noqa: E712


def test_sc_decode_matches_reference(ref, info_set):
    llrs = _random_llrs(64)
    ours = np.asarray(sc_decode_batch(jnp.asarray(llrs), info_set, dtype=jnp.float64))
    for row, llr in zip(ours, llrs):
        np.testing.assert_array_equal(row, ref.polar.polar.sc_decode(llr, info_set))


@pytest.mark.parametrize("M", [1, 2, 4, 8])
@pytest.mark.parametrize("use_crc", [False, True])
def test_scl_matches_reference(ref, info_set, M, use_crc):
    crc = CRC_POLY if use_crc else None
    llrs = _random_llrs(24, seed=7 + M)
    res = decode_scl_batch(jnp.asarray(llrs), info_set, M, crc, dtype=jnp.float64)
    cands = np.asarray(res.candidates)
    mets = np.asarray(res.metrics)
    valid = np.asarray(res.valid)
    best = np.asarray(res.best_path_bits)
    best_llrs = np.asarray(res.best_path_info_llrs)

    for b, llr in enumerate(llrs):
        out = ref.polar.scl.decode_scl(llr, info_set, M, crc=crc)
        n_real = int(valid[b].sum())
        assert n_real == len(out["candidates"])
        for p in range(n_real):
            np.testing.assert_array_equal(cands[b, p], out["candidates"][p])
            np.testing.assert_allclose(mets[b, p], out["metrics"][p], rtol=1e-9, atol=1e-9)
        np.testing.assert_array_equal(best[b], out["best_path_bits"])
        np.testing.assert_allclose(best_llrs[b], out["best_path_info_llrs"], rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("M", [2, 4])
def test_scl_forced_bits_match_reference(ref, info_set, M):
    llrs = _random_llrs(8, seed=99)
    rng = np.random.default_rng(5)
    forced = np.full((len(llrs), K), -1, dtype=np.int8)
    for b in range(len(llrs)):
        # fix a random prefix, flip one bit, leave the rest free
        flip = int(rng.integers(0, 20))
        forced[b, :flip] = rng.integers(0, 2, size=flip)
        forced[b, flip] = rng.integers(0, 2)
    res = decode_scl_batch(
        jnp.asarray(llrs), info_set, M, CRC_POLY,
        force_info_bits=jnp.asarray(forced), dtype=jnp.float64,
    )
    cands = np.asarray(res.candidates)
    valid = np.asarray(res.valid)
    mets = np.asarray(res.metrics)
    for b, llr in enumerate(llrs):
        out = ref.polar.scl.decode_scl(
            llr, info_set, M, crc=CRC_POLY, force_info_bits=forced[b]
        )
        n_real = int(valid[b].sum())
        assert n_real == len(out["candidates"])
        for p in range(n_real):
            np.testing.assert_array_equal(cands[b, p], out["candidates"][p])
            np.testing.assert_allclose(mets[b, p], out["metrics"][p], rtol=1e-9, atol=1e-9)
        np.testing.assert_array_equal(
            np.asarray(res.best_path_bits)[b], out["best_path_bits"]
        )
