"""Parity of the NR polar/LDPC comparison codecs vs the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_code_tpu.polar.construct import construct_info_set
from polar_code_tpu.nr.polar.interleaver import subblock_interleave, subblock_deinterleave
from polar_code_tpu.nr.polar.rate_match import rate_match_polar, derate_match_polar
from polar_code_tpu.nr.polar.scl_nr import encode_rate_matched, decode_rate_matched_scl
from polar_code_tpu.nr.ldpc import (
    load_base_graph,
    build_h_matrix,
    encode_ldpc,
    rate_match_ldpc,
    derate_match_ldpc,
    decode_ldpc_nms,
)

from .ref_compat import import_reference


@pytest.fixture(scope="module")
def ref():
    return import_reference()


def test_interleaver_matches_reference(ref):
    rng = np.random.default_rng(0)
    for length in (16, 32, 100, 128):
        bits = rng.integers(0, 2, size=length).astype(np.int8)
        ours = np.asarray(subblock_interleave(jnp.asarray(bits)))
        theirs = ref.nr.polar.interleaver.subblock_interleave(bits)
        np.testing.assert_array_equal(ours, theirs)
        back = np.asarray(subblock_deinterleave(jnp.asarray(ours), length))
        theirs_back = ref.nr.polar.interleaver.subblock_deinterleave(theirs, length)
        np.testing.assert_array_equal(back, theirs_back)
        np.testing.assert_array_equal(back, bits)


def test_polar_rate_match_matches_reference(ref):
    rng = np.random.default_rng(1)
    for N, E in ((128, 100), (128, 128), (128, 256), (128, 300)):
        bits = rng.integers(0, 2, size=N).astype(np.int8)
        ours = np.asarray(rate_match_polar(jnp.asarray(bits), E))
        theirs = ref.nr.polar.rate_match.rate_match_polar(bits, E)
        np.testing.assert_array_equal(ours, theirs)
        llr = rng.normal(size=E)
        ours_d = np.asarray(derate_match_polar(jnp.asarray(llr), N))
        theirs_d = ref.nr.polar.rate_match.derate_match_polar(llr, N)
        np.testing.assert_allclose(ours_d, theirs_d, rtol=1e-12)


def test_nr_polar_roundtrip_matches_reference(ref):
    N, E, Kp = 128, 256, 88 - 24
    K_total = Kp + 24
    info_set = construct_info_set(N, K_total)
    crc = "0x1864CFB"
    rng = np.random.default_rng(2)
    payload = rng.integers(0, 2, size=Kp).astype(np.int8)
    ours_tx = encode_rate_matched(payload, crc, N, E, info_set)
    theirs_tx = ref.nr.polar.scl_nr.encode_rate_matched(payload, crc, N, E, info_set)
    np.testing.assert_array_equal(ours_tx, theirs_tx)

    llr = (1.0 - 2.0 * ours_tx) * 50.0 + rng.normal(0, 0.1, size=E)
    ours_dec = decode_rate_matched_scl(llr, crc, N, E, info_set, M=4)
    theirs_dec = ref.nr.polar.scl_nr.decode_rate_matched_scl(llr, crc, N, E, info_set, M=4)
    assert ours_dec["crc_pass"] == theirs_dec["crc_pass"] == True  # noqa: E712
    np.testing.assert_array_equal(ours_dec["best_path_bits"], theirs_dec["best_path_bits"])
    np.testing.assert_array_equal(ours_dec["payload"], theirs_dec["payload"])


def test_ldpc_encode_matches_reference(ref):
    bg = load_base_graph(2)
    np.testing.assert_array_equal(bg.shifts, ref.nr.ldpc.load_base_graph(2).shifts)
    for Z in (2, 8, 32):
        H = build_h_matrix(bg, Z)
        H_ref = ref.nr.ldpc.build_h_matrix(ref.nr.ldpc.load_base_graph(2), Z)
        np.testing.assert_array_equal(H, H_ref)
        rng = np.random.default_rng(Z)
        payload = rng.integers(0, 2, size=3 * Z).astype(np.int8)
        ours = encode_ldpc(payload, H)
        theirs = ref.nr.ldpc.encode_ldpc(payload, H_ref)
        np.testing.assert_array_equal(ours, theirs)
        assert not ((H @ ours) % 2).any()


def test_ldpc_rate_match_matches_reference(ref):
    rng = np.random.default_rng(3)
    N = 48
    cw = rng.integers(0, 2, size=N).astype(np.int8)
    for E in (32, 48, 96, 100):
        ours = np.asarray(rate_match_ldpc(jnp.asarray(cw), E))
        theirs = ref.nr.ldpc.rate_match_ldpc(cw, E)
        np.testing.assert_array_equal(ours, theirs)
        llr = rng.normal(size=E)
        ours_d = np.asarray(derate_match_ldpc(jnp.asarray(llr), N))
        theirs_d = ref.nr.ldpc.derate_match_ldpc(llr, N)
        np.testing.assert_allclose(ours_d, theirs_d, rtol=1e-12)


@pytest.mark.parametrize("Z", [8, 32])
def test_ldpc_nms_matches_reference(ref, Z):
    bg = load_base_graph(2)
    H = build_h_matrix(bg, Z)
    rng = np.random.default_rng(10 + Z)
    for trial in range(6):
        payload = rng.integers(0, 2, size=3 * Z).astype(np.int8)
        cw = encode_ldpc(payload, H)
        # moderate noise so some trials need several iterations
        llr = (1.0 - 2.0 * cw) * 2.0 + rng.normal(0, 1.0, size=cw.size)
        ours = decode_ldpc_nms(llr, H, max_iter=20, alpha=0.8)
        theirs = ref.nr.ldpc.decode_ldpc_nms(llr, H, max_iter=20, alpha=0.8)
        assert ours["iters_used"] == theirs["iters_used"]
        assert ours["parity_ok"] == theirs["parity_ok"]
        np.testing.assert_array_equal(ours["hard"], theirs["hard"])
