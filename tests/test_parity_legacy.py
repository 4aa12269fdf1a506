"""Parity of the legacy PAC/rate-profile/CRC/channel layer vs the reference."""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

from polar_code_tpu.legacy.rate_profile import rateprofile
from polar_code_tpu.legacy.crclib import crc
from polar_code_tpu.legacy.pac import (
    conv_transform_matrix,
    pac_encode_batch,
    pac_list_decode_batch,
)
from polar_code_tpu.legacy.polar_code import PolarCode

from .ref_compat import REFERENCE_ROOT, reference_available


@pytest.fixture(scope="module")
def legacy_ref():
    if not reference_available():
        pytest.skip("reference tree not mounted")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import polar_coding_functions as pcfun
    import rate_profile as ref_rp
    import crclib as ref_crclib
    import polar_code as ref_pc

    return pcfun, ref_rp, ref_crclib, ref_pc


@pytest.mark.parametrize("profile", ["bh", "dega", "pw", "rm-polar"])
@pytest.mark.parametrize("swaps", [0, 3])
def test_rate_profile_masks_match(legacy_ref, profile, swaps):
    _, ref_rp, _, _ = legacy_ref
    for N, Kp in ((64, 32), (128, 70)):
        ours = rateprofile(N, Kp, 2.0, swaps)
        theirs = ref_rp.rateprofile(N, Kp, 2.0, swaps)
        m1 = ours.build_mask(profile)
        m2 = theirs.build_mask(profile)
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(ours.modify_profile(), theirs.modify_profile())


def test_conv_encode_matches(legacy_ref):
    pcfun, _, _, _ = legacy_ref
    rng = np.random.default_rng(0)
    gen = (1, 0, 1, 1, 0, 1, 1)
    N = 64
    T = conv_transform_matrix(gen, N)
    for _ in range(6):
        v = rng.integers(0, 2, size=N)
        ref_u = pcfun.conv_encode(v, list(gen), len(gen) - 1)
        ours = (T.astype(int) @ v) % 2
        np.testing.assert_array_equal(ours, ref_u)


@pytest.mark.parametrize("crc_len,poly", [(12, 0xC06), (16, 0x1021)])
def test_crclib_matches(legacy_ref, crc_len, poly):
    # NB: the reference's CRC-8 table builder raises OverflowError on
    # NumPy ≥ 2 (crclib.py:50 stores an unmasked 9-bit value into uint8),
    # so CRC-8 is covered by the self-consistency test below instead.
    _, _, ref_crclib, _ = legacy_ref
    rng = np.random.default_rng(1)
    ours = crc(crc_len, poly)
    theirs = ref_crclib.crc(crc_len, poly)
    for size in (24, 32, 61):
        info = rng.integers(0, 2, size=size).astype(np.int8)
        assert ours.crcCalc(info) == list(theirs.crcCalc(info))


def test_crclib_crc8_self_consistent():
    rng = np.random.default_rng(4)
    ours = crc(8, 0xA6)
    for size in (24, 61):
        info = rng.integers(0, 2, size=size).astype(np.int8)
        rem = ours.crcCalc(info)
        assert len(rem) == 8
        # appending the remainder makes the full word divisible
        full = np.concatenate([info, np.asarray(rem, dtype=np.int8)])
        assert sum(ours.crcCalc(full)) == 0


def _mk_codes(legacy_ref, N, Kp, gen, L, profile="dega"):
    _, ref_rp, _, ref_pc = legacy_ref
    ours_rp = rateprofile(N, Kp, 2.0, 0)
    ref_rprofile = ref_rp.rateprofile(N, Kp, 2.0, 0)
    ours = PolarCode(N, Kp, profile, L, ours_rp)
    theirs = ref_pc.PolarCode(N, Kp, profile, L, ref_rprofile)
    theirs.m = len(gen) - 1
    theirs.gen = list(gen)
    theirs.cur_state = [0] * (len(gen) - 1)
    ours.m = len(gen) - 1
    ours.gen = list(gen)
    return ours, theirs


def test_pac_encode_matches(legacy_ref):
    gen = (1, 0, 1, 1, 0, 1, 1)
    N, Kp, L = 64, 32, 2
    ours, theirs = _mk_codes(legacy_ref, N, Kp, gen, L)
    rng = np.random.default_rng(2)
    for _ in range(4):
        info = rng.integers(0, 2, size=Kp)
        np.testing.assert_array_equal(
            ours.pac_encode(info, list(gen), len(gen) - 1, False),
            theirs.pac_encode(info, list(gen), len(gen) - 1, False),
        )


@pytest.mark.parametrize("L", [1, 4])
def test_pac_decoder_matches(legacy_ref, L):
    import crclib as ref_crclib

    gen = (1, 0, 1, 1, 0, 1, 1)
    N, K = 64, 32
    crc_len, crc_poly = 16, 0x1021
    Kp = K + crc_len
    ours, theirs = _mk_codes(legacy_ref, N, Kp, gen, L)
    crc_ours = crc(crc_len, crc_poly)
    crc_theirs = ref_crclib.crc(crc_len, crc_poly)

    rng = np.random.default_rng(3 + L)
    nv = 1.0 / (2.0 * (K / N) * 10 ** (3.5 / 10.0))
    for _ in range(5):
        message = rng.integers(0, 2, size=K)
        message = np.append(message, crc_ours.crcCalc(message))
        x = ours.pac_encode(message, list(gen), len(gen) - 1, False)
        # the reference decoder requires encode-time genie state (trdata)
        np.testing.assert_array_equal(
            x, theirs.pac_encode(message, list(gen), len(gen) - 1, False)
        )
        y = (1.0 - 2.0 * x) + rng.normal(0, np.sqrt(nv), size=N)
        llr = 4.0 / (2 * nv) * y  # matches channel.calc_llr BPSK scale

        got = ours.pac_list_crc_decoder(llr, False, True, crc_ours, L)
        want = theirs.pac_list_crc_decoder(llr, False, True, crc_theirs, L)
        np.testing.assert_array_equal(got, np.asarray(want, dtype=int))


def test_pac_batched_decoder_self_consistent(legacy_ref):
    """Batched decode equals per-frame scalar decode."""

    gen = (1, 0, 1, 1)
    N, Kp, L = 32, 16, 4
    ours, _ = _mk_codes(legacy_ref, N, Kp, gen, L)
    rng = np.random.default_rng(9)
    infos = rng.integers(0, 2, size=(6, Kp)).astype(np.int8)
    x = np.asarray(pac_encode_batch(jnp.asarray(infos), ours.polarcode_mask, gen, N))
    llr = 2.0 * ((1.0 - 2.0 * x) + rng.normal(0, 0.7, size=x.shape))
    batched = pac_list_decode_batch(
        jnp.asarray(llr), ours.polarcode_mask, gen, L, dtype=jnp.float64
    )
    for b in range(len(infos)):
        single = pac_list_decode_batch(
            jnp.asarray(llr[b : b + 1]), ours.polarcode_mask, gen, L, dtype=jnp.float64
        )
        np.testing.assert_array_equal(
            np.asarray(batched["extracted"][b]), np.asarray(single["extracted"][0])
        )


def test_helper_variants_match(legacy_ref):
    """The exact-f helper variants (reference polar_coding_functions.py:57-132)
    unused by any reference driver — completeness of the function surface."""
    pcfun, _, _, _ = legacy_ref
    from polar_code_tpu.legacy.functions import (
        conv1bit_getNextStates,
        logdomain_sum2,
        upperconv2,
    )

    rng = np.random.default_rng(7)
    for _ in range(5):
        x = rng.normal(0, 4, size=16)
        y = rng.normal(0, 4, size=16)
        np.testing.assert_allclose(
            logdomain_sum2(x, y), pcfun.logdomain_sum2(x, y), rtol=0, atol=0
        )
        np.testing.assert_allclose(
            upperconv2(x, y), pcfun.upperconv2(x, y), rtol=0, atol=0
        )

    gen1 = [1, 0, 1, 1, 0, 1, 1]
    gen2 = [1, 1, 0, 1, 1]
    m1, m2 = len(gen1) - 1, len(gen2) - 1
    for trial in range(20):
        in_bit = int(rng.integers(0, 2))
        s1 = [int(b) for b in rng.integers(0, 2, size=m1)]
        s2 = [int(b) for b in rng.integers(0, 2, size=m2)]
        flag = trial % 2
        ours = conv1bit_getNextStates(in_bit, list(s1), list(s2), gen1, gen2, flag)
        ref = pcfun.conv1bit_getNextStates(in_bit, list(s1), list(s2), gen1, gen2, flag)
        assert ours[0] == ref[0]
        assert list(ours[1]) == list(ref[1])
        assert list(ours[2]) == list(ref[2])
