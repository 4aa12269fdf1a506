"""Legacy channel class parity vs the reference (deterministic math only)."""

import numpy as np
import pytest

from polar_code_tpu.legacy.channel import channel

from .ref_compat import REFERENCE_ROOT, reference_available


@pytest.fixture(scope="module")
def ref_channel():
    if not reference_available():
        pytest.skip("reference tree not mounted")
    import sys

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import channel as ref_mod

    return ref_mod.channel


@pytest.mark.parametrize("modu", ["BPSK", "QPSK"])
@pytest.mark.parametrize("snrb", ["SNRb", "SNR"])
def test_noise_power_matches(ref_channel, modu, snrb):
    ours = channel(modu, 3.5, snrb, 0.5)
    theirs = ref_channel(modu, 3.5, snrb, 0.5)
    assert ours.noise_power == pytest.approx(theirs.noise_power, rel=1e-12)


@pytest.mark.parametrize("modu", ["BPSK", "QPSK"])
def test_modulate_matches(ref_channel, modu):
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=33)  # odd length exercises QPSK padding
    ours = channel(modu, 4.0, "SNRb", 0.5)
    theirs = ref_channel(modu, 4.0, "SNRb", 0.5)
    np.testing.assert_allclose(
        np.asarray(ours.modulate(bits)), np.asarray(theirs.modulate(bits)), rtol=1e-12
    )


@pytest.mark.parametrize("modu", ["BPSK", "QPSK"])
def test_llr3_matches(ref_channel, modu):
    rng = np.random.default_rng(1)
    ours = channel(modu, 4.0, "SNRb", 0.5)
    theirs = ref_channel(modu, 4.0, "SNRb", 0.5)
    if modu == "BPSK":
        y = rng.normal(size=24)
    else:
        y = rng.normal(size=12) + 1j * rng.normal(size=12)
    np.testing.assert_allclose(
        np.asarray(ours.calc_llr3(y)), np.asarray(theirs.calc_llr3(y)), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(ours.calc_llr(y)), np.asarray(theirs.calc_llr(y)), rtol=1e-12
    )


def test_constellation_matches(ref_channel):
    ours = channel("QPSK", 4.0, "SNRb", 0.5)
    theirs = ref_channel("QPSK", 4.0, "SNRb", 0.5)
    np.testing.assert_allclose(ours.constell, theirs.constell, rtol=1e-12)


@pytest.mark.parametrize("modu", ["BPSK", "QPSK"])
def test_llr2_maxlog_matches(ref_channel, modu):
    """Approx (min-distance) LLR variant — unused by reference drivers but
    part of the channel API surface (reference channel.py:71-95)."""

    rng = np.random.default_rng(2)
    ours = channel(modu, 4.0, "SNRb", 0.5)
    theirs = ref_channel(modu, 4.0, "SNRb", 0.5)
    if modu == "BPSK":
        y = rng.normal(size=24)
    else:
        y = rng.normal(size=12) + 1j * rng.normal(size=12)
    np.testing.assert_allclose(
        np.asarray(ours.calc_llr2(y)), np.asarray(theirs.calc_llr2(y)), rtol=1e-10
    )


def test_subconstells_and_llr2_underscore_match(ref_channel):
    """Sub-constellation helpers (reference channel.py:122-148), replicated
    verbatim including the reference's N0-on-imag-only quirk."""

    rng = np.random.default_rng(3)
    ours = channel("QPSK", 4.0, "SNRb", 0.5)
    theirs = ref_channel("QPSK", 4.0, "SNRb", 0.5)
    np.testing.assert_allclose(ours.subconstells, theirs.subconstells, rtol=1e-12)
    y = complex(rng.normal(), rng.normal())
    np.testing.assert_allclose(
        np.asarray(ours.sum_num_denum(y)), np.asarray(theirs.sum_num_denum(y)),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(ours.calc_llr2_(y)), np.asarray(theirs.calc_llr2_(y)), rtol=1e-10
    )
