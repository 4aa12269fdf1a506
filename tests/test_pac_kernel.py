"""Fused PAC kernel vs the XLA legacy decoder (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_code_tpu.legacy.crclib import crc
from polar_code_tpu.legacy.pac import pac_encode_batch, pac_list_decode_batch
from polar_code_tpu.legacy.pac_pallas import pac_list_decode_pallas
from polar_code_tpu.legacy.rate_profile import rateprofile

N, K = 32, 12
CRC_LEN, CRC_POLY = 8, 0xA6
KP = K + CRC_LEN
GEN = (1, 0, 1, 1)
B = 8


@pytest.fixture(scope="module")
def mask():
    rp = rateprofile(N, KP, 2.0, 0)
    rp.build_mask("dega")
    return rp.modify_profile()


def _frames(mask, seed=0, snr_db=3.0):
    rng = np.random.default_rng(seed)
    c = crc(CRC_LEN, CRC_POLY)
    msgs = rng.integers(0, 2, size=(B, K)).astype(np.int8)
    full = np.concatenate(
        [msgs, np.stack([c.crcCalc(m) for m in msgs]).astype(np.int8)], axis=1
    )
    x = np.asarray(pac_encode_batch(jnp.asarray(full), mask, GEN, N))
    nv = 1.0 / (2.0 * (K / N) * 10 ** (snr_db / 10.0))
    y = (1.0 - 2.0 * x) + rng.normal(0, np.sqrt(nv), size=x.shape)
    return jnp.asarray(4.0 / (2 * nv) * y, jnp.float32)


@pytest.mark.parametrize("L", [1, 4])
@pytest.mark.parametrize("full_unroll", [False, True])
def test_pac_kernel_matches_xla(mask, L, full_unroll):
    llr = _frames(mask, seed=L)
    ref = pac_list_decode_batch(
        llr, mask, GEN, L, crc_len=CRC_LEN, crc_poly=CRC_POLY, dtype=jnp.float32
    )
    out = pac_list_decode_pallas(
        llr, mask, GEN, L, crc_len=CRC_LEN, crc_poly=CRC_POLY,
        block_batch=B, interpret=True, full_unroll=full_unroll,
    )
    np.testing.assert_array_equal(
        np.asarray(out["extracted"]), np.asarray(ref["extracted"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["crc_pass"]), np.asarray(ref["crc_pass"])
    )


def test_pac_kernel_polar_mode_no_crc(mask):
    # gen=[1] (no precoding) and no CRC: pure legacy hard-metric SCL
    llr = _frames(mask, seed=9)
    ref = pac_list_decode_batch(llr, mask, (1,), 2, dtype=jnp.float32)
    out = pac_list_decode_pallas(llr, mask, (1,), 2, block_batch=B, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out["extracted"]), np.asarray(ref["extracted"])
    )


def test_pac_kernel_rejects_bad_l(mask):
    llr = _frames(mask)
    with pytest.raises(ValueError):
        pac_list_decode_pallas(llr, mask, GEN, 3, block_batch=B, interpret=True)
    with pytest.raises(ValueError):
        pac_list_decode_pallas(llr, mask, GEN, 16, block_batch=B, interpret=True)


@pytest.mark.parametrize("lazy", [False, True])
def test_pac_kernel_lazy_fork_equal(mask, lazy):
    """σ-map lazy clone (round-4 port from the SCL kernel) must be
    bit-identical to the physical fork-time clone-by-gather."""

    llr = _frames(mask, seed=21)
    ref = pac_list_decode_batch(
        llr, mask, GEN, 4, crc_len=CRC_LEN, crc_poly=CRC_POLY, dtype=jnp.float32
    )
    out = pac_list_decode_pallas(
        llr, mask, GEN, 4, crc_len=CRC_LEN, crc_poly=CRC_POLY,
        block_batch=B, interpret=True, lazy_clone=lazy,
    )
    np.testing.assert_array_equal(
        np.asarray(out["extracted"]), np.asarray(ref["extracted"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["crc_pass"]), np.asarray(ref["crc_pass"])
    )


@pytest.mark.slow
@pytest.mark.parametrize(
    "N2,K2,L,crc_len,crc_poly,profile",
    [
        (128, 64, 8, 16, 0x1021, "dega"),
        (256, 128, 4, 16, 0x1021, "pw"),
    ],
)
def test_pac_kernel_largeN(N2, K2, L, crc_len, crc_poly, profile):
    """PAC kernel at N ≥ 128 (VERDICT r3 #2): the legacy stack supports any
    N via `rateprofile`; the kernel's schedule tables are generic — parity
    vs the XLA decoder at the legacy simulator's CRC-16 0x1021."""

    rp = rateprofile(N2, K2 + crc_len, 2.0, 0)
    rp.build_mask(profile)
    mask2 = rp.modify_profile()
    rng = np.random.default_rng(N2)
    llr = jnp.asarray(rng.normal(0, 3.0, size=(B, N2)), jnp.float32)
    gen = (1, 0, 1, 1, 0, 1, 1)
    ref = pac_list_decode_batch(
        llr, mask2, gen, L, crc_len=crc_len, crc_poly=crc_poly, dtype=jnp.float32
    )
    out = pac_list_decode_pallas(
        llr, mask2, gen, L, crc_len=crc_len, crc_poly=crc_poly,
        block_batch=B, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(out["extracted"]), np.asarray(ref["extracted"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["crc_pass"]), np.asarray(ref["crc_pass"])
    )
