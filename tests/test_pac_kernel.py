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
