"""Hermetic golden-vector tests (no reference mount required).

`tests/golden/ref_p128_k64.npz` holds channel LLRs and the reference
implementation's outputs (SC, SCL M∈{1,8}, DL-SCL M=2/4 retries), generated
once by `tools/gen_golden.py` from `/root/reference`.  These pin decoder
parity even in environments where the reference tree is absent.
"""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from polar_code_tpu.dlscl.flip import decode_with_retries_batch
from polar_code_tpu.ops.sc import sc_decode_batch
from polar_code_tpu.ops.scl import decode_scl_batch

GOLDEN = Path(__file__).parent / "golden" / "ref_p128_k64.npz"
CRC = "0x1864CFB"


@pytest.fixture(scope="module")
def golden():
    if not GOLDEN.exists():
        pytest.skip("golden file missing")
    return np.load(GOLDEN)


def test_sc_matches_golden(golden):
    out = sc_decode_batch(
        jnp.asarray(golden["llrs"]), golden["info_set"], dtype=jnp.float64
    )
    np.testing.assert_array_equal(np.asarray(out), golden["sc_bits"])


@pytest.mark.parametrize("M", [1, 8])
def test_scl_matches_golden(golden, M):
    res = decode_scl_batch(
        jnp.asarray(golden["llrs"]), golden["info_set"], M, CRC, dtype=jnp.float64
    )
    np.testing.assert_array_equal(
        np.asarray(res.best_path_bits), golden[f"scl_m{M}_best"]
    )
    np.testing.assert_allclose(
        np.asarray(res.metrics), golden[f"scl_m{M}_metrics"], rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res.best_path_info_llrs), golden[f"scl_m{M}_best_llrs"],
        rtol=1e-9, atol=1e-9,
    )


def test_dl_scl_matches_golden(golden):
    out = decode_with_retries_batch(
        jnp.asarray(golden["llrs"]), golden["info_set"], 2, 4, crc=CRC,
        dtype=jnp.float64,
    )
    np.testing.assert_array_equal(
        np.asarray(out["best_path_bits"]), golden["dl_m2_best"]
    )
    np.testing.assert_array_equal(np.asarray(out["success"]), golden["dl_m2_success"])
    np.testing.assert_array_equal(
        np.asarray(out["attempts_used"]), golden["dl_m2_attempts"]
    )
