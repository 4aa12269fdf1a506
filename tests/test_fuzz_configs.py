"""Property fuzz: kernel ≡ XLA decoder across random (N, K, M, noise) configs."""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_code_tpu.ops.scl import decode_scl_batch
from polar_code_tpu.ops.scl_pallas import decode_scl_pallas
from polar_code_tpu.polar.construct import construct_info_set

CONFIGS = [
    # (N, K, M, crc_poly, llr_scale, seed)
    (16, 8, 2, "0x17", 2.0, 0),
    (16, 12, 4, "0x17", 4.0, 1),
    (32, 10, 1, None, 3.0, 2),
    (32, 24, 8, "0x17", 1.5, 3),
    (64, 40, 4, "0x1864CFB", 2.5, 4),
    (64, 13, 2, "0x17", 6.0, 5),
]


@pytest.mark.parametrize("N,K,M,crc,scale,seed", CONFIGS)
def test_kernel_matches_xla_fuzz(N, K, M, crc, scale, seed):
    if crc is not None and K <= 24 and crc == "0x1864CFB":
        pytest.skip("CRC degree must be < K")
    info_set = construct_info_set(N, K)
    rng = np.random.default_rng(seed)
    B = 8
    llr = jnp.asarray(rng.normal(0, scale, size=(B, N)), jnp.float32)
    ref = decode_scl_batch(llr, info_set, M, crc, dtype=jnp.float32)
    out = decode_scl_pallas(llr, info_set, M, crc, block_batch=B, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out["best_path_bits"]), np.asarray(ref.best_path_bits)
    )
    np.testing.assert_array_equal(
        np.asarray(out["crc_pass"]), np.asarray(ref.crc_pass)
    )
