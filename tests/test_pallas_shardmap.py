"""Fused kernel under shard_map on the virtual 8-device mesh (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polar_code_tpu.ops.scl import decode_scl_batch
from polar_code_tpu.ops.scl_pallas import decode_scl_pallas_sharded
from polar_code_tpu.parallel.mesh import frames_mesh
from polar_code_tpu.polar.construct import construct_info_set

N, K, M = 32, 16, 2
CRC = "0x17"


def test_sharded_kernel_matches_xla():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = frames_mesh(8)
    rng = np.random.default_rng(0)
    B = 32  # 4 frames per device
    info_set = construct_info_set(N, K)
    llr = jnp.asarray(rng.normal(0, 3, size=(B, N)), jnp.float32)

    ref = decode_scl_batch(llr, info_set, M, CRC, dtype=jnp.float32)
    with mesh:
        out = decode_scl_pallas_sharded(
            llr, info_set, M, CRC, mesh=mesh, block_batch=4, interpret=True
        )
    np.testing.assert_array_equal(
        np.asarray(out["best_path_bits"]), np.asarray(ref.best_path_bits)
    )
    np.testing.assert_array_equal(
        np.asarray(out["crc_pass"]), np.asarray(ref.crc_pass)
    )
