"""DL-SCL retry pipeline with the sharded kernel backend (interpret, 8-dev mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polar_code_tpu.dlscl.flip import decode_with_retries_batch
from polar_code_tpu.parallel.mesh import frames_mesh
from polar_code_tpu.polar.construct import construct_info_set

N, K, M = 32, 16, 2
CRC = "0x17"


def test_sharded_kernel_retries_match_xla():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = frames_mesh(8)
    info_set = construct_info_set(N, K)
    rng = np.random.default_rng(0)
    B = 32  # 4 frames/device
    llr = jnp.asarray(rng.normal(0, 2.0, size=(B, N)), jnp.float32)

    ref = decode_with_retries_batch(
        llr, info_set, M, 3, crc=CRC, dtype=jnp.float32, backend="xla"
    )
    with mesh:
        out = decode_with_retries_batch(
            llr, info_set, M, 3, crc=CRC, dtype=jnp.float32,
            backend="pallas_sharded", sharded_mesh=mesh, sharded_block=4,
            sharded_interpret=True,
        )
    np.testing.assert_array_equal(
        np.asarray(out["best_path_bits"]), np.asarray(ref["best_path_bits"])
    )
    np.testing.assert_array_equal(np.asarray(out["success"]), np.asarray(ref["success"]))
    np.testing.assert_array_equal(
        np.asarray(out["attempts_used"]), np.asarray(ref["attempts_used"])
    )
