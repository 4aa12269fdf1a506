"""Multi-device sharding tests on the virtual 8-CPU mesh.

Validates that (a) the sharded pipeline runs with real collectives and
(b) chunk counters are *identical* whether the batch is sharded over 1 or
8 devices (deterministic key folding, partitionable threefry).
"""

import jax
import numpy as np
import pytest

from polar_code_tpu.parallel.mesh import frames_mesh
from polar_code_tpu.polar.construct import construct_info_set
from polar_code_tpu.sim.pipeline import make_ber_chunk, make_fer_chunk

N, K = 32, 16
CRC = "0x17"


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (see conftest XLA_FLAGS)")
    return jax.devices()[:8]


def test_fer_chunk_sharding_invariance(eight_devices):
    info_set = construct_info_set(N, K)
    batch = 64
    kwargs = dict(
        N=N, K=K, crc_poly=CRC, info_set=info_set, M=2, retries=2,
        beta=None, batch=batch, include_uncoded=True,
    )
    key = jax.random.key(42)

    single = make_fer_chunk(**kwargs, mesh=None)(key, 1.2, 1.2)
    single = {k: int(v) for k, v in jax.device_get(single).items()}

    mesh = frames_mesh(8)
    with mesh:
        sharded = make_fer_chunk(**kwargs, mesh=mesh)(key, 1.2, 1.2)
    sharded = {k: int(v) for k, v in jax.device_get(sharded).items()}

    assert single == sharded
    assert 0 < single["scl_errors"] <= batch


def test_ber_chunk_sharded_ldpc(eight_devices):
    from polar_code_tpu.nr.ldpc import build_h_matrix, load_base_graph

    H = build_h_matrix(load_base_graph(2), 4)
    mesh = frames_mesh(8)
    chunk = make_ber_chunk(
        scheme="nr_ldpc", E=24, N=24, K_payload=8, K_crc=4, crc_poly=CRC,
        info_set=None, M=2, retries=0, beta=None, ilv_mode="default",
        H=H, max_iter=10, alpha=0.8, batch=64, mesh=mesh,
    )
    with mesh:
        out = jax.device_get(chunk(jax.random.key(0), 0.5))
    assert int(out["frames"]) == 64
    assert 0 <= int(out["bit_errors"]) <= 64 * 8
    assert 0.0 <= float(out["work_sum"]) <= 64 * 10
