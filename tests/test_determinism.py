"""Reproducibility: identical keys → identical chunk counters across runs."""

import jax

from polar_code_tpu.polar.construct import construct_info_set
from polar_code_tpu.sim.pipeline import make_ber_chunk, make_fer_chunk


def test_fer_chunk_deterministic():
    info_set = construct_info_set(32, 16)
    kwargs = dict(
        N=32, K=16, crc_poly="0x17", info_set=info_set, M=2, retries=2,
        beta=None, batch=32, include_uncoded=True,
    )
    key = jax.random.key(11)
    a = {k: int(v) for k, v in jax.device_get(make_fer_chunk(**kwargs)(key, 0.8, 0.8)).items()}
    b = {k: int(v) for k, v in jax.device_get(make_fer_chunk(**kwargs)(key, 0.8, 0.8)).items()}
    assert a == b
    c = {k: int(v) for k, v in jax.device_get(
        make_fer_chunk(**kwargs)(jax.random.key(12), 0.8, 0.8)
    ).items()}
    assert a != c  # different key gives different noise


def test_ber_chunk_deterministic():
    info_set = construct_info_set(16, 8)
    chunk = make_ber_chunk(
        scheme="polar_scl", E=16, N=16, K_payload=4, K_crc=4, crc_poly="0x17",
        info_set=info_set, M=2, retries=0, beta=None, ilv_mode="default",
        H=None, max_iter=0, alpha=0.8, batch=16,
    )
    key = jax.random.key(3)
    a = jax.device_get(chunk(key, 0.6))
    b = jax.device_get(chunk(key, 0.6))
    assert {k: float(v) for k, v in a.items()} == {k: float(v) for k, v in b.items()}
