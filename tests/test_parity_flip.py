"""Parity of DL-SCL flip-retry (scalar + batched) vs the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_code_tpu.polar.construct import construct_info_set
from polar_code_tpu.dlscl.flip import (
    choose_flip_index,
    decode_with_retries,
    decode_with_retries_batch,
    retry_with_flip,
)

from .ref_compat import import_reference

N, K = 128, 64
CRC = "0x1864CFB"


@pytest.fixture(scope="module")
def ref():
    return import_reference()


@pytest.fixture(scope="module")
def info_set():
    return construct_info_set(N, K)


def _noisy_frames(count, snr_db=4.0, seed=42):
    """Frames noisy enough that a good fraction fail baseline SCL."""

    import polar_code_tpu.ops.crc as crc_ops
    from polar_code_tpu.ops.polar_transform import encode_batch

    rng = np.random.default_rng(seed)
    rate = K / N
    nv = 1.0 / (2.0 * rate * 10 ** (snr_db / 10.0))
    payloads = rng.integers(0, 2, size=(count, K - 24)).astype(np.int8)
    msgs = np.stack([crc_ops.attach_crc(p, CRC) for p in payloads])
    info = construct_info_set(N, K)
    codes = np.asarray(encode_batch(jnp.asarray(msgs), info, N))
    sym = 1.0 - 2.0 * codes
    llrs = 2.0 * (sym + rng.normal(0, np.sqrt(nv), size=sym.shape)) / nv
    return llrs, msgs


def test_choose_flip_index_matches_reference(ref):
    rng = np.random.default_rng(0)
    abs_l0 = np.abs(rng.normal(size=K))
    beta = rng.normal(size=(K, K))
    assert choose_flip_index(abs_l0, None) == ref.dlscl.flip.choose_flip_index(abs_l0, None)
    assert choose_flip_index(abs_l0, beta) == ref.dlscl.flip.choose_flip_index(abs_l0, beta)


@pytest.mark.parametrize("use_beta", [False, True])
def test_decode_with_retries_scalar_matches_reference(ref, info_set, use_beta):
    llrs, _ = _noisy_frames(6)
    beta = None
    if use_beta:
        rng = np.random.default_rng(1)
        off = rng.normal(0, 0.05, size=(K, K))
        beta = np.triu(off, 1) + np.triu(off, 1).T + np.eye(K)
    for llr in llrs:
        ours = decode_with_retries(llr, info_set, 2, 4, crc=CRC, beta=beta)
        theirs = ref.dlscl.flip.decode_with_retries(llr, info_set, 2, 4, crc=CRC, beta=beta)
        assert ours["success"] == theirs["success"]
        assert ours["tried_indices"] == theirs["tried_indices"]
        assert len(ours["attempts"]) == len(theirs["attempts"])
        np.testing.assert_array_equal(ours["best_path_bits"], theirs["best_path_bits"])


@pytest.mark.parametrize("use_beta", [False, True])
def test_decode_with_retries_batch_matches_reference(ref, info_set, use_beta):
    llrs, _ = _noisy_frames(12, seed=77)
    beta = None
    if use_beta:
        rng = np.random.default_rng(2)
        off = rng.normal(0, 0.05, size=(K, K))
        beta = np.triu(off, 1) + np.triu(off, 1).T + np.eye(K)
    M, retries = 2, 4
    out = decode_with_retries_batch(
        jnp.asarray(llrs), info_set, M, retries, crc=CRC,
        beta=jnp.asarray(beta) if beta is not None else None, dtype=jnp.float64,
    )
    best = np.asarray(out["best_path_bits"])
    success = np.asarray(out["success"])
    attempts = np.asarray(out["attempts_used"])
    any_retry = False
    for b, llr in enumerate(llrs):
        theirs = ref.dlscl.flip.decode_with_retries(
            llr, info_set, M, retries, crc=CRC, beta=beta
        )
        any_retry = any_retry or len(theirs["attempts"]) > 1
        assert bool(success[b]) == theirs["success"]
        assert int(attempts[b]) == len(theirs["attempts"]) - 1
        np.testing.assert_array_equal(best[b], theirs["best_path_bits"])
    assert any_retry, "test fixture produced no retry cases — raise the noise"
