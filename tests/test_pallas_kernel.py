"""Pallas SCL kernel vs the XLA decoder (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_code_tpu.ops.scl import decode_scl_batch
from polar_code_tpu.ops.scl_pallas import decode_scl_pallas
from polar_code_tpu.polar.construct import construct_info_set

N, K = 32, 16
CRC = "0x17"
B = 8


@pytest.fixture(scope="module")
def info_set():
    return construct_info_set(N, K)


def _llrs(seed=0, scale=3.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, scale, size=(B, N)), jnp.float32)


@pytest.mark.parametrize("M", [1, 2, 4])
@pytest.mark.parametrize("use_crc", [True, False])
@pytest.mark.parametrize("full_unroll", [False, True])
def test_kernel_matches_xla(info_set, M, use_crc, full_unroll):
    crc = CRC if use_crc else None
    llr = _llrs(seed=M)
    ref = decode_scl_batch(llr, info_set, M, crc, dtype=jnp.float32)
    out = decode_scl_pallas(
        llr, info_set, M, crc, block_batch=B, interpret=True,
        full_unroll=full_unroll,
    )
    np.testing.assert_array_equal(
        np.asarray(out["best_path_bits"]), np.asarray(ref.best_path_bits)
    )
    np.testing.assert_array_equal(
        np.asarray(out["crc_pass"]), np.asarray(ref.crc_pass)
    )
    np.testing.assert_allclose(
        np.asarray(out["best_path_info_llrs"]),
        np.asarray(ref.best_path_info_llrs),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("M", [1, 4])
@pytest.mark.parametrize("loop_unroll", [1, 4, 8, 16, 32])
def test_kernel_loop_unroll_matches_xla(info_set, M, loop_unroll):
    """The partial-unroll loop family (U phases per iteration, static
    schedule for all but the block-leading g and block-trailing store) must
    be bit-identical to the XLA decoder for every unroll factor, including
    U=1 (plain loop) and U=N (fully static within one iteration)."""

    llr = _llrs(seed=21 + M)
    ref = decode_scl_batch(llr, info_set, M, CRC, dtype=jnp.float32)
    out = decode_scl_pallas(
        llr, info_set, M, CRC, block_batch=B, interpret=True,
        full_unroll=False, loop_unroll=loop_unroll,
        pair_unroll=loop_unroll > 1,
    )
    np.testing.assert_array_equal(
        np.asarray(out["best_path_bits"]), np.asarray(ref.best_path_bits)
    )
    np.testing.assert_array_equal(
        np.asarray(out["crc_pass"]), np.asarray(ref.crc_pass)
    )
    np.testing.assert_allclose(
        np.asarray(out["best_path_info_llrs"]),
        np.asarray(ref.best_path_info_llrs),
        rtol=1e-5, atol=1e-5,
    )


def test_kernel_forced_plan_matches_xla(info_set):
    M = 4
    llr = _llrs(seed=9)
    base = decode_scl_batch(llr, info_set, M, CRC, dtype=jnp.float32)
    bits = np.asarray(base.best_path_bits)
    forced = np.full((B, K), -1, dtype=np.int8)
    forced[:, :4] = bits[:, :4]
    forced[:, 4] = 1 - bits[:, 4]
    ref = decode_scl_batch(
        llr, info_set, M, CRC, force_info_bits=jnp.asarray(forced), dtype=jnp.float32
    )
    out = decode_scl_pallas(
        llr, info_set, M, CRC, force_info_bits=jnp.asarray(forced),
        block_batch=B, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(out["best_path_bits"]), np.asarray(ref.best_path_bits)
    )
    np.testing.assert_array_equal(
        np.asarray(out["crc_pass"]), np.asarray(ref.crc_pass)
    )


def test_kernel_rejects_bad_shapes(info_set):
    with pytest.raises(ValueError):
        decode_scl_pallas(_llrs(), info_set, 3, CRC, interpret=True)
    with pytest.raises(ValueError):
        decode_scl_pallas(_llrs(), info_set, 2, CRC, block_batch=3, interpret=True)


@pytest.mark.parametrize("M", [1, 4])
def test_kernel_bf16_bit_planes_bit_identical(info_set, M):
    """bf16 partial-sum planes hold 0/1 values only — decisions, metrics and
    returned LLRs must be bit-identical to the f32 kernel (and hence to the
    XLA decoder)."""

    llr = _llrs(seed=13)
    f32 = decode_scl_pallas(llr, info_set, M, CRC, block_batch=B, interpret=True)
    bf16 = decode_scl_pallas(
        llr, info_set, M, CRC, block_batch=B, interpret=True,
        bit_dtype=jnp.bfloat16,
    )
    for key in ("best_path_bits", "best_path_info_llrs", "crc_pass"):
        np.testing.assert_array_equal(
            np.asarray(bf16[key]), np.asarray(f32[key]), err_msg=key
        )


def test_sc_equals_m1_kernel_without_crc(info_set):
    """The M=1 no-CRC kernel computes exactly sc_decode_batch, including
    ties (the exact metric picks bit = (llr < 0) at every info leaf, 0 at
    llr == 0) — the invariant behind the documented negative result in
    ops/sc.py (routing SC through the kernel is equivalent, not faster)."""

    from polar_code_tpu.ops.sc import sc_decode_batch

    rng = np.random.default_rng(11)
    B = 8
    llr = rng.normal(0, 3, size=(B, 128)).astype(np.float32)
    llr[0, int(np.asarray(info_set)[3])] = 0.0  # exercise the tie case
    xla = sc_decode_batch(jnp.asarray(llr), info_set)
    kern = decode_scl_pallas(
        jnp.asarray(llr), info_set, 1, None, block_batch=B, interpret=True
    )["best_path_bits"]
    np.testing.assert_array_equal(np.asarray(kern), np.asarray(xla))


@pytest.mark.parametrize("M", [2, 4, 8])
@pytest.mark.parametrize("full_unroll", [False, True])
def test_kernel_clone_modes_bit_identical(info_set, M, full_unroll):
    """Lazy σ-map clone (default) vs fork-time clone-by-gather: the two
    data-movement strategies must produce bit-identical decodes."""

    llr = _llrs(seed=60 + M, scale=2.0)
    lazy = decode_scl_pallas(
        llr, info_set, M, CRC, block_batch=B, interpret=True,
        full_unroll=full_unroll, lazy_clone=True,
    )
    fork = decode_scl_pallas(
        llr, info_set, M, CRC, block_batch=B, interpret=True,
        full_unroll=full_unroll, lazy_clone=False,
    )
    for k in ("best_path_bits", "crc_pass"):
        np.testing.assert_array_equal(np.asarray(lazy[k]), np.asarray(fork[k]))
    np.testing.assert_array_equal(
        np.asarray(lazy["best_path_info_llrs"]),
        np.asarray(fork["best_path_info_llrs"]),
    )


@pytest.mark.parametrize("M", [2, 8])
@pytest.mark.parametrize("full_unroll", [False, True])
def test_kernel_sigma_skip_modes_bit_identical(info_set, M, full_unroll):
    """σ-gather elision (schedule-proven identity reads + even-fork parent
    materialization; static fork-interval tables under full_unroll) must be
    bit-identical to the round-4 gather-everything behavior."""

    llr = _llrs(seed=77 + M, scale=2.0)
    fast = decode_scl_pallas(
        llr, info_set, M, CRC, block_batch=B, interpret=True,
        full_unroll=full_unroll, sigma_skip=True,
    )
    slow = decode_scl_pallas(
        llr, info_set, M, CRC, block_batch=B, interpret=True,
        full_unroll=full_unroll, sigma_skip=False,
    )
    for k in ("best_path_bits", "crc_pass", "best_path_info_llrs"):
        np.testing.assert_array_equal(
            np.asarray(fast[k]), np.asarray(slow[k]), err_msg=k
        )


def test_kernel_large_n_lazy_matches_xla():
    """One wide-code interpret check: N=512 exercises the 128-row-chunked
    g-updates (level-1 span 256) and the multi-chunk syndrome backtrack
    (K=256 → two staging chunks)."""

    n_size, k_size = 512, 256
    info = construct_info_set(n_size, k_size, method="gaussian_bitrev")
    rng = np.random.default_rng(11)
    llr = jnp.asarray(rng.normal(0, 2.5, size=(B, n_size)), jnp.float32)
    ref = decode_scl_batch(llr, info, 4, "0x1864CFB", dtype=jnp.float32)
    out = decode_scl_pallas(
        llr, info, 4, "0x1864CFB", block_batch=B, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(out["best_path_bits"]), np.asarray(ref.best_path_bits)
    )
    np.testing.assert_array_equal(
        np.asarray(out["crc_pass"]), np.asarray(ref.crc_pass)
    )
