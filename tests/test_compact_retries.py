"""Device-side retry compaction ≡ the masked retry scan, element-for-element.

Compaction gathers still-failing frames into fixed-capacity chunks per retry
step (`dlscl/flip.py::_decode_with_retries_compact`); since frames are
independent, every per-frame decode is identical to the masked path's, so
all outputs must match exactly — including `attempts_used`, the tried mask
and the failure-case "last attempt's bits" semantics.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_code_tpu.dlscl.flip import decode_with_retries_batch
from polar_code_tpu.polar.construct import construct_info_set

N, K = 128, 64
CRC = "0x1864CFB"


def _noisy_llrs(count, snr_db, seed):
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
    return 2.0 * (sym + rng.normal(0, np.sqrt(nv), size=sym.shape)) / nv


@pytest.mark.parametrize(
    "M,use_beta,snr_db,capacity",
    [
        (1, False, 3.0, 4),   # many failures → multiple chunks per step
        (2, True, 4.5, 8),    # few failures → some steps run zero chunks
        (4, False, 3.5, 16),  # capacity ≥ typical active count
    ],
)
def test_compact_equals_masked(M, use_beta, snr_db, capacity):
    B = 32
    info_set = construct_info_set(N, K)
    llr = jnp.asarray(_noisy_llrs(B, snr_db, seed=M * 100 + capacity), jnp.float32)
    rng = np.random.default_rng(7)
    beta = (
        jnp.asarray(np.abs(rng.normal(size=(K, K))), jnp.float32) if use_beta else None
    )

    kw = dict(crc=CRC, beta=beta, dtype=jnp.float32, backend="xla")
    masked = decode_with_retries_batch(llr, info_set, M, 4, **kw)
    compact = decode_with_retries_batch(
        llr, info_set, M, 4, compact_capacity=capacity, **kw
    )

    # make sure the scenario is non-trivial (some frames actually retried)
    assert int(np.sum(np.asarray(masked["attempts_used"]))) > 0

    for key in (
        "best_path_bits",
        "success",
        "attempts_used",
        "baseline_pass",
        "baseline_bits",
        "tried",
    ):
        np.testing.assert_array_equal(
            np.asarray(compact[key]), np.asarray(masked[key]), err_msg=key
        )
    np.testing.assert_allclose(
        np.asarray(compact["best_path_info_llrs"]),
        np.asarray(masked["best_path_info_llrs"]),
        rtol=0,
        atol=0,
    )


def test_dataset_oracle_compact_equals_masked():
    """Compacted oracle search labels exactly the frames the masked one does.

    `found`/`label` may differ on baseline-passing frames (the compacted
    path never searches them), but everything the dataset writer consumes —
    fail, labeled, label-at-labeled, abs_l0 — must match exactly.
    """

    import jax
    import jax.numpy as jnp

    from polar_code_tpu import config
    from polar_code_tpu.channel import noise_var_coded
    from polar_code_tpu.train.make_dataset import _make_oracle_chunk
    from polar_code_tpu.utils.seeding import make_key

    cfg = config.get_config()
    info_set = construct_info_set(cfg.N, cfg.K)
    B = 32
    nv = noise_var_coded(3.5, cfg.K, cfg.N)
    key = make_key(11)

    masked = jax.device_get(_make_oracle_chunk(cfg, info_set, 1, B, 8)(key, nv))
    compact = jax.device_get(
        _make_oracle_chunk(cfg, info_set, 1, B, 8, compact=8)(key, nv)
    )

    n = int(masked["n_labeled"])
    assert n > 0  # non-trivial scenario
    np.testing.assert_array_equal(compact["fail"], masked["fail"])
    assert int(compact["n_labeled"]) == n
    # compacted outputs: labeled frames first, in frame order
    np.testing.assert_array_equal(compact["lab_idx"][:n], masked["lab_idx"][:n])
    np.testing.assert_array_equal(compact["label"][:n], masked["label"][:n])
    np.testing.assert_array_equal(compact["abs_l0"][:n], masked["abs_l0"][:n])


def test_compact_rejects_sharded():
    info_set = construct_info_set(N, K)
    llr = jnp.zeros((8, N), jnp.float32)
    with pytest.raises(ValueError, match="pallas_sharded"):
        decode_with_retries_batch(
            llr, info_set, 1, 2, crc=CRC, backend="pallas_sharded",
            compact_capacity=4,
        )


@pytest.mark.slow
@pytest.mark.parametrize("N2,K2,M2,cap", [(256, 128, 2, 8), (512, 256, 2, 4)])
def test_compact_equals_masked_largeN(N2, K2, M2, cap):
    """Retry compaction at the shipped large-N DL-SCL shapes (VERDICT r3
    #6): the fixed-capacity chunk gathers must stay a pure permutation of
    the masked path's per-frame decodes at N=256/512 too."""

    import polar_code_tpu.ops.crc as crc_ops
    from polar_code_tpu.ops.polar_transform import encode_batch

    B = 16
    rng = np.random.default_rng(N2 + M2)
    rate = K2 / N2
    # 1.25 dB: below the large-N waterfall knee (~2 dB with the corrected
    # gaussian_bitrev sets), so a 16-frame batch reliably has CRC failures
    nv = 1.0 / (2.0 * rate * 10 ** (1.25 / 10.0))
    payloads = rng.integers(0, 2, size=(B, K2 - 24)).astype(np.int8)
    msgs = np.stack([crc_ops.attach_crc(p, CRC) for p in payloads])
    info2 = construct_info_set(N2, K2, method="gaussian_bitrev")
    codes = np.asarray(encode_batch(jnp.asarray(msgs), info2, N2))
    sym = 1.0 - 2.0 * codes
    llr = jnp.asarray(
        2.0 * (sym + rng.normal(0, np.sqrt(nv), size=sym.shape)) / nv, jnp.float32
    )
    masked = decode_with_retries_batch(
        llr, info2, M2, retries=3, crc=CRC, beta=None, compact_capacity=0
    )
    compact = decode_with_retries_batch(
        llr, info2, M2, retries=3, crc=CRC, beta=None, compact_capacity=cap
    )
    assert np.asarray(masked["attempts_used"]).max() > 0, "fixture too easy"
    for k in masked:
        np.testing.assert_array_equal(
            np.asarray(masked[k]), np.asarray(compact[k]), err_msg=k
        )
