"""Fused LDPC NMS kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_code_tpu.nr.ldpc import build_h_matrix, encode_ldpc, load_base_graph
from polar_code_tpu.nr.ldpc.decode_nms import decode_ldpc_nms_batch
from polar_code_tpu.nr.ldpc.nms_pallas import decode_ldpc_nms_pallas


@pytest.mark.parametrize("Z", [8, 32])
@pytest.mark.parametrize("self_exclude", [False, True])
def test_nms_kernel_matches_xla(Z, self_exclude):
    bg = load_base_graph(2)
    H = build_h_matrix(bg, Z)
    rng = np.random.default_rng(Z)
    B = 8
    payloads = rng.integers(0, 2, size=(B, 3 * Z)).astype(np.int8)
    cws = np.stack([encode_ldpc(p, H) for p in payloads])
    llr = jnp.asarray(
        (1.0 - 2.0 * cws) * 2.0 + rng.normal(0, 1.0, size=cws.shape), jnp.float32
    )
    ref = decode_ldpc_nms_batch(
        llr, H, max_iter=20, alpha=0.8, self_exclude=self_exclude,
        dtype=jnp.float32,
    )
    out = decode_ldpc_nms_pallas(
        llr, bg, Z, max_iter=20, alpha=0.8, self_exclude=self_exclude,
        block_batch=B, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out["hard"]), np.asarray(ref["hard"]))
    np.testing.assert_array_equal(
        np.asarray(out["iters_used"]), np.asarray(ref["iters_used"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["parity_ok"]), np.asarray(ref["parity_ok"])
    )


def test_nms_kernel_exact_on_qc_ira():
    from polar_code_tpu.nr.ldpc.qc_ira import make_qc_ira_bg

    Z = 13
    bg = make_qc_ira_bg(3, 6, Z)
    H = build_h_matrix(bg, Z)
    rng = np.random.default_rng(0)
    B = 8
    k = H.shape[1] - H.shape[0]
    payloads = rng.integers(0, 2, size=(B, k)).astype(np.int8)
    cws = np.stack([encode_ldpc(p, H) for p in payloads])
    llr = jnp.asarray(
        (1.0 - 2.0 * cws) * 2.0 + rng.normal(0, 1.0, size=cws.shape), jnp.float32
    )
    ref = decode_ldpc_nms_batch(
        llr, H, max_iter=20, alpha=0.8, self_exclude=True, dtype=jnp.float32
    )
    out = decode_ldpc_nms_pallas(
        llr, bg, Z, max_iter=20, alpha=0.8, self_exclude=True,
        block_batch=B, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out["hard"]), np.asarray(ref["hard"]))
    np.testing.assert_array_equal(
        np.asarray(out["iters_used"]), np.asarray(ref["iters_used"])
    )
