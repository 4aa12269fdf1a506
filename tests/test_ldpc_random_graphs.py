"""LDPC stack generality: random lifted base graphs (not just the demo table).

Demonstrates that the encoder (precomputed GF(2) parity solve), the layered
XLA NMS decoder and the fused roll-based kernel all accept arbitrary
circulant base graphs — real 3GPP BG1/BG2 shift tables would slot in the
same way.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_code_tpu.nr.ldpc.basegraphs import BaseGraph
from polar_code_tpu.nr.ldpc.builder import build_h_matrix
from polar_code_tpu.nr.ldpc.decode_nms import decode_ldpc_nms_batch
from polar_code_tpu.nr.ldpc.encode import encode_ldpc
from polar_code_tpu.nr.ldpc.nms_pallas import decode_ldpc_nms_pallas


def _random_bg(mb: int, nb: int, Z: int, rng) -> BaseGraph:
    """Random payload blocks + lower-triangular parity part (invertible)."""

    shifts = np.full((mb, nb), -1, dtype=np.int32)
    kb = nb - mb
    for r in range(mb):
        # 2-3 payload connections per row
        for c in rng.choice(kb, size=rng.integers(2, min(4, kb + 1)), replace=False):
            shifts[r, c] = int(rng.integers(0, Z))
        # dual-diagonal-ish parity: identity diagonal + sub-diagonal
        shifts[r, kb + r] = 0
        if r > 0:
            shifts[r, kb + r - 1] = int(rng.integers(0, Z))
    return BaseGraph(name="random", m=mb, n=nb, shifts=shifts)


@pytest.mark.parametrize("mb,nb,Z,seed", [(3, 7, 8, 0), (4, 9, 16, 1), (5, 10, 4, 2)])
def test_random_graph_encode_decode(mb, nb, Z, seed):
    rng = np.random.default_rng(seed)
    bg = _random_bg(mb, nb, Z, rng)
    H = build_h_matrix(bg, Z)
    k = (nb - mb) * Z
    B = 8

    payloads = rng.integers(0, 2, size=(B, k)).astype(np.int8)
    cws = np.stack([encode_ldpc(p, H) for p in payloads])
    assert not ((cws @ H.T) % 2).any(), "encoder parity violated"

    llr = jnp.asarray(
        (1.0 - 2.0 * cws) * 2.0 + rng.normal(0, 1.0, size=cws.shape), jnp.float32
    )
    ref = decode_ldpc_nms_batch(llr, H, max_iter=15, alpha=0.8, dtype=jnp.float32)
    out = decode_ldpc_nms_pallas(
        llr, bg, Z, max_iter=15, alpha=0.8, block_batch=B, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out["hard"]), np.asarray(ref["hard"]))
    np.testing.assert_array_equal(
        np.asarray(out["iters_used"]), np.asarray(ref["iters_used"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["parity_ok"]), np.asarray(ref["parity_ok"])
    )
    # near-noiseless input must converge immediately
    clean = jnp.asarray((1.0 - 2.0 * cws) * 20.0, jnp.float32)
    res = decode_ldpc_nms_batch(clean, H, max_iter=15, alpha=0.8, dtype=jnp.float32)
    assert np.asarray(res["parity_ok"]).all()
    assert (np.asarray(res["iters_used"]) == 1).all()
