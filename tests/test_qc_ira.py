"""QC-IRA base graphs + exact (self-excluding) layered NMS.

The reference's LDPC arm only ships a 3×6 demo graph and a shared-min NMS
simplification (`dl_scl_polar/nr/ldpc/decode_nms.py`) whose published
curves sit at FER≈1 — these are the beyond-parity pieces that make the
`nr_ldpc` comparison arm produce a real waterfall.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polar_code_tpu.nr.ldpc.builder import build_h_matrix
from polar_code_tpu.nr.ldpc.decode_nms import (
    decode_ldpc_nms,
    decode_ldpc_nms_batch,
)
from polar_code_tpu.nr.ldpc.encode import encode_ldpc_batch
from polar_code_tpu.nr.ldpc.qc_ira import make_qc_ira_bg, parse_ira_spec


def _nms_oracle(llr, H, max_iter, alpha, self_exclude):
    """Straight-line sequential layered NMS, both variants."""

    llr = llr.astype(np.float64).copy()
    m, n = H.shape
    msg = np.zeros((m, n))
    for it in range(max_iter):
        for r in range(m):
            cols = np.where(H[r])[0]
            ext = llr[cols] - msg[r, cols]
            if self_exclude:
                for j, c in enumerate(cols):
                    others = np.delete(ext, j)
                    msg[r, c] = (
                        alpha * np.prod(np.sign(others)) * np.min(np.abs(others))
                    )
                llr[cols] = ext + msg[r, cols]
            else:
                upd = alpha * np.prod(np.sign(ext)) * np.min(np.abs(ext))
                llr[cols] = ext + upd
                msg[r, cols] = upd
        if np.all(((llr < 0).astype(int) @ H.T) % 2 == 0):
            break
    return (llr < 0).astype(np.int8)


@pytest.mark.parametrize("self_exclude", [False, True])
def test_nms_matches_sequential_oracle(self_exclude):
    rng = np.random.default_rng(7)
    H = (rng.random((9, 18)) < 0.3).astype(np.int8)
    H[np.arange(9), np.arange(9) + 9] = 1
    for t in range(12):
        llr = rng.normal(0.0, 2.0, 18)
        got = decode_ldpc_nms(
            llr, H, max_iter=8, alpha=0.8, self_exclude=self_exclude
        )
        want = _nms_oracle(llr, H, 8, 0.8, self_exclude)
        np.testing.assert_array_equal(got["hard"], want)


def test_ira_graph_structure():
    bg = make_qc_ira_bg(4, 8, 31)
    H = build_h_matrix(bg, 31)
    assert H.shape == (124, 248)
    # girth >= 6: no two columns share more than one check row
    G = H.astype(np.int32).T @ H.astype(np.int32)
    np.fill_diagonal(G, 0)
    assert G.max() <= 1
    # payload columns regular degree m; accumulator degree 2 (last col 1)
    deg = H.sum(axis=0)
    assert np.all(deg[:124] == 4)
    assert np.all(deg[124:-31] == 2)


def test_ira_spec_parsing_and_validation():
    assert parse_ira_spec("ira4x8") == (4, 8)
    assert parse_ira_spec("3x12") == (3, 12)
    with pytest.raises(ValueError):
        parse_ira_spec("irafoo")
    with pytest.raises(ValueError):
        make_qc_ira_bg(4, 8, 32)  # not prime
    with pytest.raises(ValueError):
        make_qc_ira_bg(4, 4, 31)  # no payload columns


def test_ira_code_corrects_with_exact_nms():
    bg = make_qc_ira_bg(4, 8, 31)
    H = build_h_matrix(bg, 31)
    k = H.shape[1] - H.shape[0]
    B = 512
    kp, kn = jax.random.split(jax.random.key(3))
    payload = jax.random.bernoulli(kp, 0.5, (B, k)).astype(jnp.int8)
    cw = encode_ldpc_batch(payload, H)
    x = 1.0 - 2.0 * cw.astype(jnp.float32)
    esn0 = 10 ** (3.0 / 10.0) * k / H.shape[1]  # Eb/N0 = 3 dB, rate 1/2
    nv = 1.0 / (2.0 * esn0)
    y = x + jnp.sqrt(nv) * jax.random.normal(kn, x.shape)
    res_exact = decode_ldpc_nms_batch(
        2.0 * y / nv, H, max_iter=20, alpha=0.8, self_exclude=True
    )
    fer_exact = float(
        jnp.mean(jnp.any(res_exact["hard"][:, :k] != payload, axis=1))
    )
    res_shared = decode_ldpc_nms_batch(2.0 * y / nv, H, max_iter=20, alpha=0.8)
    fer_shared = float(
        jnp.mean(jnp.any(res_shared["hard"][:, :k] != payload, axis=1))
    )
    # exact NMS has a real waterfall here (~4e-2); shared-min is stuck ≈ 1
    assert fer_exact < 0.15
    assert fer_shared > 0.9
