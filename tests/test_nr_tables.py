"""TS 38.212 §5.3.2 lifting machinery: tables, selection rules, file loader.

The shift-coefficient *values* of real BG1/BG2 are external data (loaded via
`load_base_graph_file`); everything around them — lifting-size sets, iLS
lookup, mod-Z reduction, BG/Z selection — is spec logic tested here, and a
synthetic per-iLS table is pushed end-to-end through the encoder and both
NMS decoder paths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from polar_code_tpu.nr.ldpc.builder import build_h_matrix
from polar_code_tpu.nr.ldpc.decode_nms import decode_ldpc_nms_batch
from polar_code_tpu.nr.ldpc.encode import encode_ldpc
from polar_code_tpu.nr.ldpc.nms_pallas import decode_ldpc_nms_pallas
from polar_code_tpu.nr.ldpc.nr_tables import (
    LIFTING_SETS,
    all_lifting_sizes,
    base_graph_from_table,
    choose_base_graph,
    choose_Kb,
    choose_lifting_size,
    ils_index,
    lift_shifts,
    load_base_graph_file,
    parse_shift_table,
)


def test_lifting_size_table_invariants():
    # Table 5.3.2-1: Z = a·2^j, a per set, 51 distinct sizes, Zmax=384
    a_by_set = {0: 2, 1: 3, 2: 5, 3: 7, 4: 9, 5: 11, 6: 13, 7: 15}
    for ils, zs in LIFTING_SETS.items():
        a = a_by_set[ils]
        for j, z in enumerate(zs):
            assert z == a * 2**j
    sizes = all_lifting_sizes()
    assert len(sizes) == 51 == len(set(sizes))
    assert sizes[0] == 2 and sizes[-1] == 384
    for ils, zs in LIFTING_SETS.items():
        for z in zs:
            assert ils_index(z) == ils
    with pytest.raises(ValueError):
        ils_index(17)


def test_lift_shifts_mod_and_no_edge():
    V = np.array([[-1, 5, 384], [7, -1, 0]])
    P = lift_shifts(V, 8)
    assert P.tolist() == [[-1, 5, 0], [7, -1, 0]]
    assert P.dtype == np.int32


def test_base_graph_selection_rules():
    # §7.2.2 boundaries
    assert choose_base_graph(292, 0.9) == 2       # K ≤ 292
    assert choose_base_graph(293, 0.9) == 1
    assert choose_base_graph(3824, 0.67) == 2     # K ≤ 3824 and R ≤ 2/3
    assert choose_base_graph(3825, 0.67) == 1
    assert choose_base_graph(8448, 0.25) == 2     # R ≤ 1/4
    assert choose_base_graph(8448, 0.26) == 1


def test_lifting_size_selection():
    assert choose_Kb(1, 100) == 22
    assert choose_Kb(2, 100) == 6
    assert choose_Kb(2, 193) == 8
    assert choose_Kb(2, 561) == 9
    assert choose_Kb(2, 641) == 10
    # smallest tabulated Z with Kb·Z ≥ K
    assert choose_lifting_size(1, 8448) == (22, 384)   # max BG1 payload
    assert choose_lifting_size(2, 3840) == (10, 384)   # max BG2 payload
    assert choose_lifting_size(2, 100) == (6, 18)      # 6·16=96 < 100 ≤ 6·18
    assert choose_lifting_size(1, 22 * 208 + 1)[1] == 224
    with pytest.raises(ValueError):
        choose_lifting_size(2, 3841)


def test_parse_shift_table_formats(tmp_path):
    txt = """
# row col V0..V7 (per-iLS) — synthetic
0 0 10 11 12 13 14 15 16 17
0,1,20,21,22,23,24,25,26,27
1 1 5 5 5 5 5 5 5 5
1 2 0 0 0 0 0 0 0 0
"""
    V = parse_shift_table(txt)
    assert V.shape == (2, 3, 8)
    assert V[0, 0, 0] == 10 and V[0, 0, 7] == 17
    assert V[1, 0, 0] == -1  # absent edge
    # 3-column form broadcasts across sets
    V3 = parse_shift_table("0 0 7\n0 1 3\n")
    assert V3.shape == (1, 2, 8)
    assert (V3[0, 0] == 7).all()
    with pytest.raises(ValueError, match="duplicate"):
        parse_shift_table("0 0 1\n0 0 2\n")
    with pytest.raises(ValueError, match="fields"):
        parse_shift_table("0 0 1 2\n")
    with pytest.raises(ValueError, match="empty"):
        parse_shift_table("# nothing\n")


def _demo_like_per_ils_table(mb, nb, rng):
    """Synthetic per-iLS table with a dual-diagonal parity part (invertible)."""

    kb = nb - mb
    lines = []
    for r in range(mb):
        for c in rng.choice(kb, size=2, replace=False):
            vs = rng.integers(0, 384, size=8)
            lines.append(f"{r} {c} " + " ".join(map(str, vs)))
        lines.append(f"{r} {kb + r} 0 0 0 0 0 0 0 0")
        if r > 0:
            vs = rng.integers(0, 384, size=8)
            lines.append(f"{r} {kb + r - 1} " + " ".join(map(str, vs)))
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("Z", [8, 12])  # different iLS sets (a=2, a=3)
def test_file_table_end_to_end(tmp_path, Z):
    rng = np.random.default_rng(42)
    mb, nb = 3, 7
    path = tmp_path / "bg_synth.csv"
    path.write_text(_demo_like_per_ils_table(mb, nb, rng))

    bg = load_base_graph_file(path, Z)
    assert bg.m == mb and bg.n == nb
    # the loaded graph is the iLS(Z) column reduced mod Z
    V = parse_shift_table(path.read_text())
    expect = lift_shifts(V[:, :, ils_index(Z)], Z)
    np.testing.assert_array_equal(bg.shifts, expect)
    assert (bg.shifts < Z).all()

    # drop it through the whole stack: encode → parity → XLA NMS ≡ kernel NMS
    H = build_h_matrix(bg, Z)
    k = (nb - mb) * Z
    B = 8
    payloads = rng.integers(0, 2, size=(B, k)).astype(np.int8)
    cws = np.stack([encode_ldpc(p, H) for p in payloads])
    assert not ((cws @ H.T) % 2).any()
    llr = jnp.asarray((1.0 - 2.0 * cws) * 2.0 + rng.normal(0, 1, cws.shape), jnp.float32)
    ref = decode_ldpc_nms_batch(llr, H, max_iter=10, alpha=0.8, dtype=jnp.float32)
    out = decode_ldpc_nms_pallas(llr, bg, Z, max_iter=10, alpha=0.8, block_batch=B, interpret=True)
    np.testing.assert_array_equal(np.asarray(out["hard"]), np.asarray(ref["hard"]))


def test_bg_dims_guard():
    V = parse_shift_table("0 0 1\n")
    with pytest.raises(ValueError, match="BG1 is 46x68"):
        base_graph_from_table(V, 8, bg=1)


def test_example_bg2_shape_csv():
    """The committed drop-in example (docs/bg_dropin/) is a full BG2-layout
    table: loads with the bg=2 dimension guard, encodes invertibly at two
    lifting sizes, and decodes near-noiselessly."""

    path = "docs/bg_dropin/example_bg2_shape.csv"
    for Z in (4, 16):
        bg = load_base_graph_file(path, Z, bg=2)
        assert (bg.m, bg.n) == (42, 52)
        # spec structure: identity extension, one shift-0 entry per row r>=4
        for r in range(4, 42):
            assert bg.shifts[r, 10 + r] == 0
            assert (bg.shifts[r, 10 + r + 1 :] == -1).all()
        H = build_h_matrix(bg, Z)
        k = 10 * Z
        rng = np.random.default_rng(Z)
        payloads = rng.integers(0, 2, size=(4, k)).astype(np.int8)
        cws = np.stack([encode_ldpc(p, H) for p in payloads])
        assert not ((cws @ H.T) % 2).any()
        llr = jnp.asarray((1.0 - 2.0 * cws) * 8.0, jnp.float32)
        out = decode_ldpc_nms_batch(llr, H, max_iter=5, alpha=0.8, dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(out["hard"]), cws)
        assert bool(np.asarray(out["parity_ok"]).all())
