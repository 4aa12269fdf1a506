"""Programmatic QC-IRA base graphs: a *real* LDPC comparison code.

The reference's LDPC arm runs only its 3×6 demo base graph
(`dl_scl_polar/nr/ldpc/basegraphs.py:21-28`) and the true 3GPP BG1/BG2
shift tables are offline-unobtainable spec data (adjudicated in
`nr_tables.py`).  This module closes the gap with a base-graph *family
generated from first principles*, so the `nr_ldpc` sweep arm can produce a
meaningful waterfall instead of the demo graph's FER≈1 flat line:

* **Payload part**: array-code circulants (Fan, ISTC 2000) — block (i, j)
  carries shift ``i·(j+1) mod Z``.  For prime Z any 4-cycle would need
  ``(i1−i2)·(j1−j2) ≡ 0 (mod Z)`` with both factors nonzero and < Z, which
  is impossible, so the payload subgraph has girth ≥ 6 by construction.
* **Parity part**: a block-bidiagonal accumulator (identity diagonal +
  identity subdiagonal), the IRA structure of Jin–Khandekar–McEliece
  (ISTC 2000).  Unit block-lower-triangular ⇒ always invertible over
  GF(2), so `encode.parity_solver_matrix` works for every (m, n, Z); the
  ``i·(j+1)`` offset (not ``i·j``) keeps the would-be all-identity payload
  column out, which would close 4-cycles through the accumulator pairs.

The result is a regular-payload (degree-m columns, IRA degree-2 parity)
quasi-cyclic code — the same structural family as the WiMAX / DVB-S2
standards' codes — with genuine coding gain (see
`results/ber_nr_ldpc_ira4x8.csv`), while staying a drop-in `BaseGraph` for
the existing builder/encoder/NMS stack (both XLA and Pallas decoders).
"""

from __future__ import annotations

import numpy as np

from .basegraphs import BaseGraph


def _is_prime(z: int) -> bool:
    if z < 2:
        return False
    for p in range(2, int(z**0.5) + 1):
        if z % p == 0:
            return False
    return True


def make_qc_ira_bg(m: int, n: int, Z: int) -> BaseGraph:
    """Base graph with ``n − m`` array-code payload columns and an m-column
    IRA accumulator; lift with `build_h_matrix(bg, Z)` → H of shape
    (mZ, nZ), rate (n−m)/n.

    Z must be prime, > m AND > n − m (the 4-cycle-freedom argument needs
    both factors i₁−i₂ and (j₁+1)−(j₂+1) nonzero mod Z, i.e. every block
    index below Z; payload shifts ``i·(j+1) mod Z`` repeat — duplicate /
    all-identity columns and 4-cycles — once j+1 reaches Z); m ≥ 2, n > m.
    """

    if m < 2 or n <= m:
        raise ValueError("need m >= 2 block-rows and n > m block-columns")
    if not _is_prime(Z) or Z <= m or Z <= n - m:
        raise ValueError(
            f"Z={Z} must be a prime > m={m} and > n-m={n - m} "
            "(girth-6 guarantee)"
        )
    shifts = np.full((m, n), -1, dtype=np.int32)
    for i in range(m):
        for j in range(n - m):
            shifts[i, j] = (i * (j + 1)) % Z
    for i in range(m):
        shifts[i, n - m + i] = 0
        if i:
            shifts[i, n - m + i - 1] = 0
    return BaseGraph(name=f"QC-IRA{m}x{n}", m=m, n=n, shifts=shifts)


def parse_ira_spec(spec: str) -> tuple[int, int]:
    """Parse ``"ira<m>x<n>"`` (e.g. ``ira4x8``) → (m, n)."""

    body = spec[3:] if spec.startswith("ira") else spec
    try:
        m_s, n_s = body.lower().split("x")
        return int(m_s), int(n_s)
    except ValueError as e:
        raise ValueError(
            f"bad IRA base-graph spec {spec!r}; expected 'ira<m>x<n>', e.g. 'ira4x8'"
        ) from e


__all__ = ["make_qc_ira_bg", "parse_ira_spec"]
