"""Base graph definitions for the NR-esque LDPC comparison codec.

Reference semantics: `dl_scl_polar/nr/ldpc/basegraphs.py` — both bg=1 and
bg=2 resolve to the same minimal 3×6 demo base graph (3 payload columns +
identity parity), *not* the full 3GPP BG1/BG2 tables.  The demo shift table
is reproduced exactly so the comparison sweeps are statistically identical;
the `load_base_graph(bg)` API is kept so real tables can slot in.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np


@dataclass
class BaseGraph:
    name: str
    m: int  # rows in base graph
    n: int  # columns in base graph
    shifts: np.ndarray  # (m, n), −1 meaning zero block


def _create_demo_bg(name: str) -> BaseGraph:
    shifts = np.array(
        [
            [0, 1, 2, 0, -1, -1],
            [1, 0, 3, -1, 0, -1],
            [2, 3, 0, -1, -1, 0],
        ],
        dtype=np.int32,
    )
    return BaseGraph(name=name, m=3, n=6, shifts=shifts)


_BG_CACHE: Dict[int, BaseGraph] = {
    1: _create_demo_bg("BG_demo1"),
    2: _create_demo_bg("BG_demo2"),
}


def load_base_graph(bg: int) -> BaseGraph:
    if bg not in _BG_CACHE:
        raise ValueError(f"Unknown base graph: {bg}")
    return _BG_CACHE[bg]


__all__ = ["BaseGraph", "load_base_graph"]
