"""Legacy CRC-8/12/16 class (reference `crclib.py`) on the GF(2)-matrix core.

The reference builds byte-oriented lookup tables; mathematically its
`crcCalc(info)` is the long-division remainder of ``info`` (zero-padded at
the *front* to a byte boundary — leading zeros don't change a CRC) by the
full polynomial ``x^len + gen``.  Here the same remainder comes from the
precomputed generator matrix in `ops/crc.py` — one tiny GF(2) matvec.
"""

from __future__ import annotations

import numpy as np

from ..ops.crc import generator_matrix


class crc:
    def __init__(self, crc_len: int, crc_poly: int) -> None:
        self.len = crc_len
        self.gen = crc_poly
        # full polynomial including the x^len term, as a hex string for the
        # shared GF(2) machinery
        self.full_poly = hex((1 << crc_len) | crc_poly) if crc_len > 0 else None

    def crcCalc(self, info: np.ndarray):
        """Remainder bits (MSB first) of `info` mod the full polynomial."""

        if self.len == 0:
            return []
        info = np.asarray(info).astype(np.int8) & 1
        G = generator_matrix(self.full_poly, info.size)
        parity = (G.astype(np.int32) @ info.astype(np.int32)) % 2
        return [int(b) for b in parity]


__all__ = ["crc"]
