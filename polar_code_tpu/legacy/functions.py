"""Legacy helper functions (reference `polar_coding_functions.py` work-alike).

Scalar host utilities kept for API compatibility with legacy-style code;
the batched pipelines in `legacy.pac` use the precomputed GF(2) transform
instead of these per-bit loops.
"""

from __future__ import annotations

import math
from typing import List

import numpy as np

from .rate_profile import bitreversed  # re-export


def fails(list1, list2) -> int:
    """Number of differing bits."""

    return int(np.sum(np.absolute(np.asarray(list1) - np.asarray(list2))))


def lowerconv(upperdecision: int, upperllr: float, lowerllr: float) -> float:
    """g-update in the log domain."""

    return lowerllr + upperllr if upperdecision == 0 else lowerllr - upperllr


def upperconv(llr1: float, llr2: float) -> float:
    """Min-sum f-update."""

    return float(np.sign(llr1) * np.sign(llr2) * min(abs(llr1), abs(llr2)))


def logdomain_sum(x: float, y: float) -> float:
    if x < y:
        return y + float(np.log(1 + np.exp(x - y)))
    return x + float(np.log(1 + np.exp(y - x)))


def conv_1bit(in_bit: int, cur_state: List[int], gen: List[int]) -> int:
    """One convolution output bit for the current shift-register state."""

    g_bit = in_bit * gen[0]
    for i in range(1, len(gen)):
        if gen[i] == 1:
            g_bit ^= cur_state[i - 1]
    return g_bit


def getNextState(in_bit: int, cur_state: List[int], m: int) -> List[int]:
    return [in_bit] + cur_state[0 : m - 1]


def conv_encode(in_code, gen: List[int], mem: int) -> np.ndarray:
    """Convolutional precoding along the bit-reversed position order."""

    cur_state = [0] * mem
    in_code = np.asarray(in_code)
    out = np.zeros(in_code.size, dtype=int)
    n = int(math.log2(in_code.size))
    for j in range(in_code.size):
        i = bitreversed(j, n)
        out[i] = conv_1bit(int(in_code[i]), cur_state, gen)
        cur_state = getNextState(int(in_code[i]), cur_state, mem)
    return out


def bin2dec(binary) -> int:
    return sum(int(b) << i for i, b in enumerate(binary))


__all__ = [
    "fails",
    "bitreversed",
    "lowerconv",
    "upperconv",
    "logdomain_sum",
    "conv_1bit",
    "getNextState",
    "conv_encode",
    "bin2dec",
]
