"""Legacy `PolarCode` class — reference-compatible API over the batched PAC core.

Work-alike of `polar_code.py` (reference): construction via a `rateprofile`
(mask build + optional row-swap modification), PAC/polar encoding, and the
CRC-aided PAC list decoder.  Scalar methods wrap batches of one; heavy
workloads should call `legacy.pac` batched functions directly.
"""

from __future__ import annotations

import math


import jax.numpy as jnp
import numpy as np

from ..ops.polar_transform import polar_transform
from . import exceptions as pcexc
from .pac import pac_encode_batch, pac_list_decode_batch
from .rate_profile import bitreversed, rateprofile


class PolarCode:
    def __init__(self, N: int, K: int, construct: str, L: int, rprofile: rateprofile):
        if K > N:
            raise pcexc.PCLengthError
        if math.log2(N) != int(math.log2(N)):
            raise pcexc.PCLengthDivTwoError
        self.codeword_length = N
        self.log2_N = int(math.log2(N))
        self.nonfrozen_bits = K
        self.n = self.log2_N
        self.bitrev_indices = [bitreversed(j, self.n) for j in range(N)]
        self.rprofile = rprofile
        self.polarcode_mask = self.rprofile.build_mask(construct)
        self.polarcode_mask = self.rprofile.modify_profile()
        self.rate_profile = self.polarcode_mask[self.bitrev_indices]
        self.frozen_bits = (self.polarcode_mask + 1) % 2
        self.list_size = L
        self.list_size_max = L
        self.iterations = 10**6
        self.m = 0
        self.gen = [1]
        self.cur_state: list = []
        self.modu = "BPSK"

    # --------------------------- encoding ---------------------------

    def mul_matrix(self, profiled: np.ndarray) -> np.ndarray:
        """Polar transform (natural order); same butterfly as the core."""

        out = polar_transform(jnp.asarray(np.asarray(profiled).astype(np.int8))[None])
        return np.asarray(out[0], dtype=int)

    def profiling(self, info: np.ndarray) -> np.ndarray:
        profiled = np.zeros(self.codeword_length, dtype=int)
        profiled[self.polarcode_mask == 1] = info
        return profiled

    def encode(self, info: np.ndarray, issystematic: bool) -> np.ndarray:
        polarcoded = self.mul_matrix(self.profiling(info))
        if issystematic:
            polarcoded *= self.polarcode_mask
            polarcoded = self.mul_matrix(polarcoded)
        return polarcoded

    def pac_encode(
        self, info: np.ndarray, conv_gen, mem: int, issystematic: bool = False
    ) -> np.ndarray:
        out = pac_encode_batch(
            jnp.asarray(np.asarray(info).astype(np.int8))[None],
            self.polarcode_mask,
            conv_gen,
            self.codeword_length,
            systematic=issystematic,
        )
        return np.asarray(out[0], dtype=int)

    # --------------------------- decoding ---------------------------

    def extract(self, decoded_message: np.ndarray) -> np.ndarray:
        return np.asarray(decoded_message)[self.polarcode_mask == 1].astype(int)

    def pac_list_crc_decoder(
        self,
        soft_mess: np.ndarray,
        issystematic: bool,
        isCRCinc: bool,
        crc1,
        L: int,
    ) -> np.ndarray:
        res = pac_list_decode_batch(
            jnp.asarray(np.asarray(soft_mess, dtype=np.float64))[None],
            self.polarcode_mask,
            self.gen,
            L,
            crc_len=crc1.len if isCRCinc else 0,
            crc_poly=crc1.gen if isCRCinc else 0,
            dtype=jnp.float64,
        )
        if issystematic:
            v_full = np.asarray(res["v_full"][0], dtype=np.int8)  # [L, N]
            cands = [
                self.extract(self.mul_matrix(v_full[l])) for l in range(v_full.shape[0])
            ]
            valid = np.asarray(res["valid"][0])
            if isCRCinc:
                for cand in [c for c, v in zip(cands, valid) if v]:
                    if sum(crc1.crcCalc(np.asarray(cand))) == 0:
                        return np.asarray(cand, dtype=int)
            return np.asarray(cands[0], dtype=int)
        return np.asarray(res["extracted"][0], dtype=int)


__all__ = ["PolarCode"]
