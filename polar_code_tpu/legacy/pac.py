"""PAC (polarization-adjusted convolutional) codes — batched TPU pipelines.

Work-alike of the reference's legacy decoder (`polar_code.py`): rate-profile
masked convolutional precoding in bit-reversed order, polar transform, and a
list decoder that

* visits leaves in bit-reversed u-order (tree order j, u index bitrev(j)),
* uses the hard-decision path metric ``PM += |LLR|`` when the *convolved*
  edge bit disagrees with the channel hard decision (`polar_code.py:239`),
* forks at info positions into a [good-branch × L, bad-branch × L]
  candidate layout pruned by a stable sort (`polar_code.py:280-306`),
* selects the final path by CRC over the extracted bits, else best metric
  (`polar_code.py:398-418`).

TPU-native re-design notes:

* The convolutional precoder is linear over GF(2); its transform matrix is
  precomputed host-side once per (gen, N), so batched encoding is
  scatter → matmul mod 2 → vectorized polar butterfly.
* The reference's adjacent-pair ("Tal-Vardy heap") butterfly equals the
  natural halves-butterfly applied to the bit-reversal-permuted channel
  LLRs, so the decoder reuses the compact per-level state machinery of
  `ops/scl.py` on permuted inputs — contiguous slices, no strided access.
* The per-path convolutional shift register is an [L, mem, B] int8 tensor;
  list cloning gathers it together with the tree state.
* The reference's lazy clone/swap/duplicate bookkeeping is replaced by
  plain clone-by-gather; path metrics and stable candidate order are
  preserved exactly (ties at |LLR| = 0 excepted — measure zero).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple


import jax.numpy as jnp
import numpy as np

from ..ops.crc import check_matrix
from ..ops.polar_transform import polar_transform
from .rate_profile import bitreversed


@functools.lru_cache(maxsize=None)
def _bitrev_perm(N: int) -> np.ndarray:
    n = int(math.log2(N))
    return np.array([bitreversed(j, n) for j in range(N)], dtype=np.int64)


@functools.lru_cache(maxsize=None)
def conv_transform_matrix(gen: Tuple[int, ...], N: int) -> np.ndarray:
    """T [N, N] with u = T·v mod 2 — the bit-reversed-order convolution.

    Column k is `conv_encode(e_k)` (reference
    `polar_coding_functions.py:134-150`): the shift register advances along
    bit-reversed positions; output lands at the same positions.
    """

    gen = list(gen)
    mem = len(gen) - 1
    n = int(math.log2(N))
    T = np.zeros((N, N), dtype=np.int8)
    order = [bitreversed(j, n) for j in range(N)]
    for k in range(N):
        state = [0] * mem
        v = np.zeros(N, dtype=np.int8)
        v[k] = 1
        for i in order:
            out = v[i] * gen[0]
            for t in range(1, len(gen)):
                if gen[t] == 1:
                    out ^= state[t - 1]
            T[i, k] = out
            state = [int(v[i])] + state[: mem - 1]
    T.setflags(write=False)
    return T


def pac_encode_batch(
    info: jnp.ndarray, mask: np.ndarray, gen, N: int, systematic: bool = False
) -> jnp.ndarray:
    """info [B, Kp] → PAC codeword [B, N] (mask in natural u-index order)."""

    mask = np.asarray(mask)
    positions = np.where(mask == 1)[0]
    B = info.shape[0]
    v = jnp.zeros((B, N), jnp.int8).at[:, positions].set(info.astype(jnp.int8))
    T = jnp.asarray(conv_transform_matrix(tuple(int(g) for g in gen), N), jnp.float32)
    u = jnp.mod(v.astype(jnp.float32) @ T.T, 2.0).astype(jnp.int8)
    x = polar_transform(u)
    if systematic:
        x = polar_transform(x * jnp.asarray(mask, jnp.int8))
    return x


def _level_offsets(N: int):
    off = {}
    o = 0
    n = int(math.log2(N))
    for level in range(1, n + 1):
        off[level] = o
        o += N >> level
    return off, o


def pac_list_decode_batch(
    llr: jnp.ndarray,
    mask: np.ndarray,
    gen,
    L: int,
    *,
    crc_len: int = 0,
    crc_poly: int = 0,
    dtype=jnp.float32,
) -> dict:
    """Batched PAC list decode.  llr: [B, N] channel LLRs.

    Returns {"extracted" int8 [B, Kp] (CRC-selected / best metric),
             "candidates" int8 [B, L, Kp], "metrics" f32 [B, L],
             "crc_pass" bool [B]}.
    """

    gen = [int(g) for g in gen]
    if gen[0] != 1:
        raise ValueError("convolution generator must start with 1")
    mem = len(gen) - 1
    mask = np.asarray(mask)
    B, N = int(llr.shape[0]), int(llr.shape[1])
    n = int(math.log2(N))
    perm = _bitrev_perm(N)
    # mask in tree-phase order: phase j decides u[bitrev(j)]
    mask_rev = mask[perm]
    Kp = int(mask.sum())
    off, state_len = _level_offsets(N)

    # adjacent-pair butterfly == halves butterfly on bit-rev-permuted LLRs
    chan = llr[:, perm].T.astype(dtype)  # [N, B]

    llr_st = jnp.zeros((L, state_len, B), dtype)
    bit_st = jnp.zeros((L, state_len, B), jnp.int8)
    pm = jnp.full((L, B), jnp.inf, dtype).at[0].set(0.0)
    conv_state = jnp.zeros((L, max(mem, 1), B), jnp.int8)
    v_dec = jnp.zeros((L, N, B), jnp.int8)  # message bits by u-index
    gen_taps = np.asarray(gen[1:], dtype=np.int8)

    def conv_edge_base(conv_state):
        # parity of (state · gen[1:]) — the edge bit contributed by memory
        if mem == 0:
            return jnp.zeros((L, B), jnp.int8)
        taps = jnp.asarray(gen_taps)[None, :, None]
        return jnp.mod(jnp.sum(conv_state * taps, axis=1), 2).astype(jnp.int8)

    def shift_state(conv_state, v_bits):
        # state ← [v, state[:-1]]
        if mem == 0:
            return conv_state
        return jnp.concatenate([v_bits[:, None, :], conv_state[:, : mem - 1, :]], axis=1)

    def run_updates(llr_st, bit_st, phase: int):
        if phase == 0:
            levels = [(l, "f") for l in range(1, n + 1)]
        else:
            k = (phase & -phase).bit_length() - 1
            levels = [(n - k, "g")] + [(l, "f") for l in range(n - k + 1, n + 1)]
        for level, op in levels:
            half = N >> level
            if level == 1:
                a, b = chan[:half], chan[half:]
            else:
                po = off[level - 1]
                parent = llr_st[:, po : po + (N >> (level - 1)), :]
                a, b = parent[:, :half, :], parent[:, half:, :]
            o = off[level]
            if op == "f":
                child = jnp.sign(a) * jnp.sign(b) * jnp.minimum(jnp.abs(a), jnp.abs(b))
            else:
                c = bit_st[:, o : o + half, :]
                child = b + (1.0 - 2.0 * c.astype(dtype)) * a
            if child.ndim == 2:
                child = jnp.broadcast_to(child, (L, half, B))
            llr_st = llr_st.at[:, o : o + half, :].set(child)
        return llr_st

    def propagate_bits(bit_st, phase: int, cur: jnp.ndarray):
        level, node, size = n, phase, 1
        while level > 0 and node % 2 == 1:
            o = off[level]
            left = bit_st[:, o : o + size, :]
            cur = jnp.concatenate([left ^ cur, cur], axis=1)
            node //= 2
            level -= 1
            size *= 2
        if level > 0:
            o = off[level]
            bit_st = bit_st.at[:, o : o + size, :].set(cur)
        return bit_st

    for phase in range(N):
        u_index = int(perm[phase])
        llr_st = run_updates(llr_st, bit_st, phase)
        leaf = llr_st[:, off[n], :]  # [L, B]
        hard = (leaf < 0).astype(jnp.int8)
        base = conv_edge_base(conv_state)  # edge bit for v = 0

        if mask_rev[phase] == 0:
            # frozen: v = 0, edge = base; penalize edge ≠ hard decision
            pm = pm + jnp.where(base != hard, jnp.abs(leaf), 0.0)
            conv_state = shift_state(conv_state, jnp.zeros((L, B), jnp.int8))
            bit_st = propagate_bits(bit_st, phase, base[:, None, :])
            continue

        # info: good branch (edge == hard, no penalty) first, bad second
        v_good = base ^ hard  # v with conv edge matching the hard decision
        pm_bad = pm + jnp.abs(leaf)
        cand_pm = jnp.concatenate([pm, pm_bad], axis=0)  # [2L, B]

        order = jnp.argsort(cand_pm, axis=0, stable=True)  # [2L, B]
        winners = order[:L]
        parent = jnp.mod(winners, L)
        is_bad = (winners >= L).astype(jnp.int8)

        pidx = parent[:, None, :]
        llr_st = jnp.take_along_axis(llr_st, pidx, axis=0)
        bit_st = jnp.take_along_axis(bit_st, pidx, axis=0)
        conv_state = jnp.take_along_axis(conv_state, pidx, axis=0)
        v_dec = jnp.take_along_axis(v_dec, pidx, axis=0)
        pm = jnp.take_along_axis(cand_pm, winners, axis=0)

        v_bit = jnp.take_along_axis(v_good, parent, axis=0) ^ is_bad
        edge = jnp.take_along_axis(base, parent, axis=0) ^ v_bit  # gen[0] = 1

        v_dec = v_dec.at[:, u_index, :].set(v_bit)
        conv_state = shift_state(conv_state, v_bit)
        bit_st = propagate_bits(bit_st, phase, edge[:, None, :])

    # final stable sort, extraction, CRC selection
    final_order = jnp.argsort(pm, axis=0, stable=True)
    pm = jnp.take_along_axis(pm, final_order, axis=0)
    v_dec = jnp.take_along_axis(v_dec, final_order[:, None, :], axis=0)

    positions = np.where(mask == 1)[0]
    cand = v_dec[:, positions, :]  # [L, Kp, B]
    valid = jnp.isfinite(pm)

    if crc_len > 0:
        full_poly = hex((1 << crc_len) | crc_poly)
        Hc = jnp.asarray(check_matrix(full_poly, Kp), dtype)
        syn = jnp.mod(jnp.einsum("dk,lkb->ldb", Hc, cand.astype(dtype)), 2.0)
        crc_ok = jnp.all(syn == 0.0, axis=1) & valid
        any_ok = jnp.any(crc_ok, axis=0)
        first_ok = jnp.argmax(crc_ok, axis=0)
        best_index = jnp.where(any_ok, first_ok, 0)
        crc_pass = any_ok
    else:
        best_index = jnp.zeros((B,), jnp.int32)
        crc_pass = jnp.zeros((B,), bool)

    bsel = best_index[None, None, :]
    extracted = jnp.take_along_axis(cand, bsel.astype(jnp.int32), axis=0)[0]  # [Kp, B]

    return {
        "extracted": extracted.T,
        "candidates": cand.transpose(2, 0, 1),
        "metrics": pm.T,
        "valid": valid.T,
        "crc_pass": crc_pass,
        "v_full": v_dec.transpose(2, 0, 1),  # [B, L, N] message-domain bits
    }


def pac_decode(
    llr: jnp.ndarray,
    mask: np.ndarray,
    gen,
    L: int,
    *,
    crc_len: int = 0,
    crc_poly: int = 0,
    backend: str = "auto",
) -> dict:
    """Decode with the fastest eligible backend.

    Returns at least {"extracted", "crc_pass"}; the XLA path additionally
    returns candidates/metrics/v_full.
    """

    B = int(llr.shape[0])
    if backend != "xla":
        from ..ops.backend import PALLAS_BLOCK, on_tpu

        eligible = (
            (L & (L - 1)) == 0 and L <= 8 and B % PALLAS_BLOCK == 0 and on_tpu()
        )
        if eligible:
            from .pac_pallas import pac_list_decode_pallas

            return pac_list_decode_pallas(
                llr, mask, gen, L, crc_len=crc_len, crc_poly=crc_poly
            )
        if backend == "pallas":
            raise ValueError(
                "pallas backend requires TPU, power-of-two L ≤ 8, batch % 128 == 0"
            )
    return pac_list_decode_batch(llr, mask, gen, L, crc_len=crc_len, crc_poly=crc_poly)


__all__ = [
    "pac_encode_batch",
    "pac_list_decode_batch",
    "pac_decode",
    "conv_transform_matrix",
]
