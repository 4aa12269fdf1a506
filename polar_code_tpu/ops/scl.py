"""Batched CRC-aided successive-cancellation list (SCL) decoder.

Reference semantics: `dl_scl_polar/polar/scl.py` — per-path LLR/partial-sum
trees, exact `log(1+e^∓LLR)` path metric, fork-both-bits at free info
phases, stable sort by metric with creation-order tie-break, top-M prune,
`force_info_bits` plans (−1 free / 0 / 1), per-info-phase LLR recording,
CRC-filtered candidate selection with best-metric fallback.

TPU-native design (this is a re-design, not a translation):

* The reference recomputes every ancestor f/g vector from the root at each
  leaf (`scl.py:64-78`, O(N²·M) per frame) and deep-copies whole trees to
  clone paths (`scl.py:52-62`).  Here the decoder keeps *compact* per-path
  state — one active node per tree level (2N−1 LLR values + N−1 partial
  sums per path) — updated incrementally with the classic O(N log N)
  schedule, and clones paths by a single gather over the list axis.
* The phase loop is unrolled at trace time: for each phase the set of f/g
  level updates and partial-sum XOR combines is statically known (from the
  trailing-zero structure of the phase index), so the compiled program is
  straight-line vectorized code with no data-dependent control flow.
* All state is laid out batch-last ([M, seg, B]) so the frame batch rides
  the TPU lane dimension; the list axis M ≤ 8 and the shrinking segment
  axis live in sublanes.
* List growth (the reference starts with one path and forks up to M) is
  modeled with fixed [M] slots: unused slots carry a +inf metric and are
  never selected.  Forced (non-forking) phases mask the disallowed branch
  to +inf, which reproduces the reference's extend-in-place semantics under
  the same stable sort.
* Sorting: the reference stable-sorts paths by metric after *every* phase.
  Order changes on frozen phases only matter through exact metric ties
  (path contents don't change), so this implementation sorts/gathers at
  info phases only, plus one final sort — value-identical behavior, half
  the gathers.

Returns fixed-shape arrays; a scalar reference-compatible wrapper lives in
`polar_code_tpu.polar.api`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..polar.construct import frozen_mask as _frozen_mask
from .crc import check_matrix
from .sc import f_minsum, g_update


@dataclass
class SCLResult:
    """Batched SCL decode output (batch-first at the public boundary).

    candidates:  int8 [B, M, K]  — info+CRC bits per surviving path, sorted
                                   by final path metric (reference order).
    metrics:     f32  [B, M]     — path metrics (+inf for unused slots).
    valid:       bool [B, M]     — real (reachable) paths.
    info_llrs:   f32  [B, M, K]  — decision LLR per info phase per path.
    best_index:  int32 [B]       — CRC-selected candidate (or 0 fallback).
    best_path_bits:      int8 [B, K]
    best_path_info_llrs: f32  [B, K]
    crc_pass:    bool [B]        — best candidate passes the CRC (False when
                                   no CRC was requested).
    """

    candidates: jnp.ndarray
    metrics: jnp.ndarray
    valid: jnp.ndarray
    info_llrs: jnp.ndarray
    best_index: jnp.ndarray
    best_path_bits: jnp.ndarray
    best_path_info_llrs: jnp.ndarray
    crc_pass: jnp.ndarray


jax.tree_util.register_dataclass(
    SCLResult,
    data_fields=[
        "candidates",
        "metrics",
        "valid",
        "info_llrs",
        "best_index",
        "best_path_bits",
        "best_path_info_llrs",
        "crc_pass",
    ],
    meta_fields=[],
)


def _level_offsets(N: int) -> Tuple[dict, int]:
    """Compact per-path storage offsets: level l (1..n) holds N>>l values."""

    off = {}
    o = 0
    n = int(math.log2(N))
    for level in range(1, n + 1):
        off[level] = o
        o += N >> level
    return off, o  # o == N - 1


def _softplus(x: jnp.ndarray) -> jnp.ndarray:
    # log(1 + e^x), matching np.logaddexp(0, x) semantics (inf-safe).
    return jnp.logaddexp(0.0, x)


def decode_scl_batch(
    llr: jnp.ndarray,
    info_set,
    M: int,
    crc: Optional[str] = None,
    *,
    force_info_bits: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> SCLResult:
    """Decode a batch of frames with list size M.

    llr:             [B, N] channel LLRs.
    info_set:        static int vector (sorted ascending), K entries.
    crc:             optional hex polynomial for candidate selection.
    force_info_bits: optional int [B, K] with entries −1 (free) / 0 / 1.
    """

    if M <= 0:
        raise ValueError("List size M must be positive")
    info_np = np.asarray(info_set, dtype=np.int64)
    B, N = int(llr.shape[0]), int(llr.shape[1])
    n = int(math.log2(N))
    if 1 << n != N:
        raise ValueError("N must be a power of two")
    K = int(info_np.size)
    frozen = _frozen_mask(N, info_np)
    off, state_len = _level_offsets(N)
    INF = jnp.asarray(jnp.inf, dtype)

    chan = llr.T.astype(dtype)  # [N, B], shared by all paths
    llr_st = jnp.zeros((M, state_len, B), dtype)
    bit_st = jnp.zeros((M, state_len, B), jnp.int8)
    pm = jnp.full((M, B), jnp.inf, dtype).at[0].set(0.0)
    u_info = jnp.zeros((M, K, B), jnp.int8)
    info_llrs = jnp.zeros((M, K, B), dtype)

    forced = None
    if force_info_bits is not None:
        forced = force_info_bits.astype(jnp.int8).T  # [K, B]

    def run_updates(llr_st, bit_st, phase: int):
        """Statically-scheduled f/g updates bringing the leaf LLR current."""

        if phase == 0:
            levels = [(l, "f") for l in range(1, n + 1)]
        else:
            k = (phase & -phase).bit_length() - 1  # count trailing zeros
            levels = [(n - k, "g")] + [(l, "f") for l in range(n - k + 1, n + 1)]
        for level, op in levels:
            half = N >> level
            if level == 1:
                parent = chan  # [N, B] — broadcasts over the list axis
                a, b = parent[:half], parent[half:]
            else:
                po = off[level - 1]
                parent = llr_st[:, po : po + (N >> (level - 1)), :]
                a, b = parent[:, :half, :], parent[:, half:, :]
            o = off[level]
            if op == "f":
                child = f_minsum(a, b)
            else:
                c = bit_st[:, o : o + half, :]
                child = g_update(a, b, c)
            if child.ndim == 2:  # level-1 f from shared channel LLRs
                child = jnp.broadcast_to(child, (M, half, B))
            llr_st = llr_st.at[:, o : o + half, :].set(child)
        return llr_st

    def propagate_bits(bit_st, phase: int, cur: jnp.ndarray):
        """Partial-sum combine while the node index is odd (static chain)."""

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

    info_index = 0
    for phase in range(N):
        llr_st = run_updates(llr_st, bit_st, phase)
        leaf = llr_st[:, off[n], :]  # [M, B]

        if frozen[phase]:
            pm = pm + _softplus(-leaf)
            zero = jnp.zeros((M, 1, B), jnp.int8)
            bit_st = propagate_bits(bit_st, phase, zero)
            continue

        i = info_index
        info_index += 1

        # Candidate metrics, creation order c = 2p + b (reference fork order).
        pm0 = pm + _softplus(-leaf)  # extend with bit 0
        pm1 = pm + _softplus(leaf)  # extend with bit 1
        cand_pm = jnp.stack([pm0, pm1], axis=1).reshape(2 * M, B)

        if forced is not None:
            fb = forced[i]  # [B]
            bit_of = jnp.arange(2 * M, dtype=jnp.int8) & 1  # [2M]
            disallow = (fb[None, :] != -1) & (bit_of[:, None] != fb[None, :])
            cand_pm = jnp.where(disallow, INF, cand_pm)

        order = jnp.argsort(cand_pm, axis=0, stable=True)  # [2M, B]
        winners = order[:M]  # [M, B]
        parent = winners >> 1
        bit = (winners & 1).astype(jnp.int8)

        pidx = parent[:, None, :]
        llr_st = jnp.take_along_axis(llr_st, pidx, axis=0)
        bit_st = jnp.take_along_axis(bit_st, pidx, axis=0)
        u_info = jnp.take_along_axis(u_info, pidx, axis=0)
        info_llrs = jnp.take_along_axis(info_llrs, pidx, axis=0)
        pm = jnp.take_along_axis(cand_pm, winners, axis=0)

        u_info = u_info.at[:, i, :].set(bit)
        leaf_g = jnp.take_along_axis(leaf, parent, axis=0)
        info_llrs = info_llrs.at[:, i, :].set(leaf_g)

        bit_st = propagate_bits(bit_st, phase, bit[:, None, :])

    # Final stable sort by metric (the reference sorts after every phase;
    # trailing frozen phases can reorder, so sort once more here).
    final_order = jnp.argsort(pm, axis=0, stable=True)  # [M, B]
    pm = jnp.take_along_axis(pm, final_order, axis=0)
    fidx = final_order[:, None, :]
    u_info = jnp.take_along_axis(u_info, fidx, axis=0)
    info_llrs = jnp.take_along_axis(info_llrs, fidx, axis=0)

    valid = jnp.isfinite(pm)  # [M, B]

    if crc is not None:
        Hc = jnp.asarray(check_matrix(crc, K), dtype)  # [deg, K]
        syn = jnp.mod(jnp.einsum("dk,mkb->mdb", Hc, u_info.astype(dtype)), 2.0)
        crc_ok = jnp.all(syn == 0.0, axis=1) & valid  # [M, B]
        any_ok = jnp.any(crc_ok, axis=0)  # [B]
        first_ok = jnp.argmax(crc_ok, axis=0)  # [B]
        best_index = jnp.where(any_ok, first_ok, 0).astype(jnp.int32)
        crc_pass = any_ok
    else:
        best_index = jnp.zeros((B,), jnp.int32)
        crc_pass = jnp.zeros((B,), bool)

    bsel = best_index[None, None, :]
    best_bits = jnp.take_along_axis(u_info, bsel, axis=0)[0]  # [K, B]
    best_llrs = jnp.take_along_axis(info_llrs, bsel, axis=0)[0]

    return SCLResult(
        candidates=u_info.transpose(2, 0, 1),
        metrics=pm.T,
        valid=valid.T,
        info_llrs=info_llrs.transpose(2, 0, 1),
        best_index=best_index,
        best_path_bits=best_bits.T,
        best_path_info_llrs=best_llrs.T,
        crc_pass=crc_pass,
    )


__all__ = ["decode_scl_batch", "SCLResult"]
