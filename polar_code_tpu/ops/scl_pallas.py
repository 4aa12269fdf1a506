"""Pallas TPU kernel: fused CRC-aided SCL decode (the ◆◆ hot core).

Why a kernel: the pure-XLA decoder (`ops/scl.py`) lowers to ~10³ small ops
per decode (one dispatch per f/g/sort/gather step); measured on a v5e chip
the per-op overhead dominates end-to-end time.  This kernel runs the entire
128-phase decode as ONE launch per batch tile with all per-path state
resident in VMEM.

Design (see `ops/scl.py` for the semantics being implemented — identical
math, reference `dl_scl_polar/polar/scl.py`):

* Grid over batch tiles of BT frames (batch rides the TPU lane dimension;
  all state arrays are [..., BT]).
* Compact per-path state: one active node per tree level — LLR rows
  (N−1) + partial-sum rows (N−1) per path, unified in a single f32 VMEM
  buffer (bits stored as 0.0/1.0; XOR = a + b − 2ab).
* The phase loop is a `fori_loop` whose body is *specialized by schedule
  branches* driven by SMEM-prefetched tables: one branch per possible
  g-level runs exactly the needed g + f-descent; one branch per possible
  partial-sum store level runs exactly the needed combine chain (average
  O(1) rows/phase).  Only one branch of each family executes per phase,
  so the Mosaic graph stays small while the executed instruction stream
  is minimal.
* Fork/prune at info phases: 2M candidate metrics with the exact
  `log(1+e^∓LLR)` penalty; a sorting network over (metric, creation-index)
  pairs reproduces the reference's stable sort bit-for-bit — sublane-packed
  bitonic on one [2M, BT] vreg block (compare-exchange via `pltpu.roll`)
  for M≥4, per-row Batcher odd-even comparators for the tiny lists.
  Unused list slots carry +inf metrics.
* Survivor "cloning" is LAZY (default): per-level path-origin maps σ
  compose at each fork (σ ← σ[parent]) and the few reads that cross a
  fork boundary gather through them — O(N log N) data movement per
  decode instead of the fork-time clone-by-gather's O(N²) row-gathers
  (which measured 75% of decode time at N=512 M=8), and the state planes
  are never permuted in place, so no plane-sized stack copies and
  P(1024,512) M=8 fits VMEM.  The fork-time mode (liveness-restricted
  clone-by-gather via binary select trees) is kept as `lazy_clone=False`;
  both modes are bit-identical.
* Path histories are NOT gathered every phase: (parent, bit, leaf-LLR)
  traces are recorded per info phase and candidates are reconstructed by
  a backtracking loop at the end — this removes the [M, K] info-bit
  planes from the per-phase clone entirely.
* CRC selection: the backtrack stages candidate bits in ≤128-row chunks
  and folds each chunk into per-rank syndrome accumulators with an MXU
  matmul against the precomputed GF(2) check matrix (`ops/crc.py`) — no
  [K, M, BT] candidate plane is ever materialized; selection is
  first-passing-else-best, and a final selected-path backtrack emits the
  winner's bits and leaf LLRs, all in-kernel.

`force_info_bits` plans (−1/0/1) are honored by masking disallowed
branches to +inf, matching the reference's extend-in-place semantics.
"""

from __future__ import annotations

import functools
import math
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..polar.construct import frozen_mask as _frozen_mask
from .crc import check_matrix

_BIG = 3.0e38  # +inf stand-in that survives f32 arithmetic

# Attribution probe (dev tool): comma-separated stage names to no-op, e.g.
# SCL_KERNEL_ABLATE=clone,sort python tools/ab_kernel.py ...
# Ablated kernels produce WRONG results — timing deltas only.  Read at
# import; the kernel cache is keyed by build args, so set before first use.
_ABLATE = frozenset(
    s for s in os.environ.get("SCL_KERNEL_ABLATE", "").split(",") if s
)


def _batcher_pairs(n: int) -> List[Tuple[int, int]]:
    """Comparator list for Batcher's odd-even mergesort (n a power of two)."""

    pairs: List[Tuple[int, int]] = []

    def oddeven_merge(lo: int, hi: int, r: int) -> None:
        step = r * 2
        if step < hi - lo:
            oddeven_merge(lo, hi, step)
            oddeven_merge(lo + r, hi, step)
            for i in range(lo + r, hi - r, step):
                pairs.append((i, i + r))
        else:
            pairs.append((lo, lo + r))

    def sort(lo: int, hi: int) -> None:
        if hi - lo >= 2:
            mid = (hi - lo) // 2
            sort(lo, lo + mid)
            sort(lo + mid, hi)
            oddeven_merge(lo, hi, 1)

    sort(0, n)
    return pairs


def _schedule_tables(N: int, info_np: np.ndarray):
    """Static per-phase schedules (see ops/scl.py run_updates/propagate_bits)."""

    n = int(math.log2(N))
    upd = np.zeros((N, n + 1), np.int32)  # 0 none / 1 f / 2 g, per level 1..n
    store = np.zeros((N, n + 1), np.int32)  # store partial-sum cur at level
    for phase in range(N):
        if phase == 0:
            upd[0, 1 : n + 1] = 1
        else:
            k = (phase & -phase).bit_length() - 1
            upd[phase, n - k] = 2
            upd[phase, n - k + 1 : n + 1] = 1
        level, node = n, phase
        while level > 0 and node % 2 == 1:
            node //= 2
            level -= 1
        if level > 0:
            store[phase, level] = 1

    # g-level per phase: phase 0 has none (pure f-descent, sentinel 0)
    glevel = np.zeros(N, np.int32)
    for phase in range(1, N):
        k = (phase & -phase).bit_length() - 1
        glevel[phase] = n - k

    frozen = _frozen_mask(N, info_np).astype(np.int32)
    infoidx = np.zeros(N, np.int32)
    idx = 0
    for phase in range(N):
        if not frozen[phase]:
            infoidx[phase] = idx
            idx += 1

    # Liveness for clone-by-gather: at the fork of phase j, a level's rows
    # only need gathering if some phase > j semantically reads them before
    # overwriting.  Computed by a reverse sweep over the exact schedule:
    # NEED_before(p) = (NEED_after(p) − writes(p)) ∪ reads(p);
    # live(j) = NEED_after(j).
    llr_live = np.zeros((N, n + 1), np.int32)
    bit_live = np.zeros((N, n + 1), np.int32)
    need_llr: set = set()
    need_bit: set = set()
    for p in range(N - 1, -1, -1):
        # The gather at the fork of phase p runs mid-phase: after the leaf
        # decision, BEFORE the partial-sum propagation.  It must preserve
        # everything later phases need PLUS the bit rows this phase's own
        # combine chain is about to read.
        lvl, node = n, p
        comb_levels = []
        while lvl > 0 and node % 2 == 1:
            comb_levels.append(lvl)
            node //= 2
            lvl -= 1
        for level in range(1, n + 1):
            llr_live[p, level] = int(level in need_llr)
            bit_live[p, level] = int(level in need_bit or level in comb_levels)
        # reverse-apply phase p: remove its writes, add its reads
        # (a) partial-sum propagation: combines read bit[level] for levels
        #     n .. store_level+1; the store writes bit[store_level]
        if lvl > 0:
            need_bit.discard(lvl)  # written here
        for c in comb_levels:
            need_bit.add(c)  # read here
        # (b) the leaf decision reads llr[n] at this phase
        need_llr.add(n)
        # (c) f/g updates (applied top-down at runtime; reverse bottom-up)
        for level in range(n, 0, -1):
            if upd[p, level] == 0:
                continue
            need_llr.discard(level)  # written
            if level > 1:
                need_llr.add(level - 1)  # parent read
            if upd[p, level] == 2:
                need_bit.add(level)  # g reads stored left bits

    # --- σ fork-interval analysis (lazy clone, static schedules) -------
    # A σ-gathered read needs its select tree only if a fork (info phase)
    # can have occurred between the σ row's last reset (= its level's last
    # write) and the read.  With the frozen mask a compile-time constant,
    # this is decidable per read site by replaying the schedule with a
    # fork counter.  gpar_need[p]: the scheduled g's parent-LLR read at
    # phase p; comb_need[p, v]: the combine chain's left-bit read at level
    # v during phase p's store (which runs post-fork of p itself).  The
    # g's left-BIT read never crosses a fork (store at q → g at q+1, no
    # fork between) and is dropped unconditionally in the kernel.
    gpar_need = np.zeros(N, np.int32)
    comb_need = np.zeros((N, n + 1), np.int32)
    last_l = {lv: 0 for lv in range(1, n)}   # σ[sli(lv)] last reset
    last_b = {lv: 0 for lv in range(1, n + 1)}  # σ[sbi(lv)] last reset
    forks = 0
    for p in range(N):
        gl = int(glevel[p])
        if gl > 1:
            gpar_need[p] = int(last_l[gl - 1] < forks)
        for lv in range((gl if gl > 0 else 1), n):
            last_l[lv] = forks  # descent writes levels gl..n−1 (+ reset)
        if not frozen[p]:
            forks += 1
        lvl, node = n, p
        while lvl > 0 and node % 2 == 1:
            comb_need[p, lvl] = int(last_b[lvl] < forks)
            node //= 2
            lvl -= 1
        if lvl > 0:
            last_b[lvl] = forks  # store (post-fork) resets σ[sbi(lvl)]

    return upd, store, frozen, infoidx, llr_live, bit_live, glevel, gpar_need, comb_need


def _softplus(x):
    # log(1 + e^x) == np.logaddexp(0, x), stable for large |x|
    if "metric" in _ABLATE:
        return jnp.abs(x)  # ablation stand-in: one cheap op, wrong values
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _bitonic_layers(R: int) -> List[Tuple[int, int]]:
    """(k, j) layer list of the bitonic sorting network for R rows."""

    layers: List[Tuple[int, int]] = []
    k = 2
    while k <= R:
        j = k // 2
        while j >= 1:
            layers.append((k, j))
            j //= 2
        k *= 2
    return layers


def _packed_sort(pm, idx):
    """Sublane-packed bitonic sort of [R, BT] (metric, index) rows.

    Sorts ascending by the compound key (pm, idx); since creation indices
    are distinct, this equals the reference's stable sort by metric.  Each
    layer is a handful of full-[R, BT] vector ops (two sublane rolls per
    operand + masked compare-exchange) instead of per-comparator work on
    single-sublane rows — the whole 2M-candidate network runs on packed
    vregs.
    """

    R = pm.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, pm.shape, 0)
    for k, j in _bitonic_layers(R):
        bitj = (row & j) != 0  # high position of the (i, i^j) pair
        # keep_min = ascending XOR high-position; keys are unique so the
        # compare-exchange is take-partner = (mine > partner) XOR keep_max
        keep_max = ((row & k) == 0) == ((row & j) != 0)
        ppm = jnp.where(bitj, pltpu.roll(pm, j, axis=0), pltpu.roll(pm, (R - j) % R, axis=0))
        pidx = jnp.where(bitj, pltpu.roll(idx, j, axis=0), pltpu.roll(idx, (R - j) % R, axis=0))
        g = (pm > ppm) | ((pm == ppm) & (idx > pidx))
        take = g ^ keep_max
        pm = jnp.where(take, ppm, pm)
        idx = jnp.where(take, pidx, idx)
    return pm, idx


def _index_bits(idx, m: int):
    """LSB-first bit planes of a float index in [0, m): list of [1, BT] bools."""

    bits = []
    x = idx
    for _ in range((m - 1).bit_length() if m > 1 else 0):
        half = jnp.floor(x * 0.5)
        bits.append(x - 2.0 * half == 1.0)
        x = half
    return bits


def _select_m(rows, idx):
    """rows: [M, BT]; idx: [1, BT] float path index → gathered [1, BT].

    Binary select tree: M−1 vector selects instead of the masked-sum's
    M selects + M adds.
    """

    M = rows.shape[0]
    if M == 1:
        return rows[0:1, :]
    vals = [rows[p : p + 1, :] for p in range(M)]
    for cond in _index_bits(idx, M):
        vals = [jnp.where(cond, vals[2 * j + 1], vals[2 * j]) for j in range(len(vals) // 2)]
    return vals[0]


def _kernel_body(
    # scalar-prefetch (SMEM).  The per-(phase, level) tables ride as FLAT
    # 1-D arrays indexed `phase*(n+1)+level`: SMEM pads a 2-D array's minor
    # dim to 128, which would cost 512 KB per [N, n+1] table at N=1024 and
    # blow the 1 MB SMEM budget.  Under `full_unroll` the tables are unused
    # (the schedule is baked into the program) and 1-element dummies are
    # prefetched instead.
    glevel_ref, store_ref, frozen_ref, infoidx_ref, llrlive_ref, bitlive_ref,
    # inputs (VMEM blocks)
    llr_ref,      # [N, BT] channel LLRs
    forced_ref,   # [K, BT] int32 plan (−1 free / 0 / 1)
    hc_ref,       # [deg, K] f32 CRC check matrix (dummy [1,1] when unused)
    # outputs
    bits_ref,     # [K, BT] int32 best path bits
    llrs_ref,     # [K, BT] f32 best path info LLRs
    pass_ref,     # [1, BT] int32 CRC pass
    # scratch
    state_ref,    # [M, N−1, BT] f32 LLR rows (one active node per level)
    bstate_ref,   # [M, N−1, BT] partial-sum rows; 0/1 values, so bf16 is
                  # exact and halves the clone-gather bytes (`bit_dtype`)
    pm_ref,       # [M, BT] f32 path metrics
    tidx_ref,     # [K, M, BT] f32 trace: creation index 2·parent+bit
                  # (parent + chosen bit packed in one plane; dim-0 dynamic
                  # indexing keeps every access slab-aligned — flat [K·M]
                  # rows fail Mosaic's sublane-alignment check for M<8)
    tleaf_ref,    # [K, M, BT] f32 trace: leaf LLR by *parent* slot; after
                  # the selected-path backtrack, slot 0 of each row doubles
                  # as the llrs output staging (no cllrs plane)
    staged_ref,   # [CH<=128, M, BT] f32 backtrack staging: candidate bits
                  # of one row-chunk, consumed by the per-chunk syndrome
                  # matmul (replaces the full [K, M, BT] cbits plane)
    curidx_ref,   # [M, BT] f32 backtrack cursor
    sig_ref,      # [M, 2n-1, BT] f32 lazy-clone path-origin maps σ
                  # (dummy [1, 1, BT] in fork-clone mode / M=1)
    syn_ref,      # [M, deg, BT] f32 per-rank CRC syndrome accumulators
                  # (dummy when CRC unused or M=1)
    *,
    N: int, M: int, K: int, use_crc: bool, bit_dtype=jnp.float32,
    packed_sort: bool = True, loop_unroll: int = 2, static_tables=None,
    has_force: bool = True, lazy_clone: bool = True, gchunk: int = 128,
    sigma_skip: bool = True,
):
    n = int(math.log2(N))
    BT = llr_ref.shape[1]
    off = {}
    o = 0
    for level in range(1, n + 1):
        off[level] = o
        o += N >> level

    def lrows(level):
        return slice(off[level], off[level] + (N >> level))

    brows = lrows  # same level layout, separate (bit) buffer

    # --- init ---------------------------------------------------------
    # No zero-init of state/bstate: the SC schedule writes every LLR row
    # (full f-descent at phase 0; f/g rewrite levels top-down thereafter)
    # and every partial-sum row before its first semantic read (store at
    # level l always precedes the g/combine that reads it).  Clone gathers
    # may copy unwritten garbage rows, which is harmless — they are dead by
    # the same liveness argument.  Skipping the init saves 2·M·(N−1)·BT·4
    # bytes of VMEM writes per tile (~1 MB at N=128 M=8).
    slot = jax.lax.broadcasted_iota(jnp.int32, (M, BT), 0)
    pm_ref[...] = jnp.where(slot == 0, 0.0, _BIG)

    sort_pairs_2m = _batcher_pairs(2 * M)
    sort_pairs_m = _batcher_pairs(M) if M > 1 else []

    # --- lazy clone: per-level path-origin maps σ ---------------------
    # Fork-time clone-by-gather physically permutes every live state row
    # at every fork — O(N) rows × K forks = O(N²) row-gathers per decode
    # (measured 75% of decode time at N=512 M=8).  Lazy mode instead keeps
    # one σ map per tree level: sig[m, row, :] = which *physical* slot
    # holds the logical data of path m for that level.  At a fork the maps
    # compose (σ ← σ[parent], one [M, 2n−1, BT] select-tree pass); a level
    # write resets its σ row to identity; and the only reads that ever
    # cross a fork boundary — the g-update at the top of each phase's
    # descent (parent LLR row + stored left bits) and the combine chain's
    # left-sibling reads — gather through σ.  Same values, O(N log N)
    # data movement.  (f-reads consume rows written earlier in the same
    # phase, so they never need σ; LLR level n is consumed at its own
    # phase's leaf and needs no σ row.)
    lazy = lazy_clone and M > 1
    n_sig = 2 * n - 1

    def sli(level):  # σ row of LLR level (1..n−1)
        return level - 1

    def sbi(level):  # σ row of partial-sum level (1..n)
        return (n - 1) + (level - 1)

    if lazy:
        sig_ref[...] = jax.lax.broadcasted_iota(
            jnp.int32, (M, n_sig, BT), 0
        ).astype(jnp.float32)

    def sig_reset(row):
        if lazy:
            sig_ref[:, row : row + 1, :] = jax.lax.broadcasted_iota(
                jnp.int32, (M, 1, BT), 0
            ).astype(jnp.float32)

    def sig_gather(rows, row):
        """rows: [M, span, BT] → logical per-slot view rows[σ[m]]."""

        if not lazy or "clone" in _ABLATE:
            return rows
        srcs = [rows[p] for p in range(M)]
        outs = []
        for m in range(M):
            vals = srcs
            for cond in _index_bits(sig_ref[m, row : row + 1, :], M):
                vals = [
                    jnp.where(cond, vals[2 * j + 1], vals[2 * j])
                    for j in range(len(vals) // 2)
                ]
            outs.append(vals[0])
        return jnp.stack(outs, axis=0)

    def combine_store(cur0, s, sneed=None):
        """XOR-combine chain from the leaf down to store level s.

        Small spans build the result as one concat value (cheapest — the
        common case, chain length = trailing-ones of the phase, avg O(1)).
        Wide spans (> 128 rows, reached ~3 phases per decode at N≥512)
        fill the destination rows incrementally back-to-front, reading the
        already-written suffix back from VMEM in 128-row chunks — this
        bounds the chain's stack temporaries (a [M, N/2, BT] concat value
        at the level-1 store is what pushed P(1024,512) M=8 past the
        scoped-VMEM cap).

        `sneed` (static-schedule callers only): per-level booleans — σ
        gather of the left-sibling read at level v is skipped when the
        fork-interval analysis proves σ[sbi(v)] identity at this phase.
        None = gather every read (dynamic dispatch).
        """

        if "propagate" in _ABLATE:
            return

        def left_read(rows, level):
            if sigma_skip and sneed is not None and not sneed[level]:
                return rows
            return sig_gather(rows, sbi(level))

        span = N >> s
        if span <= _GCHUNK:
            cur = cur0.astype(bit_dtype)  # 0/1 values: exact in bf16
            for level in range(n, s, -1):
                left = left_read(bstate_ref[:, brows(level), :], level)
                xor = left + cur - jnp.asarray(2.0, bit_dtype) * left * cur
                cur = jnp.concatenate([xor, cur], axis=1)
            bstate_ref[:, brows(s), :] = cur
        else:
            o0 = off[s]
            two = jnp.asarray(2.0, bit_dtype)
            bstate_ref[:, o0 + span - 1 : o0 + span, :] = cur0.astype(bit_dtype)
            L = 1
            for level in range(n, s, -1):
                for c0 in range(0, L, _GCHUNK):
                    ch = min(_GCHUNK, L - c0)
                    left = left_read(
                        bstate_ref[:, off[level] + c0 : off[level] + c0 + ch, :],
                        level,
                    )
                    suf = bstate_ref[
                        :, o0 + span - L + c0 : o0 + span - L + c0 + ch, :
                    ]
                    bstate_ref[
                        :, o0 + span - 2 * L + c0 : o0 + span - 2 * L + c0 + ch, :
                    ] = left + suf - two * left * suf
                L *= 2
        sig_reset(sbi(s))

    def propagate(phase, cur0, smax=None):
        """Partial-sum combine chain, specialized per store level.

        Exactly one store level is scheduled per phase (none on the last
        phase), so only one branch executes; its chain length matches the
        trailing-ones run of the phase index — average cost O(1) rows
        instead of the full N−1-row unconditional chain.  Odd phases never
        store at level n (their leaf node index is odd), so the pair-
        unrolled path passes smax=n−1 to skip that guard.
        """

        if "propagate" in _ABLATE:
            return
        for s in range((n if smax is None else smax), 0, -1):
            @pl.when(store_ref[phase * (n + 1) + s] == 1)
            def _(s=s):
                combine_store(cur0, s)

    def _parent_halves(level, g_read=False):
        # g_read: the caller is the g-update at the top of a phase's
        # descent — the one LLR read that can cross fork boundaries, so it
        # goes through σ in lazy mode.  f-reads consume rows written
        # earlier in the same phase and never need it.
        half = N >> level
        if level == 1:
            return llr_ref[:half, :], llr_ref[half : 2 * half, :]
        parent = state_ref[:, lrows(level - 1), :]
        if g_read:
            parent = sig_gather(parent, sli(level - 1))
        return parent[:, :half, :], parent[:, half:, :]

    def _apply_f(level, ret=False):
        # ret=True (leaf level, static schedules only): return the value
        # instead of writing it — state[n] has no semantic reader besides
        # the immediate leaf decision (llr_live[*, n] is always False), so
        # threading it as a value removes a strided single-sublane VMEM
        # write + read per phase.
        if "fg" in _ABLATE:
            return jnp.zeros((M, N >> level, BT), jnp.float32) if ret else None
        a, b = _parent_halves(level)
        f = jnp.sign(a) * jnp.sign(b) * jnp.minimum(jnp.abs(a), jnp.abs(b))
        if f.ndim == 2:
            f = jnp.broadcast_to(f, (M, N >> level, BT))
        if ret:
            return f
        state_ref[:, lrows(level), :] = f
        if level < n:
            sig_reset(sli(level))

    # Wide g-updates and combine chains run in row chunks in lazy mode so
    # their σ-gather/stack temporaries stay bounded (~3 × [M, gchunk, BT]
    # instead of full [M, N/2, BT] plane values) — this is what keeps
    # P(1024,512) M=8 inside the VMEM budget (128-row chunks; an
    # unchunked combine value alone measured 16.5 MB scoped there).
    _GCHUNK = gchunk

    def _apply_g(level, ret=False, par_sigma=True):
        # The left-bit read (`c`) NEVER goes through σ: the combine chain
        # that stores level-l bits runs at phase q with trailing-ones(q)
        # = n−l, post-fork, ending in sig_reset(sbi(l)); the g at level l
        # that consumes them always runs at phase q+1 (ctz(q+1) = n−l)
        # with no fork in between, so σ[sbi(l)] is identity at every
        # scheduled g — for any frozen mask (verified by simulating the
        # schedule: 0 of 2047 g-bit reads at N=2048 can cross a fork).
        #
        # `par_sigma`: whether the parent-LLR read can cross a fork
        # boundary.  False when the caller proves σ[sli(level−1)] is
        # identity — statically (full-unroll tables) or structurally (the
        # leaf-level g under fork-time parent materialization, see
        # info_leaf).
        if "fg" in _ABLATE:
            return jnp.zeros((M, N >> level, BT), jnp.float32) if ret else None
        if not sigma_skip:
            par_sigma = True  # A/B baseline: pre-skip behavior
        half = N >> level
        if not lazy or ret or half <= _GCHUNK:
            a, b = _parent_halves(level, g_read=par_sigma)
            c = bstate_ref[:, brows(level), :]
            if not sigma_skip:
                c = sig_gather(c, sbi(level))
            c = c.astype(jnp.float32)
            g = b + (1.0 - 2.0 * c) * a
            if ret:
                return g
            state_ref[:, lrows(level), :] = g
        else:
            o0 = off[level]
            for c0 in range(0, half, _GCHUNK):
                ch = min(_GCHUNK, half - c0)
                if level == 1:
                    a = llr_ref[c0 : c0 + ch, :]
                    b = llr_ref[half + c0 : half + c0 + ch, :]
                else:
                    p0 = off[level - 1]
                    a = state_ref[:, p0 + c0 : p0 + c0 + ch, :]
                    b = state_ref[:, p0 + half + c0 : p0 + half + c0 + ch, :]
                    if par_sigma:
                        a = sig_gather(a, sli(level - 1))
                        b = sig_gather(b, sli(level - 1))
                c = bstate_ref[:, o0 + c0 : o0 + c0 + ch, :]
                if not sigma_skip:
                    c = sig_gather(c, sbi(level))
                c = c.astype(jnp.float32)
                state_ref[:, o0 + c0 : o0 + c0 + ch, :] = b + (1.0 - 2.0 * c) * a
        if level < n:
            sig_reset(sli(level))

    def llr_update_branchy(phase, gmax):
        # LLR updates, specialized by the phase's g-level: one g at that
        # level followed by an f-descent to the leaf.  Exactly one branch
        # executes; phase 0 (sentinel 0) is the pure f-descent.  Even
        # phases never have their g at the leaf level, so the pair-unrolled
        # path passes gmax=n−1 to drop that guard.
        gl = glevel_ref[phase]

        @pl.when(gl == 0)
        def _():
            for level in range(1, n + 1):
                _apply_f(level)

        for g_level in range(1, gmax + 1):
            @pl.when(gl == g_level)
            def _(g_level=g_level):
                # level-n g: parent σ provably identity under even-fork
                # materialization (this dynamic-dispatch form only carries
                # the leaf branch in the plain loop, where every fork
                # materializes)
                _apply_g(g_level, par_sigma=g_level < n)
                for level in range(g_level + 1, n + 1):
                    _apply_f(level)

    def frozen_leaf(leaf, store_fn):
        # frozen: extend every path with 0
        if "frozen" in _ABLATE:
            return
        pen = _softplus(-leaf[:, 0, :])  # [M, BT]
        pm_ref[...] = pm_ref[...] + pen
        store_fn(jnp.zeros((M, 1, BT), jnp.float32))

    def info_leaf(phase, i, leaf, store_fn, live_static=None, mat_parent=False):
        # info: fork, stable top-M, clone-by-gather, record traces.
        # `i` is the info index (tracer from SMEM, or Python int when the
        # phase loop is fully unrolled); `live_static`, when given, is the
        # statically-merged (llr_spans, bit_spans) row ranges to gather —
        # otherwise liveness is dispatched from the prefetched tables.
        if "fork" in _ABLATE:
            store_fn(jnp.zeros((M, 1, BT), jnp.float32))
            return
        # Candidate metrics computed on full [M, BT] vregs (the forced
        # mask broadcasts), then sliced into the sort network's rows —
        # one softplus chain instead of M single-sublane ones; the two
        # penalties share one exp/log1p: softplus(±x) = max(±x, 0) + t
        # with t = log1p(exp(−|x|)).
        lf = leaf[:, 0, :]  # [M, BT]
        base = pm_ref[...]
        if "forkmath" in _ABLATE:  # attribution: candidate-metric math only
            c0a = base
            c1a = base + 1.0
        else:
            if "metric" in _ABLATE:
                sp_neg = sp_pos = jnp.abs(lf)  # ablation stand-in
            else:
                t = jnp.log1p(jnp.exp(-jnp.abs(lf)))
                sp_neg = jnp.maximum(-lf, 0.0) + t  # softplus(−lf)
                sp_pos = jnp.maximum(lf, 0.0) + t   # softplus(+lf)
            c0a = base + sp_neg
            c1a = base + sp_pos
            if has_force:
                fb = forced_ref[pl.ds(i, 1), :].astype(jnp.float32)  # [1, BT]
                c0a = jnp.where((fb != -1.0) & (fb != 0.0), _BIG, c0a)
                c1a = jnp.where((fb != -1.0) & (fb != 1.0), _BIG, c1a)
        if packed_sort:
            # 2M candidates packed as [c0 rows | c1 rows]; the creation
            # index rides as a value, so row position is free
            pm2 = jnp.concatenate([c0a, c1a], axis=0)  # [2M, BT]
            row2 = jax.lax.broadcasted_iota(jnp.int32, (2 * M, BT), 0)
            idx2 = jnp.where(row2 < M, 2 * row2, 2 * (row2 - M) + 1).astype(
                jnp.float32
            )
            pm_s, idx_s = (
                (pm2, idx2) if "sort" in _ABLATE else _packed_sort(pm2, idx2)
            )
            par_all = jnp.floor(idx_s[:M, :] * 0.5)  # [M, BT]
            bit_all = idx_s[:M, :] - 2.0 * par_all
            new_pm = pm_s[:M, :]
            parents = [par_all[m : m + 1, :] for m in range(M)]
        else:
            pmc = []
            idxs = []
            for p in range(M):
                pmc += [c0a[p : p + 1, :], c1a[p : p + 1, :]]
                idxs += [
                    jnp.full((1, BT), float(2 * p), jnp.float32),
                    jnp.full((1, BT), float(2 * p + 1), jnp.float32),
                ]
            # stable sort by (metric, creation index)
            for ia, ib in sort_pairs_2m:
                swap = (pmc[ia] > pmc[ib]) | ((pmc[ia] == pmc[ib]) & (idxs[ia] > idxs[ib]))
                pa, pb = pmc[ia], pmc[ib]
                xa, xb = idxs[ia], idxs[ib]
                pmc[ia] = jnp.where(swap, pb, pa)
                pmc[ib] = jnp.where(swap, pa, pb)
                idxs[ia] = jnp.where(swap, xb, xa)
                idxs[ib] = jnp.where(swap, xa, xb)

            parents = []
            bits = []
            for m in range(M):
                par = jnp.floor(idxs[m] * 0.5)
                parents.append(par)
                bits.append(idxs[m] - 2.0 * par)
            par_all = jnp.concatenate(parents, axis=0)
            bit_all = jnp.concatenate(bits, axis=0)
            new_pm = jnp.concatenate(pmc[:M], axis=0)

        # Clone-by-gather, restricted to levels still live at this
        # fork (exact reverse-schedule liveness; dead rows are always
        # rewritten before their next read).  Each output path is a
        # binary select tree over the M source paths keyed by the bit
        # planes of its parent index — M−1 full-width selects per
        # output instead of the masked-sum's M selects + M adds, and
        # the stacked result writes straight back (no double buffer).
        def do_gathers():
            parent_bits = [_index_bits(parents[m], M) for m in range(M)]

            def gather_rows(src, r0, r1):
                srcs = [src[p, r0:r1, :] for p in range(M)]
                outs = []
                for m in range(M):
                    vals = srcs
                    for cond in parent_bits[m]:
                        vals = [
                            jnp.where(cond, vals[2 * j + 1], vals[2 * j])
                            for j in range(len(vals) // 2)
                        ]
                    outs.append(vals[0])
                src[:, r0:r1, :] = jnp.stack(outs, axis=0)

            if live_static is not None:
                # fully-static liveness: gather exactly the live row spans
                llr_spans, bit_spans = live_static
                for r0, r1 in llr_spans:
                    gather_rows(state_ref, r0, r1)
                for r0, r1 in bit_spans:
                    gather_rows(bstate_ref, r0, r1)
                return
            # Large levels gather conditionally (liveness saves real
            # work); small-level tails gather unconditionally in one
            # contiguous block each (branch overhead would exceed the
            # savings).
            cond_levels = [l for l in range(1, n + 1) if (N >> l) >= 16]
            for level in cond_levels:
                @pl.when(llrlive_ref[phase * (n + 1) + level] == 1)
                def _(level=level):
                    gather_rows(state_ref, off[level], off[level] + (N >> level))

                @pl.when(bitlive_ref[phase * (n + 1) + level] == 1)
                def _(level=level):
                    gather_rows(bstate_ref, off[level], off[level] + (N >> level))
            tail = cond_levels[-1] + 1 if cond_levels else 1
            if tail <= n:
                gather_rows(state_ref, off[tail], N - 1)
                gather_rows(bstate_ref, off[tail], N - 1)

        # NB (measured negative result): ~1/3 of (fork, tile) pairs at
        # 5 dB have the identity parent permutation, but guarding the
        # clone behind a `max(|par-iota|)>0` scalar branch is a net
        # 2.5-5% LOSS — the per-fork vector→scalar sync stalls the
        # pipeline for more than the skipped gathers save.
        if M > 1 and "clone" not in _ABLATE:
            if lazy:
                # σ ← σ[parent]: one select-tree pass over the whole
                # [M, 2n−1, BT] map block — the entire per-fork clone cost
                parent_bits = [_index_bits(parents[m], M) for m in range(M)]
                srcs = [sig_ref[p] for p in range(M)]
                outs = []
                for m in range(M):
                    vals = srcs
                    for cond in parent_bits[m]:
                        vals = [
                            jnp.where(cond, vals[2 * j + 1], vals[2 * j])
                            for j in range(len(vals) // 2)
                        ]
                    outs.append(vals[0])
                sig_ref[...] = jnp.stack(outs, axis=0)
                if mat_parent and sigma_skip and n >= 2:
                    # Materialize LLR level n−1 (2 rows) through the fresh
                    # σ and reset its row.  Every even phase rewrites level
                    # n−1 (its descent always reaches it) with a σ reset,
                    # so the only fork that can sit between that write and
                    # the leaf-level g's parent read at the following odd
                    # phase is the even phase's own — materializing here
                    # makes σ[sli(n−1)] identity at EVERY leaf g, which
                    # lets _apply_g(n) skip its M·(M−1)-select gather tree
                    # unconditionally (callers pass par_sigma=False).
                    # Odd-phase forks don't need this (level n−1 is dead
                    # there — rewritten at the next even phase before any
                    # read); callers with static phase parity skip it.
                    rows = state_ref[:, lrows(n - 1), :]
                    state_ref[:, lrows(n - 1), :] = sig_gather(rows, sli(n - 1))
                    sig_reset(sli(n - 1))
            else:
                do_gathers()
        pm_ref[...] = new_pm

        # traces (leaf is indexed by the *old* slot = parent); parent and
        # bit pack losslessly as the creation index 2p+b ∈ [0, 2M) in f32
        if "traces" not in _ABLATE:
            tidx_ref[pl.ds(i, 1)] = (2.0 * par_all + bit_all)[None]
            tleaf_ref[pl.ds(i, 1)] = leaf[:, 0, :][None]

        store_fn(bit_all.reshape(M, 1, BT))

    def leaf_step(phase, store_fn, leaf=None, mat_parent=True):
        # Dynamic-phase leaf decision: dispatch frozen/info from SMEM.
        # `leaf` is the threaded value when the phase's LLR update was
        # static; dynamically-dispatched updates leave it in state[n].
        # `mat_parent`: even-fork parent materialization (see info_leaf);
        # callers that know the phase is odd pass False.
        if leaf is None:
            leaf = state_ref[:, off[n] : off[n] + 1, :]  # [M, 1, BT]
        fz = frozen_ref[phase]

        @pl.when(fz == 1)
        def _():
            frozen_leaf(leaf, store_fn)

        @pl.when(fz == 0)
        def _():
            info_leaf(phase, infoidx_ref[phase], leaf, store_fn,
                      mat_parent=mat_parent)

    def store_even(cur0):
        if "propagate" in _ABLATE:
            return
        bstate_ref[:, brows(n), :] = cur0.astype(bit_dtype)
        sig_reset(sbi(n))

    if static_tables is not None:
        # Fully-unrolled phase loop: the schedule, frozen mask, info
        # indices, and liveness are all compile-time constants, so every
        # loop iteration and schedule/liveness branch disappears — the
        # whole decode is straight-line Mosaic code.  Larger program
        # (~N× the loop body) but no per-phase dispatch at all.  σ reads
        # proven identity by the fork-interval tables skip their gather
        # trees statically (no materialization needed in this mode).
        (stat_frozen, stat_infoidx, stat_glevel, stat_store, stat_llr_live,
         stat_bit_live, stat_gpar, stat_comb) = static_tables

        def static_spans(live_row):
            spans = []
            for level in range(1, n + 1):
                if live_row[level]:
                    r0 = off[level]
                    r1 = r0 + (N >> level)
                    if spans and spans[-1][1] == r0:
                        spans[-1] = (spans[-1][0], r1)  # merge contiguous
                    else:
                        spans.append((r0, r1))
            return spans

        for phase in range(N):
            gl = int(stat_glevel[phase])
            par_sigma = bool(stat_gpar[phase]) or not sigma_skip
            if gl == n:
                leaf = _apply_g(n, ret=True, par_sigma=par_sigma)
            else:
                if gl > 0:
                    _apply_g(gl, par_sigma=par_sigma)
                for level in range(gl + 1, n):
                    _apply_f(level)
                leaf = _apply_f(n, ret=True)

            s_lvls = [s for s in range(1, n + 1) if stat_store[phase, s]]
            s = s_lvls[0] if s_lvls else None
            sneed = [bool(x) for x in stat_comb[phase]]

            def store_fn(cur0, s=s, sneed=sneed):
                if s is None:
                    return
                combine_store(cur0, s, sneed=sneed)

            if stat_frozen[phase]:
                frozen_leaf(leaf, store_fn)
            else:
                spans = (
                    static_spans(stat_llr_live[phase]),
                    static_spans(stat_bit_live[phase]),
                )
                info_leaf(phase, int(stat_infoidx[phase]), leaf, store_fn, spans)
    elif loop_unroll > 1:
        # U phases per iteration (U = 2^u, the partial-unroll family).  For
        # p = U·t + j the low u bits of p equal j, so for every j except 0
        # and U−1 the schedule is a compile-time constant: the g-level is
        # n − ctz(j) and the partial-sum store level is n − trailing_ones(j)
        # with a static combine chain.  Only two dynamic dispatch families
        # remain per U phases — the block-leading phase's g-level (ctz ≥ u
        # ⇒ level ≤ n−u) and the block-trailing phase's store level
        # (trailing-ones run ≥ u ⇒ level ≤ n−u) — vs one per phase in the
        # plain loop.  U=2 is the original (even, odd) pair unroll.
        U = loop_unroll
        u = U.bit_length() - 1

        def u_body(t, _):
            base = U * t
            llr_update_branchy(base, n - u)
            leaf_step(base, store_even)
            for j in range(1, U):
                p = base + j
                even = j % 2 == 0  # phase parity is static (U is even)
                gl = n - ((j & -j).bit_length() - 1)  # static: ctz(j) < u
                if gl == n:
                    # parent σ provably identity: even forks materialize
                    leaf = _apply_g(n, ret=True, par_sigma=False)
                else:
                    _apply_g(gl)
                    for level in range(gl + 1, n):
                        _apply_f(level)
                    leaf = _apply_f(n, ret=True)
                if j == U - 1:
                    # only the block-trailing phase's trailing-ones run can
                    # cross into base's bits: store level stays dynamic
                    leaf_step(
                        p, lambda cur0, p=p: propagate(p, cur0, smax=n - u),
                        leaf=leaf, mat_parent=even,
                    )
                else:
                    ones = 0
                    jj = j
                    while jj & 1:
                        ones += 1
                        jj >>= 1
                    if ones == 0:
                        leaf_step(p, store_even, leaf=leaf, mat_parent=even)
                    else:
                        s = n - ones

                        leaf_step(
                            p, lambda cur0, s=s: combine_store(cur0, s),
                            leaf=leaf, mat_parent=even,
                        )

        jax.lax.fori_loop(0, N // U, u_body, None)
    else:
        def phase_body(phase, _):
            llr_update_branchy(phase, n)
            leaf_step(phase, lambda cur0: propagate(phase, cur0))

        jax.lax.fori_loop(0, N, phase_body, None)

    if M == 1:
        # Single path: no sort, no backtrack — the parent is always slot 0,
        # so the trace planes hold the answer directly (creation index
        # 2·0+b = the bit itself; tleaf = the leaf LLRs in order).
        best_bits = tidx_ref[:, 0, :]  # [K, BT]
        done = jnp.zeros((1, BT), jnp.bool_)
        if use_crc and "crc" not in _ABLATE:
            syn = jax.lax.dot_general(
                hc_ref[...], best_bits, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            syn = syn - 2.0 * jnp.floor(syn * 0.5)
            done = jnp.max(syn, axis=0, keepdims=True) == 0.0
        bits_ref[...] = best_bits.astype(jnp.int32)
        pass_ref[...] = done.astype(jnp.int32)
        llrs_ref[...] = tleaf_ref[:, 0, :]
        return

    # --- final stable sort of the list by metric ----------------------
    if packed_sort:
        fpm_a = pm_ref[...]
        fidx_a = jax.lax.broadcasted_iota(jnp.int32, (M, BT), 0).astype(jnp.float32)
        if M > 1:
            fpm_a, fidx_a = _packed_sort(fpm_a, fidx_a)
        fpm = [fpm_a[m : m + 1, :] for m in range(M)]
        curidx_ref[...] = fidx_a
        fidx_stack = fidx_a
    else:
        fpm = [pm_ref[m : m + 1, :] for m in range(M)]
        fidx = [jnp.full((1, BT), float(m), jnp.float32) for m in range(M)]
        for ia, ib in sort_pairs_m:
            swap = (fpm[ia] > fpm[ib]) | ((fpm[ia] == fpm[ib]) & (fidx[ia] > fidx[ib]))
            pa, pb = fpm[ia], fpm[ib]
            xa, xb = fidx[ia], fidx[ib]
            fpm[ia] = jnp.where(swap, pb, pa)
            fpm[ib] = jnp.where(swap, pa, pb)
            fidx[ia] = jnp.where(swap, xb, xa)
            fidx[ib] = jnp.where(swap, xa, xb)
        fidx_stack = jnp.concatenate(fidx, axis=0)
        curidx_ref[...] = fidx_stack
    # pm_ref is no longer needed (metrics live in fpm): repurpose it to
    # keep the final-sort path indices for the selected-path LLR backtrack
    pm_ref[...] = fidx_stack

    # --- CRC syndromes via chunked candidate backtrack ----------------
    # All-rank candidate BITS are never materialized as a [K, M, BT]
    # plane: the K-step backtracking loop stages one ≤128-row chunk of
    # candidate bits at a time and folds each finished chunk into per-rank
    # syndrome accumulators with one MXU matmul per rank (f32 sums ≤ K are
    # exact; mod 2 once at the end).  Candidate LLR histories are not
    # reconstructed either — only the selected path's, by the second cheap
    # backtrack below.  Net: 3 K-row planes (cbits + the old cllrs) cut to
    # one ≤128-row staging block — how P(1024,512) M=8 fits in VMEM.
    if use_crc and "backtrack" not in _ABLATE:
        CH = staged_ref.shape[0]
        syn_ref[...] = jnp.zeros_like(syn_ref)
        Hc_const = hc_ref[...]  # [deg, K]
        bounds = [(c0, min(CH, K - c0)) for c0 in range(0, K, CH)]
        for c0, sz in reversed(bounds):
            def bt_body(t, _, c0=c0, sz=sz):
                i = c0 + (sz - 1) - t
                tx = tidx_ref[pl.ds(i, 1)][0]  # [M, BT] creation 2p+b
                newcur = []
                brow = []
                for r in range(M):
                    ci = curidx_ref[r : r + 1, :]
                    x = _select_m(tx, ci)
                    p = jnp.floor(x * 0.5)
                    brow.append(x - 2.0 * p)
                    newcur.append(p)
                staged_ref[pl.ds(i - c0, 1)] = jnp.concatenate(brow, axis=0)[None]
                curidx_ref[...] = jnp.concatenate(newcur, axis=0)

            jax.lax.fori_loop(0, sz, bt_body, None)
            if "crc" not in _ABLATE:
                for r in range(M):
                    prod = jax.lax.dot_general(
                        Hc_const[:, c0 : c0 + sz], staged_ref[:sz, r, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    syn_ref[r] = syn_ref[r] + prod

    # --- CRC selection: first passing rank, else best metric ----------
    done = jnp.zeros((1, BT), jnp.bool_)
    sel = jnp.zeros((1, BT), jnp.float32)  # selected rank (0 fallback)
    if use_crc and "crc" not in _ABLATE:
        for r in range(M):
            syn = syn_ref[r]  # [deg, BT] accumulated counts
            syn = syn - 2.0 * jnp.floor(syn * 0.5)
            ok = (jnp.max(syn, axis=0, keepdims=True) == 0.0) & (fpm[r] < _BIG)
            take = ok & jnp.logical_not(done)
            sel = jnp.where(take, float(r), sel)
            done = done | ok
    pass_ref[...] = done.astype(jnp.int32)

    # --- selected-path backtrack: bits + leaf LLRs --------------------
    # Walk the parent chain of the selected rank only, staging the bit and
    # leaf LLR of each row into the (already-consumed) tidx/tleaf rows —
    # trace rows are read before being overwritten, descending in i.
    cur0 = _select_m(pm_ref[...], sel)  # final-sort path index of `sel`

    def sel_bt_body(t, cur):
        i = K - 1 - t
        tx = tidx_ref[pl.ds(i, 1)][0]
        tl = tleaf_ref[pl.ds(i, 1)][0]
        x = _select_m(tx, cur)
        p = jnp.floor(x * 0.5)
        b = x - 2.0 * p
        l = _select_m(tl, p)
        tidx_ref[pl.ds(i, 1)] = jnp.broadcast_to(b, (M, BT))[None]
        tleaf_ref[pl.ds(i, 1)] = jnp.broadcast_to(l, (M, BT))[None]
        return p

    if "backtrack" not in _ABLATE:
        jax.lax.fori_loop(0, K, sel_bt_body, cur0)
    bits_ref[...] = tidx_ref[:, 0, :].astype(jnp.int32)
    llrs_ref[...] = tleaf_ref[:, 0, :]


@functools.lru_cache(maxsize=32)
def _build_kernel_for(
    info_key: Tuple[int, ...], N: int, M: int, crc: Optional[str], BT: int,
    interpret: bool, bit_dtype_name: str = "float32", packed_sort: bool = True,
    loop_unroll: int = 2, full_unroll: bool = False, has_force: bool = True,
    lazy_clone: bool = True, gchunk: int = 128, sigma_skip: bool = True,
):
    info_np = np.asarray(info_key, dtype=np.int64)
    K = int(info_np.size)
    n = int(math.log2(N))
    (upd, store, frozen, infoidx, llr_live, bit_live, glevel,
     gpar_need, comb_need) = _schedule_tables(N, info_np)
    Hc = np.asarray(check_matrix(crc, K)) if crc is not None else None
    n_state = N - 1
    bit_dtype = jnp.dtype(bit_dtype_name)

    static_tables = (
        (frozen, infoidx, glevel, store, llr_live, bit_live, gpar_need,
         comb_need) if full_unroll else None
    )
    kernel = functools.partial(
        _kernel_body, N=N, M=M, K=K, use_crc=crc is not None, bit_dtype=bit_dtype,
        packed_sort=packed_sort, loop_unroll=loop_unroll, static_tables=static_tables,
        has_force=has_force, lazy_clone=lazy_clone, gchunk=gchunk,
        sigma_skip=sigma_skip,
    )

    dummy = np.zeros(1, np.int32)
    if full_unroll:
        # schedule baked into the program — prefetch 1-element dummies
        prefetch = (dummy,) * 6
    else:
        # 2-D tables ride flattened: SMEM pads minor dims to 128.  The
        # liveness tables only drive the fork-time clone; lazy mode
        # replaces them with σ maps and prefetches dummies.
        prefetch = (
            glevel, store.reshape(-1), frozen, infoidx,
            dummy if lazy_clone else llr_live.reshape(-1),
            dummy if lazy_clone else bit_live.reshape(-1),
        )

    hc_arr = (
        np.asarray(Hc, np.float32) if Hc is not None else np.zeros((1, 1), np.float32)
    )
    in_specs = [
        pl.BlockSpec((N, BT), lambda i, *_: (0, i)),
        # un-forced decodes (the common sweep path) carry a 1-row dummy
        # plan: no [K, BT] DMA per tile, no mask math at the forks
        pl.BlockSpec((K if has_force else 1, BT), lambda i, *_: (0, i)),
        pl.BlockSpec(hc_arr.shape, lambda i, *_: (0, 0)),
    ]
    out_specs = [
        pl.BlockSpec((K, BT), lambda i, *_: (0, i)),
        pl.BlockSpec((K, BT), lambda i, *_: (0, i)),
        pl.BlockSpec((1, BT), lambda i, *_: (0, i)),
    ]
    use_syn = crc is not None and M > 1
    CH = min(K, 128)
    deg = int(Hc.shape[0]) if Hc is not None else 1
    n_sig = max(2 * n - 1, 1)
    scratch_shapes = [
        pltpu.VMEM((M, n_state, BT), jnp.float32),
        pltpu.VMEM((M, n_state, BT), bit_dtype),
        pltpu.VMEM((M, BT), jnp.float32),
        pltpu.VMEM((K, M, BT), jnp.float32),  # tidx (2·parent+bit packed)
        pltpu.VMEM((K, M, BT), jnp.float32),  # tleaf (+ llrs staging)
        # backtrack staging chunk (was the [K, M, BT] cbits plane)
        pltpu.VMEM((CH, M, BT) if use_syn else (1, 1, BT), jnp.float32),
        pltpu.VMEM((M, BT), jnp.float32),     # curidx
        # lazy-clone σ maps / per-rank syndrome accumulators
        pltpu.VMEM(
            (M, n_sig, BT) if (lazy_clone and M > 1) else (1, 1, BT),
            jnp.float32,
        ),
        pltpu.VMEM((M, deg, BT) if use_syn else (1, 1, BT), jnp.float32),
    ]

    # The TPU's default *scoped*-VMEM cap is 16 MiB — a compiler setting,
    # not the physical VMEM (measured: a 100 MB scratch kernel compiles
    # and runs on this v5e with a raised cap).  Shapes whose estimated
    # footprint approaches the default get an explicit raised limit
    # (2× the estimate for model slack); small shapes keep the default
    # compile exactly as tuned.
    need = kernel_vmem_bytes(
        N, K, M, BT, bit_dtype, lazy_clone=lazy_clone, gchunk=gchunk
    )
    extra = {}
    if need > int(14 * 2**20):
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(2 * need, int(110 * 2**20))
        )

    def run(llr_t: jnp.ndarray, forced_t: jnp.ndarray):
        B = llr_t.shape[1]
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(B // BT,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        bits_t, llrs_t, pass_t = pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=[
                jax.ShapeDtypeStruct((K, B), jnp.int32),
                jax.ShapeDtypeStruct((K, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
            ],
            interpret=interpret,
            **extra,
        )(
            *(jnp.asarray(p) for p in prefetch),
            llr_t, forced_t, jnp.asarray(hc_arr),
        )
        return bits_t, llrs_t, pass_t

    return run


# The hardware's scoped-VMEM default cap is 16 MiB, but that is a compiler
# setting, not the physical VMEM: this v5e compiles and runs a 100 MB
# scratch kernel once `vmem_limit_bytes` is raised (done automatically in
# `_build_kernel_for` for shapes whose estimate approaches the default).
# The budget below is the routing gate for the XLA fallback — set near the
# physical ceiling with headroom for the pipeline's block double-buffers.
# Every (N ≤ 1024, M ≤ 8) shape fits in-kernel at f32.
VMEM_BUDGET_BYTES = int(96 * 2**20)


def kernel_vmem_bytes(
    N: int, K: int, M: int, BT: int = 128, bit_dtype=jnp.float32,
    *, lazy_clone: bool = True, crc_deg: int = 24, gchunk: int = 128,
) -> int:
    """Estimated scoped-VMEM footprint of one kernel program.

    Mirrors `_build_kernel_for`'s scratch list, including the sublane
    padding Mosaic applies to the second-to-last dim (8 rows for 32-bit
    dtypes, 16 for 16-bit).  In fork-clone mode (lazy_clone=False) the
    LLR + partial-sum plane term is DOUBLED: the clone-by-gather permutes
    the state planes in place and Mosaic materialises the gathered rows as
    stack temporaries before the write-back (calibrated: P(1024,512) M=8
    bf16 reported 19.45 MB scoped vs 13.3 MB declared scratch — the gap is
    those two plane copies).  Lazy mode never permutes the planes; its
    extra terms are the σ maps plus the largest read-gather temporary (the
    level-2 g gathers the [M, N/2, BT] level-1 parent block).  Used by
    `_default_block` and the backend auto-selection to route over-budget
    (N, K, M) shapes to the XLA decoder instead of failing the Mosaic
    compile (the chip rejects scoped allocations above 16 MB).
    """

    def pad(x, p=8):
        return -(-int(x) // p) * p

    bit_isz = jnp.dtype(bit_dtype).itemsize
    bit_pad = 16 if bit_isz == 2 else 8
    n = int(math.log2(N))
    n_state = N - 1
    llr_planes = M * pad(n_state) * BT * 4              # LLR planes
    bit_planes = M * pad(n_state, bit_pad) * BT * bit_isz  # partial sums
    if lazy_clone and M > 1:
        b = llr_planes + bit_planes
        # σ-gather temporaries: wide g-updates are gchunk-row-chunked, so
        # the peak is ~3 gathered chunks in flight
        b += 3 * M * min(pad(N >> 1), gchunk) * BT * 4
        # combine-chain temporaries: wide store levels fill the
        # destination incrementally in gchunk-row pieces (an unchunked
        # [M, N/2, BT] concat value measured 16.50 MB scoped at
        # N=1024 M=8 f32, over the 16 MB cap)
        b += M * min(pad(N >> 1, bit_pad), gchunk) * BT * bit_isz
        b += M * pad(2 * n - 1) * BT * 4    # σ maps
    else:
        b = 2 * (llr_planes + bit_planes)   # resident + clone temporaries
    if bit_isz == 2:
        # 16-bit planes pay f32-width conversion/tiling temporaries on
        # every combine/store (calibrated twice: N=1024 M=8 lazy bf16
        # needed 16.21 MB scoped vs 13.75 modeled without this term —
        # tools/parity_onchip.py 2026-08-21 — and fork-mode bf16 read
        # 19.0 MB vs 16.5 f32 in round 2); budget one f32 shadow of a
        # full plane set
        b += llr_planes
    b += 2 * pad(M) * BT * 4                        # pm + curidx
    b += 2 * K * pad(M) * BT * 4                    # tidx/tleaf
    if M > 1:
        b += min(K, 128) * pad(M) * BT * 4          # backtrack staging
        b += M * pad(crc_deg) * BT * 4              # syndrome accumulators
    # input/output blocks: llr [N, BT], forced [K, BT], bits/llrs [K, BT],
    # pass [1, BT], CRC matrix [deg, K]
    b += (pad(N) + 3 * pad(K) + pad(1)) * BT * 4
    b += pad(crc_deg) * pad(K, 128) * 4
    return b


def _fit_config(N: int, K: int, M: int, BT: int = 128, *, lazy_clone: bool = True):
    """(bit_dtype, gchunk) that fits the VMEM budget, or None.

    Since the budget was raised to the measured physical ceiling (96 MiB),
    the f32 / 128-row-chunk configuration — the measured-fastest one, and
    the one every committed on-chip number was taken with — fits whenever
    anything does, so it is the single auto-selected tier.  Historical
    fallbacks (64-row chunks, bf16 bit planes) were only ever reachable
    under the old 16 MiB default cap; bf16 in fact *added* ~2.5 MB of
    conversion/tiling temporaries at N=1024 (19.0 vs 16.5 MB scoped) and
    survives only as an explicit `bit_dtype` option.
    """

    if (
        kernel_vmem_bytes(
            N, K, M, BT, jnp.float32, lazy_clone=lazy_clone, gchunk=128
        )
        <= VMEM_BUDGET_BYTES
    ):
        return jnp.float32, 128
    return None


def kernel_fit_dtype(
    N: int, K: int, M: int, BT: int = 128, *, lazy_clone: bool = True
):
    """f32 if the shape fits the VMEM budget (the only auto tier — see
    `_fit_config`), or None (route to the XLA decoder).  Under lazy
    clone, f32/128-row-chunks fits through P(1024,512) M=8 and beyond."""

    cfg = _fit_config(N, K, M, BT, lazy_clone=lazy_clone)
    return None if cfg is None else cfg[0]


def _default_block(M: int, B: int, N: int = 128, K: int = 64) -> int:
    """Measured-best batch tile per list size (v5e, device-time resolution
    at 64k frames/call — dispatch-overhead-dominated 8k-batch timings had
    favored wider tiles).  All numbers below are N=128 kernel-only
    decode rates from the 2026-08-19 BT sweep (`tools/ab_kernel.py`,
    min-of-interleaved-rounds; bench.py's end-to-end sim+decode figure
    and the KERNEL.md table are separate regimes — tunnel noise is
    ±10-20%, so cross-regime numbers differ by up to that much):
    M≤2 is phase-loop bound and profits from wider tiles (M=1: 12.7M/s
    at BT=512 vs 9.3M at 128; M=2: 9.2M vs 8.1M); M≥4 is clone/sort
    bound and wants BT=128 (M=4: 5.56M/s at 128 vs 4.50M at 256; M=8:
    2.71M vs 1.52M).  Re-confirmed under lazy clone at N=512/1024
    (2026-08-21: BT=256 is 1.76-2.2× WORSE at M=8, M=4 a wash).  Tiles
    that would exceed the VMEM budget at this (N, K, M) are skipped."""

    prefs = {1: (512, 256, 128), 2: (512, 256, 128)}.get(M, (128,))
    for bt in prefs:
        if B % bt == 0 and kernel_fit_dtype(N, K, M, bt) is not None:
            return bt
    return 128


def decode_scl_pallas(
    llr: jnp.ndarray,
    info_set,
    M: int,
    crc: Optional[str] = None,
    *,
    force_info_bits: Optional[jnp.ndarray] = None,
    block_batch: Optional[int] = None,
    interpret: bool = False,
    bit_dtype=None,
    packed_sort: Optional[bool] = None,
    pair_unroll: bool = True,
    loop_unroll: Optional[int] = None,
    full_unroll: Optional[bool] = None,
    lazy_clone: Optional[bool] = None,
    sigma_skip: bool = True,
) -> dict:
    """Fused-kernel SCL decode of a batch.

    lazy_clone (default on for M>1): survivors are never physically
    copied at forks.  Per-level path-origin maps σ compose at each fork
    and the few reads that cross fork boundaries gather through them —
    O(N log N) data movement instead of the fork-time clone-by-gather's
    O(N²) row-gathers (which measured 75% of decode time at N=512 M=8),
    and no in-place-permutation stack copies, so P(1024,512) M=8 fits
    VMEM at f32.  Results are bit-identical between modes.

    full_unroll (default: on when compiled at N≤128, off in interpret mode
    — interpret tracing is ~3× slower unrolled — and off for larger codes,
    where it measures no faster but compiles ~10× slower): statically
    unroll the N-phase loop — the schedule/frozen/liveness tables are
    compile-time constants, so every per-phase branch dispatch disappears
    (measured +6-9% for M≥2 over the pair-unrolled `fori_loop` at N=128;
    ~46 s first compile at M=8 vs ~8 s, amortized by the persistent
    compile cache).

    sigma_skip (default on): drop σ-gather trees that the schedule proves
    are identity — the g-update's left-bit read always (its store runs
    post-fork at the immediately preceding phase), the leaf-level g's
    parent read via even-fork materialization of the two level-(n−1) LLR
    rows, and (full-unroll mode) any read whose fork-interval table entry
    is clear.  Bit-identical to ``sigma_skip=False`` (the round-4
    behavior, kept for A/B benchmarking).

    bit_dtype: storage dtype of the partial-sum planes.  They hold 0/1
    values only, so ``jnp.bfloat16`` is numerically EXACT (decisions are
    bit-identical to f32) while halving the bit-plane clone-gather bytes.
    Default None = auto: always f32 (measured fastest; under lazy clone
    every supported shape incl. N=1024 M=8 fits the VMEM budget at f32 —
    bf16 is never auto-selected, it remains an explicit option).

    loop_unroll: phases per iteration of the (non-full-unroll) phase loop
    (power of two).  All but two dispatch points per block are static —
    see the kernel body.  Default (compiled): 32 for 128 < N < 2048; at
    N ≥ 2048 the dispatch overhead dominates and the measured optima are
    512 (M≥8) / 256 (M≤2) / 32 (M=4); interpret mode and N ≤ 128 keep
    the cheap-tracing pair unroll (2), or 1 when pair_unroll=False.

    llr: [B, N] (B must be a multiple of `block_batch`).  Returns
    {"best_path_bits" int8 [B, K], "best_path_info_llrs" f32 [B, K],
     "crc_pass" bool [B]} — the fast-path subset of `SCLResult` used by the
    simulation pipelines (full candidate lists live in `decode_scl_batch`).
    """

    if M & (M - 1):
        raise ValueError("kernel supports power-of-two list sizes")
    info_np = np.asarray(info_set)
    B, N = int(llr.shape[0]), int(llr.shape[1])
    K = int(info_np.size)
    if lazy_clone is None:
        lazy_clone = M > 1
    if block_batch is None:
        block_batch = _default_block(M, B, N, K)
    fit = _fit_config(N, K, M, block_batch, lazy_clone=lazy_clone)
    if bit_dtype is None:
        bit_dtype = jnp.float32 if fit is None else fit[0]
        gchunk = 128 if fit is None else fit[1]
    else:
        gchunk = (
            128
            if kernel_vmem_bytes(
                N, K, M, block_batch, bit_dtype,
                lazy_clone=lazy_clone, gchunk=128,
            ) <= VMEM_BUDGET_BYTES
            else 64
        )
    if packed_sort is None:
        # re-measured at device resolution post-lazy-clone (2026-08-21,
        # interleaved min-of-rounds, 65536 frames): packed wins only the
        # 16-row M=8 network (+1.3%); M=4 is a wash (0.990 — batcher
        # marginally ahead) and M=2 prefers batcher by 2.9%
        packed_sort = M >= 8
    if full_unroll is None:
        # lazy-clone-era A/B (2026-08-21, 65536 frames/call, interleaved
        # min-of-rounds): full unroll still wins at N=128, but at N=256 it
        # LOSES to the U=32 loop at M=8 (52.8 vs 50.0 ms) and is a wash at
        # M=4 (28.3 vs 28.4) — for a ~30× compile cost.  The loop form's
        # branch dispatch amortizes over the wider rows.
        full_unroll = not interpret and N <= 128
    if loop_unroll is None:
        # lazy-clone-era U-scan (2026-08-21, 65536 frames/call, min-of-
        # interleaved-rounds): throughput rises monotonically to U=32 at
        # every large shape — N=256 M=8 57.4/51.5/50.1 ms (U=2/8/32),
        # N=512 M=8 115.1/102.6/98.1, N=1024 M=8 205/199 (U=8/32), M=4
        # gains are larger still (N=512 65.2→48.5).  The fork-clone-era
        # "U=16 collapses at N=512" is obsolete — lazy clone shrank the
        # loop body ~4×, so the i-cache cliff moved out to U=64 (N=1024
        # M=8: 290 ms).  U=32 is within ~1% of best in every measured
        # cell and safely below the cliff.  Interpret mode keeps the
        # cheap-tracing pair unroll.
        # N=2048 breaks the U=32-everywhere rule (2026-08-21 round-4
        # sweep, 16384 frames/call, min-of-interleaved-rounds): the
        # per-iteration dispatch overhead dominates the 2048-phase loop,
        # and M=8 rises monotonically 52k→106k→131k→143k fps at
        # U=32/128/256/512 (recovering the expected ~2× cost per N
        # doubling vs N=1024's 324k), M≤2 peaks at U=256 (281k→666k fps),
        # while M=4 still prefers U=32 (335k vs 269k at U=256).
        if not pair_unroll:
            loop_unroll = 1
        elif interpret or N <= 128:
            loop_unroll = 2
        elif N >= 2048:
            loop_unroll = 32 if M == 4 else (512 if M >= 8 else 256)
        else:
            loop_unroll = 32
    if loop_unroll < 1 or (loop_unroll & (loop_unroll - 1)) or loop_unroll > N:
        raise ValueError("loop_unroll must be a power of two <= N")
    if B % block_batch:
        raise ValueError(f"batch {B} must be a multiple of block_batch {block_batch}")
    need = kernel_vmem_bytes(
        N, K, M, block_batch, bit_dtype, lazy_clone=lazy_clone, gchunk=gchunk
    )
    if not interpret and need > VMEM_BUDGET_BYTES:
        raise ValueError(
            f"SCL kernel state for N={N} K={K} M={M} block_batch={block_batch} "
            f"needs ~{need / 2**20:.1f} MB VMEM > budget "
            f"{VMEM_BUDGET_BYTES / 2**20:.1f} MB; use the XLA decoder "
            "(ops.scl.decode_scl_batch) or backend='auto' dispatch "
            "(ops.backend.make_scl_decoder), or reduce block_batch/M"
        )

    has_force = force_info_bits is not None
    run = _build_kernel_for(
        tuple(int(x) for x in info_np), N, M, crc, block_batch, interpret,
        jnp.dtype(bit_dtype).name, packed_sort, loop_unroll, full_unroll,
        has_force, lazy_clone, gchunk, sigma_skip,
    )
    llr_t = llr.T.astype(jnp.float32)  # [N, B]
    if has_force:
        forced_t = force_info_bits.T.astype(jnp.int32)
    else:
        forced_t = jnp.zeros((1, B), jnp.int32)  # 1-row dummy, never read
    bits_t, llrs_t, pass_t = run(llr_t, forced_t)
    return {
        "best_path_bits": bits_t.T.astype(jnp.int8),
        "best_path_info_llrs": llrs_t.T,
        "crc_pass": pass_t[0].astype(bool),
    }


def decode_scl_pallas_sharded(
    llr: jnp.ndarray,
    info_set,
    M: int,
    crc: Optional[str] = None,
    *,
    mesh,
    axis_name: str = "frames",
    force_info_bits: Optional[jnp.ndarray] = None,
    block_batch: int = 128,
    interpret: bool = False,
) -> dict:
    """Kernel decode over a device mesh: shard_map over the frame axis.

    Each device runs the fused kernel on its local batch shard; there is no
    cross-device communication inside the decode (frames are independent).
    `llr.shape[0]` must be divisible by mesh size × block_batch.
    """

    from jax.sharding import PartitionSpec as P

    n_dev = len(mesh.devices.flat)
    B = int(llr.shape[0])
    if B % (n_dev * block_batch):
        raise ValueError(
            f"batch {B} must be divisible by devices×block ({n_dev}×{block_batch})"
        )
    K = int(np.asarray(info_set).size)
    if force_info_bits is None:
        force_info_bits = jnp.full((B, K), -1, jnp.int8)

    def local(llr_l, forced_l):
        return decode_scl_pallas(
            llr_l, info_set, M, crc, force_info_bits=forced_l,
            block_batch=block_batch, interpret=interpret,
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None)),
        out_specs={
            "best_path_bits": P(axis_name, None),
            "best_path_info_llrs": P(axis_name, None),
            "crc_pass": P(axis_name),
        },
        check_vma=False,
    )(llr, force_info_bits)


__all__ = [
    "decode_scl_pallas",
    "decode_scl_pallas_sharded",
    "kernel_fit_dtype",
    "kernel_vmem_bytes",
    "VMEM_BUDGET_BYTES",
]
