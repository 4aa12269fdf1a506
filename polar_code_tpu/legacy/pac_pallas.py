"""Pallas TPU kernel: fused PAC list decode (legacy hot core).

Same semantics as `legacy/pac.py::pac_list_decode_batch` (reference
`polar_code.py` decoder): bit-reversed leaf order, hard-decision path metric
(penalize when the convolved edge bit disagrees with the channel hard
decision), [good×L, bad×L] stable candidate layout, CRC-first-else-best
selection.

Kernel structure mirrors `ops/scl_pallas.py` (schedule-table-driven
`fori_loop`, σ-map lazy clone — fork-time clone-by-gather kept as
`lazy_clone=False` — Batcher network, trace backtracking) with three
deltas:

* the channel LLRs arrive bit-reversal-permuted (adjacent-pair butterfly ≡
  halves butterfly on permuted input),
* a per-path convolutional shift register ([L, mem, BT] in VMEM) supplies
  the edge bit; partial sums propagate edge (u-domain) bits.  The conv
  registers are always gathered physically at forks (mem ≲ 8 rows — far
  cheaper than a σ indirection on every `conv_base`),
* candidate metrics are `pm` (good branch: edge == hard) and `pm + |LLR|`
  (bad branch), so no transcendentals at all.

Lazy clone (default for L > 1, round 4 — same scheme as the SCL kernel's,
bit-identical to fork mode): per-level path-origin maps σ compose at each
fork (σ ← σ[parent]); the g-update's parent-LLR/stored-bit reads and the
combine chain's left-sibling reads gather through σ; level writes reset
their σ row to identity.  O(N log N) data movement instead of the fork
clone's O(N²) row-gathers.

Output bits are in decode (phase) order; the wrapper permutes them to the
ascending-u extraction order of the reference API.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.crc import check_matrix
from ..ops.scl_pallas import (
    _batcher_pairs,
    _index_bits,
    _packed_sort,
    _schedule_tables,
    _select_m,
)
from .rate_profile import bitreversed

_BIG = 3.0e38


def _kernel_body(
    # scalar prefetch: per-(phase, level) tables ride FLAT (1-D, indexed
    # phase*(n+1)+level — SMEM pads 2-D minor dims to 128); dummies under
    # full_unroll (schedule baked into the program)
    glevel_ref, store_ref, frozen_ref, infoidx_ref, llrlive_ref, bitlive_ref,
    # inputs
    llr_ref,   # [N, BT] bit-rev-permuted channel LLRs
    hc_ref,    # [deg, Kp] permuted CRC check matrix (dummy when unused)
    # outputs
    bits_ref,  # [Kp, BT] i32 best-path v bits in phase order
    pass_ref,  # [1, BT] i32
    # scratch
    state_ref,               # [L, 2(N−1), BT] f32 (llr rows ‖ edge-bit rows)
    pm_ref,                  # [L, BT] f32
    conv_ref,                # [L, mem, BT] f32 shift registers
    tidx_ref,                # [Kp, L, BT] f32 trace 2·parent+v packed
                             # (dim-0 dynamic indexing stays slab-aligned)
    cbits_ref,               # [Kp, L, BT] f32 reconstructed candidates
    curidx_ref,              # [L, BT] f32
    sig_ref,                 # [L, 2n-1, BT] f32 lazy-clone path-origin σ
                             # maps (dummy [1, 1, BT] in fork mode / L=1)
    *,
    N: int, L: int, Kp: int, mem: int, taps: Tuple[int, ...], use_crc: bool,
    packed_sort: bool = False, pair_unroll: bool = True, static_tables=None,
    lazy_clone: bool = True,
):
    n = int(math.log2(N))
    BT = llr_ref.shape[1]
    off = {}
    o = 0
    for level in range(1, n + 1):
        off[level] = o
        o += N >> level
    SB = N - 1

    def lrows(level):
        return slice(off[level], off[level] + (N >> level))

    def brows(level):
        return slice(SB + off[level], SB + off[level] + (N >> level))

    state_ref[...] = jnp.zeros_like(state_ref)
    conv_ref[...] = jnp.zeros_like(conv_ref)
    slot = jax.lax.broadcasted_iota(jnp.int32, (L, BT), 0)
    pm_ref[...] = jnp.where(slot == 0, 0.0, _BIG)

    sort_pairs_2l = _batcher_pairs(2 * L)
    sort_pairs_l = _batcher_pairs(L) if L > 1 else []

    # --- lazy clone: per-level path-origin maps σ (ops/scl_pallas.py) ---
    # One σ row per LLR level 1..n−1 and per partial-sum level 1..n;
    # LLR level n is consumed at its own phase's leaf and needs no row.
    lazy = lazy_clone and L > 1
    n_sig = 2 * n - 1

    def sli(level):  # σ row of LLR level (1..n−1)
        return level - 1

    def sbi(level):  # σ row of partial-sum level (1..n)
        return (n - 1) + (level - 1)

    if lazy:
        sig_ref[...] = jax.lax.broadcasted_iota(
            jnp.int32, (L, n_sig, BT), 0
        ).astype(jnp.float32)

    def sig_reset(row):
        if lazy:
            sig_ref[:, row : row + 1, :] = jax.lax.broadcasted_iota(
                jnp.int32, (L, 1, BT), 0
            ).astype(jnp.float32)

    def sig_gather(rows, row):
        """rows: [L, span, BT] → logical per-slot view rows[σ[m]]."""

        if not lazy:
            return rows
        srcs = [rows[p] for p in range(L)]
        outs = []
        for m in range(L):
            vals = srcs
            for cond in _index_bits(sig_ref[m, row : row + 1, :], L):
                vals = [
                    jnp.where(cond, vals[2 * j + 1], vals[2 * j])
                    for j in range(len(vals) // 2)
                ]
            outs.append(vals[0])
        return jnp.stack(outs, axis=0)

    def conv_base():
        # parity of state · gen[1:] — edge bit for v = 0
        acc = None
        for t, g in enumerate(taps):
            if g == 1:
                row = conv_ref[:, t, :]
                acc = row if acc is None else acc + row
        if acc is None:
            return jnp.zeros((L, BT), jnp.float32)
        return acc - 2.0 * jnp.floor(acc * 0.5)

    def conv_shift(v_bits):
        # state ← [v, state[:-1]]
        if mem == 0:
            return
        old = conv_ref[:, : mem - 1, :] if mem > 1 else None
        if old is not None:
            shifted = jnp.concatenate([v_bits[:, None, :], old], axis=1)
        else:
            shifted = v_bits[:, None, :]
        conv_ref[...] = shifted

    def _parent_halves(level, g_read=False):
        # g_read: the g-update at the top of a phase's descent is the one
        # LLR read that can cross fork boundaries — it gathers through σ
        # in lazy mode.  f-reads consume rows written earlier in the same
        # phase and never need it.
        half = N >> level
        if level == 1:
            return llr_ref[:half, :], llr_ref[half : 2 * half, :]
        parent = state_ref[:, lrows(level - 1), :]
        if g_read:
            parent = sig_gather(parent, sli(level - 1))
        return parent[:, :half, :], parent[:, half:, :]

    def _apply_f(level):
        a, b = _parent_halves(level)
        f = jnp.sign(a) * jnp.sign(b) * jnp.minimum(jnp.abs(a), jnp.abs(b))
        if f.ndim == 2:
            f = jnp.broadcast_to(f, (L, N >> level, BT))
        state_ref[:, lrows(level), :] = f
        if level < n:
            sig_reset(sli(level))

    def _apply_g(level):
        a, b = _parent_halves(level, g_read=True)
        c = sig_gather(state_ref[:, brows(level), :], sbi(level))
        state_ref[:, lrows(level), :] = b + (1.0 - 2.0 * c) * a
        if level < n:
            sig_reset(sli(level))

    def combine_store(cur0, s):
        cur = cur0
        for level in range(n, s, -1):
            left = sig_gather(state_ref[:, brows(level), :], sbi(level))
            xor = left + cur - 2.0 * left * cur
            cur = jnp.concatenate([xor, cur], axis=1)
        state_ref[:, brows(s), :] = cur
        sig_reset(sbi(s))

    def propagate(phase, cur0, smax=None):
        for s in range((n if smax is None else smax), 0, -1):
            @pl.when(store_ref[phase * (n + 1) + s] == 1)
            def _(s=s):
                combine_store(cur0, s)

    def llr_update_branchy(phase, gmax):
        gl = glevel_ref[phase]

        @pl.when(gl == 0)
        def _():
            for level in range(1, n + 1):
                _apply_f(level)

        for g_level in range(1, gmax + 1):
            @pl.when(gl == g_level)
            def _(g_level=g_level):
                _apply_g(g_level)
                for level in range(g_level + 1, n + 1):
                    _apply_f(level)

    def frozen_leaf(leaf, hard, base, store_fn):
        pen = jnp.where(base != hard, jnp.abs(leaf), 0.0)
        pm_ref[...] = pm_ref[...] + pen
        conv_shift(jnp.zeros((L, BT), jnp.float32))
        store_fn(base[:, None, :])

    def info_leaf(phase, i, leaf, hard, base, store_fn, live_static=None):
        v_good = base + hard - 2.0 * base * hard  # XOR
        pen = jnp.abs(leaf)
        if packed_sort:
            # candidates [good×L | bad×L]; creation index == row, so the
            # packed rows need no reordering
            pm2 = jnp.concatenate([pm_ref[...], pm_ref[...] + pen], axis=0)
            idx2 = jax.lax.broadcasted_iota(jnp.int32, (2 * L, BT), 0).astype(
                jnp.float32
            )
            pm_s, idx_s = _packed_sort(pm2, idx2)
            idx_top = idx_s[:L, :]
            bad_a = jnp.where(idx_top >= float(L), 1.0, 0.0)
            par_a = idx_top - float(L) * bad_a
            parents = [par_a[m : m + 1, :] for m in range(L)]
            badflags = [bad_a[m : m + 1, :] for m in range(L)]
            new_pm = pm_s[:L, :]
        else:
            pmc = [pm_ref[p : p + 1, :] for p in range(L)]
            pmc += [pm_ref[p : p + 1, :] + pen[p : p + 1, :] for p in range(L)]
            idxs = [jnp.full((1, BT), float(c), jnp.float32) for c in range(2 * L)]
            for ia, ib in sort_pairs_2l:
                swap = (pmc[ia] > pmc[ib]) | ((pmc[ia] == pmc[ib]) & (idxs[ia] > idxs[ib]))
                pa, pb = pmc[ia], pmc[ib]
                xa, xb = idxs[ia], idxs[ib]
                pmc[ia] = jnp.where(swap, pb, pa)
                pmc[ib] = jnp.where(swap, pa, pb)
                idxs[ia] = jnp.where(swap, xb, xa)
                idxs[ib] = jnp.where(swap, xa, xb)

            parents = []
            badflags = []
            for m in range(L):
                is_bad = jnp.where(idxs[m] >= float(L), 1.0, 0.0)
                parents.append(idxs[m] - float(L) * is_bad)
                badflags.append(is_bad)
            new_pm = jnp.concatenate(pmc[:L], axis=0)

        # Binary select tree per output path (see ops/scl_pallas.py):
        # L−1 full-width selects instead of L selects + L adds, written
        # straight back in place.  L=1 skips (parent is always slot 0).
        parent_bits = [_index_bits(parents[m], L) for m in range(L)]

        def tree_gather(srcs):
            outs = []
            for m in range(L):
                vals = srcs
                for cond in parent_bits[m]:
                    vals = [
                        jnp.where(cond, vals[2 * j + 1], vals[2 * j])
                        for j in range(len(vals) // 2)
                    ]
                outs.append(vals[0])
            return outs

        def gather_rows(r0, r1):
            if L == 1:
                return
            outs = tree_gather([state_ref[p, r0:r1, :] for p in range(L)])
            state_ref[:, r0:r1, :] = jnp.stack(outs, axis=0)

        if lazy:
            # σ ← σ[parent]: one select-tree pass over the whole
            # [L, 2n−1, BT] map block — the entire per-fork clone cost
            outs = tree_gather([sig_ref[p] for p in range(L)])
            sig_ref[...] = jnp.stack(outs, axis=0)
        elif live_static is not None:
            for r0, r1 in live_static:  # statically-merged live row spans
                gather_rows(r0, r1)
        else:
            cond_levels = [l for l in range(1, n + 1) if (N >> l) >= 16]
            for level in cond_levels:
                @pl.when(llrlive_ref[phase * (n + 1) + level] == 1)
                def _(level=level):
                    gather_rows(off[level], off[level] + (N >> level))

                @pl.when(bitlive_ref[phase * (n + 1) + level] == 1)
                def _(level=level):
                    gather_rows(SB + off[level], SB + off[level] + (N >> level))
            tail = cond_levels[-1] + 1 if cond_levels else 1
            if tail <= n:
                gather_rows(off[tail], N - 1)
                gather_rows(SB + off[tail], SB + N - 1)

        # gather conv state and pm; compute per-path decisions
        if L > 1:
            outs = tree_gather([conv_ref[p] for p in range(L)])
            conv_ref[...] = jnp.stack(outs, axis=0)
        pm_ref[...] = new_pm

        vg_rows = []
        base_rows = []
        for m in range(L):
            vg_rows.append(_select_m(v_good, parents[m]))
            base_rows.append(_select_m(base, parents[m]))
        v_bits = []
        edges = []
        for m in range(L):
            v = vg_rows[m] + badflags[m] - 2.0 * vg_rows[m] * badflags[m]
            v_bits.append(v)
            edges.append(base_rows[m] + v - 2.0 * base_rows[m] * v)

        # parent and v-bit pack losslessly as 2p+v ∈ [0, 2L) in f32
        tidx_ref[pl.ds(i, 1)] = (
            2.0 * jnp.concatenate(parents, axis=0) + jnp.concatenate(v_bits, axis=0)
        )[None]

        conv_shift(jnp.concatenate(v_bits, axis=0))
        store_fn(jnp.concatenate(edges, axis=0)[:, None, :])

    def leaf_step(phase, store_fn):
        leaf = state_ref[:, off[n] : off[n] + 1, :][:, 0, :]  # [L, BT]
        hard = jnp.where(leaf < 0.0, 1.0, 0.0)
        base = conv_base()
        fz = frozen_ref[phase]

        @pl.when(fz == 1)
        def _():
            frozen_leaf(leaf, hard, base, store_fn)

        @pl.when(fz == 0)
        def _():
            info_leaf(phase, infoidx_ref[phase], leaf, hard, base, store_fn)

    def store_even(cur0):
        state_ref[:, brows(n), :] = cur0
        sig_reset(sbi(n))

    if static_tables is not None:
        # Fully-unrolled phase loop (see ops/scl_pallas.py): the schedule,
        # frozen mask, info indices, and liveness are compile-time
        # constants — zero per-phase branch dispatch.
        stat_frozen, stat_infoidx, stat_glevel, stat_store, stat_llr_live, stat_bit_live = static_tables

        def static_spans(llr_row, bit_row):
            spans = []
            for base_off, row in ((0, llr_row), (SB, bit_row)):
                for level in range(1, n + 1):
                    if row[level]:
                        r0 = base_off + off[level]
                        r1 = r0 + (N >> level)
                        if spans and spans[-1][1] == r0:
                            spans[-1] = (spans[-1][0], r1)
                        else:
                            spans.append((r0, r1))
            return spans

        for phase in range(N):
            gl = int(stat_glevel[phase])
            if gl > 0:
                _apply_g(gl)
            for level in range(gl + 1, n + 1):
                _apply_f(level)

            s_lvls = [s for s in range(1, n + 1) if stat_store[phase, s]]
            s = s_lvls[0] if s_lvls else None

            def store_fn(cur0, s=s):
                if s is None:
                    return
                combine_store(cur0, s)

            leaf = state_ref[:, off[n] : off[n] + 1, :][:, 0, :]
            hard = jnp.where(leaf < 0.0, 1.0, 0.0)
            base = conv_base()
            if stat_frozen[phase]:
                frozen_leaf(leaf, hard, base, store_fn)
            else:
                spans = static_spans(stat_llr_live[phase], stat_bit_live[phase])
                info_leaf(
                    phase, int(stat_infoidx[phase]), leaf, hard, base,
                    store_fn, spans,
                )
    elif pair_unroll:
        # (even, odd) phases per iteration — see ops/scl_pallas.py: even
        # phases store partial sums directly at the leaf level, odd phases'
        # LLR update is an unconditional g at the leaf.
        def pair_body(t, _):
            p0 = 2 * t
            p1 = p0 + 1
            llr_update_branchy(p0, n - 1)
            leaf_step(p0, store_even)
            _apply_g(n)
            leaf_step(p1, lambda cur0: propagate(p1, cur0, smax=n - 1))

        jax.lax.fori_loop(0, N // 2, pair_body, None)
    else:
        def phase_body(phase, _):
            llr_update_branchy(phase, n)
            leaf_step(phase, lambda cur0: propagate(phase, cur0))

        jax.lax.fori_loop(0, N, phase_body, None)

    # final stable sort, backtrack, CRC selection
    if packed_sort:
        fpm_a = pm_ref[...]
        fidx_a = jax.lax.broadcasted_iota(jnp.int32, (L, BT), 0).astype(jnp.float32)
        if L > 1:
            fpm_a, fidx_a = _packed_sort(fpm_a, fidx_a)
        fpm = [fpm_a[m : m + 1, :] for m in range(L)]
        curidx_ref[...] = fidx_a
    else:
        fpm = [pm_ref[m : m + 1, :] for m in range(L)]
        fidx = [jnp.full((1, BT), float(m), jnp.float32) for m in range(L)]
        for ia, ib in sort_pairs_l:
            swap = (fpm[ia] > fpm[ib]) | ((fpm[ia] == fpm[ib]) & (fidx[ia] > fidx[ib]))
            pa, pb = fpm[ia], fpm[ib]
            xa, xb = fidx[ia], fidx[ib]
            fpm[ia] = jnp.where(swap, pb, pa)
            fpm[ib] = jnp.where(swap, pa, pb)
            fidx[ia] = jnp.where(swap, xb, xa)
            fidx[ib] = jnp.where(swap, xa, xb)

        curidx_ref[...] = jnp.concatenate(fidx, axis=0)

    def bt_body(t, _):
        i = Kp - 1 - t
        tx = tidx_ref[pl.ds(i, 1)][0]  # [L, BT] packed 2p+v
        newcur = []
        brow = []
        for r in range(L):
            ci = curidx_ref[r : r + 1, :]
            x = _select_m(tx, ci)
            p = jnp.floor(x * 0.5)
            brow.append(x - 2.0 * p)
            newcur.append(p)
        cbits_ref[pl.ds(i, 1)] = jnp.concatenate(brow, axis=0)[None]
        curidx_ref[...] = jnp.concatenate(newcur, axis=0)

    jax.lax.fori_loop(0, Kp, bt_body, None)

    best = cbits_ref[:, 0, :]
    done = jnp.zeros((1, BT), jnp.bool_)
    if use_crc:
        Hc = hc_ref[...]
        for r in range(L):
            cand = cbits_ref[:, r, :]
            syn = jax.lax.dot_general(
                Hc, cand, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            syn = syn - 2.0 * jnp.floor(syn * 0.5)
            ok = (jnp.max(syn, axis=0, keepdims=True) == 0.0) & (fpm[r] < _BIG)
            take = ok & jnp.logical_not(done)
            best = jnp.where(take, cand, best)
            done = done | ok

    bits_ref[...] = best.astype(jnp.int32)
    pass_ref[...] = done.astype(jnp.int32)


@functools.lru_cache(maxsize=16)
def _build(mask_key, gen_key, L: int, crc_len: int, crc_poly: int, BT: int, interpret: bool,
           packed_sort: bool = False, pair_unroll: bool = True,
           full_unroll: bool = True, lazy_clone: bool = True):
    mask = np.asarray(mask_key, dtype=np.int64)
    gen = list(gen_key)
    mem = len(gen) - 1
    N = mask.size
    n = int(math.log2(N))
    perm = np.array([bitreversed(j, n) for j in range(N)])
    mask_rev = mask[perm]
    info_phases = np.where(mask_rev == 1)[0]
    Kp = int(info_phases.size)
    _, store, frozen, infoidx, llr_live, bit_live, glevel, _, _ = _schedule_tables(
        N, info_phases
    )

    # phase-order → ascending-u extraction order
    u_of_phase = perm[info_phases]
    out_order = np.argsort(u_of_phase)  # extracted[k] = bits_phase[out_order[k]]
    if crc_len > 0:
        full_poly = hex((1 << crc_len) | crc_poly)
        Hc = np.asarray(check_matrix(full_poly, Kp), np.float32)
        # permute check-matrix columns so it applies to phase-order bits:
        # extraction-order bit k lives at phase-order row out_order[k]
        Hc_perm = np.zeros_like(Hc)
        Hc_perm[:, out_order] = Hc
    else:
        Hc_perm = np.zeros((1, 1), np.float32)

    static_tables = (
        (frozen, infoidx, glevel, store, llr_live, bit_live) if full_unroll else None
    )
    kernel = functools.partial(
        _kernel_body, N=N, L=L, Kp=Kp, mem=mem,
        taps=tuple(gen[1:]), use_crc=crc_len > 0,
        packed_sort=packed_sort, pair_unroll=pair_unroll,
        static_tables=static_tables, lazy_clone=lazy_clone,
    )
    dummy = np.zeros(1, np.int32)
    if full_unroll:
        prefetch = (dummy,) * 6
    else:
        # liveness tables only drive the fork-time clone; lazy mode
        # replaces them with σ maps and prefetches dummies
        prefetch = (
            glevel, store.reshape(-1), frozen, infoidx,
            dummy if lazy_clone else llr_live.reshape(-1),
            dummy if lazy_clone else bit_live.reshape(-1),
        )
    n_state = 2 * (N - 1)
    lazy = lazy_clone and L > 1
    n_sig = max(2 * n - 1, 1)

    # raise the scoped-VMEM cap for shapes near the 16 MiB compiler
    # default (same pattern as ops/scl_pallas.py; the cap is a compiler
    # setting, not hardware)
    est = 4 * (
        L * n_state * BT                       # state planes
        + 2 * Kp * L * BT                      # tidx + cbits traces
        + (L * n_sig * BT if lazy else L * n_state * BT)  # σ / clone copies
        + 3 * L * BT + L * max(mem, 1) * BT
    )
    extra = {}
    if est > int(14 * 2**20):
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(2 * est, int(110 * 2**20))
        )

    def run(llr_perm_t):
        B = llr_perm_t.shape[1]
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(B // BT,),
            in_specs=[
                pl.BlockSpec((N, BT), lambda i, *_: (0, i)),
                pl.BlockSpec(Hc_perm.shape, lambda i, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((Kp, BT), lambda i, *_: (0, i)),
                pl.BlockSpec((1, BT), lambda i, *_: (0, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((L, n_state, BT), jnp.float32),
                pltpu.VMEM((L, BT), jnp.float32),
                pltpu.VMEM((L, max(mem, 1), BT), jnp.float32),
                pltpu.VMEM((Kp, L, BT), jnp.float32),  # tidx (2·parent+v)
                pltpu.VMEM((Kp, L, BT), jnp.float32),  # cbits
                pltpu.VMEM((L, BT), jnp.float32),
                # lazy-clone σ maps (dummy in fork mode / L=1)
                pltpu.VMEM((L, n_sig, BT) if lazy else (1, 1, BT), jnp.float32),
            ],
        )
        bits_t, pass_t = pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=[
                jax.ShapeDtypeStruct((Kp, B), jnp.int32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
            ],
            interpret=interpret,
            **extra,
        )(
            *(jnp.asarray(p) for p in prefetch),
            llr_perm_t, jnp.asarray(Hc_perm),
        )
        return bits_t, pass_t, out_order, perm

    return run


def pac_list_decode_pallas(
    llr: jnp.ndarray,
    mask: np.ndarray,
    gen,
    L: int,
    *,
    crc_len: int = 0,
    crc_poly: int = 0,
    block_batch: int = 128,
    interpret: bool = False,
    packed_sort: Optional[bool] = None,
    pair_unroll: bool = True,
    full_unroll: Optional[bool] = None,
    lazy_clone: Optional[bool] = None,
) -> dict:
    """Fused-kernel PAC list decode.  llr: [B, N].

    lazy_clone (default on for L > 1): σ-map path-origin composition at
    forks instead of the physical clone-by-gather — bit-identical results
    (see module docstring and ops/scl_pallas.py).

    Returns the fast-path subset: {"extracted" int8 [B, Kp] (ascending-u
    order, CRC-selected / best metric), "crc_pass" bool [B]}.
    """

    if L & (L - 1) or L > 8:
        raise ValueError("kernel supports power-of-two list sizes up to 8")
    gen = [int(g) for g in gen]
    if gen[0] != 1:
        raise ValueError("convolution generator must start with 1")
    B = int(llr.shape[0])
    if B % block_batch:
        raise ValueError(f"batch {B} must be a multiple of block_batch {block_batch}")
    mask = np.asarray(mask)
    N = int(mask.size)
    if packed_sort is None:
        packed_sort = L >= 4  # same measured threshold as the SCL kernel
    if full_unroll is None:
        # interpret tracing ~3× slower unrolled; at N ≥ 256 the loop form
        # amortizes dispatch over wider rows (device A/B 2026-08-21,
        # results/bench_pac.md) — same crossover as the SCL kernel
        full_unroll = not interpret and N <= 128
    if lazy_clone is None:
        # device A/B 2026-08-21 (65536 frames/call, min-of-interleaved-
        # rounds, results/bench_pac.md): lazy wins 1.30× at N=128 L=8 and
        # 1.50× at N=256 L=8, but LOSES 5-7% at N=64 L≥4 — the fully-
        # unrolled fork clone at N=64 is already minimal and the σ
        # indirection on every g-read outweighs it.  L=1 never clones.
        lazy_clone = L > 1 and N >= 128
    run = _build(
        tuple(int(x) for x in mask), tuple(gen), L, crc_len, crc_poly,
        block_batch, interpret, packed_sort, pair_unroll, full_unroll,
        lazy_clone,
    )
    n = int(math.log2(mask.size))
    perm = np.array([bitreversed(j, n) for j in range(mask.size)])
    llr_perm_t = llr[:, perm].T.astype(jnp.float32)
    bits_t, pass_t, out_order, _ = run(llr_perm_t)
    extracted = bits_t.T[:, out_order]  # → ascending-u extraction order
    return {
        "extracted": extracted.astype(jnp.int8),
        "crc_pass": pass_t[0].astype(bool),
    }


__all__ = ["pac_list_decode_pallas"]
