"""Pallas TPU kernel: fused layered normalized min-sum LDPC decode.

Same semantics as `decode_nms.py` (reference `dl_scl_polar/nr/ldpc/
decode_nms.py`): layered NMS with the single shared min (no self-exclusion),
in-place LLR updates, per-iteration syndrome early stop.

TPU-native structure: for a lifted circulant graph, the Z rows of a
block-row touch, inside block-column c, exactly the Z llr entries
``cZ + (i + shift) mod Z`` — i.e. the block *rolled* by the shift.  So one
decoding layer is, per nonzero block, a sublane `pltpu.roll`, an extrinsic
subtract, a shared sign/min reduction, and a roll back — no gathers or
scatters at all.  The full max_iter loop runs in one kernel launch with the
LLR/message state resident in VMEM; early-stopped frames are frozen by a
per-lane `done` mask.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .basegraphs import BaseGraph


def _kernel_body(
    llr_ref,   # [n, BT] f32 in
    hard_ref,  # [n, BT] i32 out
    iters_ref, # [1, BT] i32 out
    ok_ref,    # [1, BT] i32 out
    llr_w,     # [n, BT] f32 scratch (working LLRs)
    msg_w,     # [m, BT] (shared) or [E_b·Z, BT] (self-exclude) f32 scratch
    state_w,   # [2, BT] f32 scratch: row 0 = done, row 1 = iters_used
    *,
    shifts: Tuple[Tuple[int, ...], ...],
    Z: int,
    max_iter: int,
    alpha: float,
    self_exclude: bool = False,
):
    mb = len(shifts)
    nb = len(shifts[0])
    n = nb * Z
    BT = llr_ref.shape[1]

    llr_w[...] = llr_ref[...]
    msg_w[...] = jnp.zeros_like(msg_w)
    state_w[...] = jnp.zeros_like(state_w)

    def blocks(r):
        return [(c, shifts[r][c]) for c in range(nb) if shifts[r][c] >= 0]

    # self-exclude keeps one message plane per base-graph EDGE: static
    # row offset of edge (r, c) into msg_w
    edge_off = {}
    off = 0
    for r in range(mb):
        for c, _ in blocks(r):
            edge_off[(r, c)] = off
            off += Z

    def syndrome_ok():
        # all-rows parity: XOR over each layer's rolled hard-decision blocks
        ok = None
        for r in range(mb):
            acc = None
            for c, s in blocks(r):
                h = (llr_w[c * Z : (c + 1) * Z, :] < 0.0).astype(jnp.float32)
                h = pltpu.roll(h, -s % Z, 0)
                acc = h if acc is None else acc + h
            par_ok = jnp.max(acc - 2.0 * jnp.floor(acc * 0.5), axis=0, keepdims=True) == 0.0
            ok = par_ok if ok is None else (ok & par_ok)
        return ok  # [1, BT] bool

    def body(it, _):
        done = state_w[0:1, :]  # [1, BT] (1.0 = frozen)
        for r in range(mb):
            exts = []
            mrows = []
            for c, s in blocks(r):
                x = llr_w[c * Z : (c + 1) * Z, :]
                o = edge_off[(r, c)] if self_exclude else r * Z
                mrow = msg_w[o : o + Z, :]
                ext = pltpu.roll(x, -s % Z, 0) - mrow
                exts.append(ext)
                mrows.append(mrow)
            sgn = None
            m1 = None  # elementwise smallest |ext| across the row's blocks
            m2 = None  # elementwise second-smallest (= m1 on ties)
            for ext in exts:
                es = jnp.sign(ext)
                ea = jnp.abs(ext)
                sgn = es if sgn is None else sgn * es
                if m1 is None:
                    m1 = ea
                elif m2 is None:
                    m2 = jnp.maximum(m1, ea)
                    m1 = jnp.minimum(m1, ea)
                else:
                    m2 = jnp.minimum(m2, jnp.maximum(m1, ea))
                    m1 = jnp.minimum(m1, ea)
            for ext, mrow, (c, s) in zip(exts, mrows, blocks(r)):
                if self_exclude and m2 is not None:
                    # exclude the edge itself: the argmin edge sees m2, the
                    # rest m1.  On ties m2 == m1, exactly the
                    # leave-one-out min, so |ext| == m1 is a safe test.
                    ea = jnp.abs(ext)
                    update = (
                        alpha
                        * (sgn * jnp.sign(ext))
                        * jnp.where(ea == m1, m2, m1)
                    )
                else:
                    update = alpha * sgn * m1  # [Z, BT]
                new_vals = jnp.where(done > 0.0, ext + mrow, ext + update)
                llr_w[c * Z : (c + 1) * Z, :] = pltpu.roll(new_vals, s % Z, 0)
                o = edge_off[(r, c)] if self_exclude else r * Z
                if self_exclude:
                    msg_w[o : o + Z, :] = jnp.where(done > 0.0, mrow, update)
            if not self_exclude:
                msg_w[r * Z : (r + 1) * Z, :] = jnp.where(
                    done > 0.0, mrows[0], alpha * sgn * m1
                )

        ok_now = syndrome_ok()  # [1, BT]
        newly = jnp.where((done == 0.0) & ok_now, 1.0, 0.0)
        state_w[1:2, :] = state_w[1:2, :] + jnp.where(done > 0.0, 0.0, 1.0)
        state_w[0:1, :] = done + newly

    jax.lax.fori_loop(0, max_iter, body, None)

    hard_ref[...] = (llr_w[...] < 0.0).astype(jnp.int32)
    iters_ref[...] = state_w[1:2, :].astype(jnp.int32)
    ok_ref[...] = syndrome_ok().astype(jnp.int32)


@functools.lru_cache(maxsize=16)
def _build(
    shifts_key, Z: int, max_iter: int, alpha: float, BT: int, interpret: bool,
    self_exclude: bool = False,
):
    shifts = shifts_key
    nb = len(shifts[0])
    mb = len(shifts)
    n, m = nb * Z, mb * Z
    n_edges = sum(1 for row in shifts for v in row if v >= 0)
    msg_rows = n_edges * Z if self_exclude else m

    kernel = functools.partial(
        _kernel_body, shifts=shifts, Z=Z, max_iter=max_iter, alpha=alpha,
        self_exclude=self_exclude,
    )

    def run(llr_t):
        B = llr_t.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(B // BT,),
            in_specs=[pl.BlockSpec((n, BT), lambda i: (0, i))],
            out_specs=[
                pl.BlockSpec((n, BT), lambda i: (0, i)),
                pl.BlockSpec((1, BT), lambda i: (0, i)),
                pl.BlockSpec((1, BT), lambda i: (0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, B), jnp.int32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((n, BT), jnp.float32),
                pltpu.VMEM((msg_rows, BT), jnp.float32),
                pltpu.VMEM((2, BT), jnp.float32),
            ],
            interpret=interpret,
        )(llr_t)

    return run


def decode_ldpc_nms_pallas(
    llr: jnp.ndarray,
    base_graph: BaseGraph,
    Z: int,
    max_iter: int = 20,
    alpha: float = 0.8,
    *,
    self_exclude: bool = False,
    block_batch: int = 128,
    interpret: bool = False,
) -> dict:
    """Fused-kernel layered NMS.  llr: [B, n] → same dict as the XLA path.

    self_exclude=True is textbook two-min NMS (bit-identical to
    `decode_ldpc_nms_batch(..., self_exclude=True)`): one message plane per
    base-graph edge instead of per block-row, leave-one-out mins via an
    elementwise (min1, min2) reduction across the row's rolled blocks."""

    B = int(llr.shape[0])
    if B % block_batch:
        raise ValueError(f"batch {B} must be a multiple of block_batch {block_batch}")
    shifts_key = tuple(tuple(int(v) for v in row) for row in np.asarray(base_graph.shifts))
    if self_exclude:
        # A lifted row's degree equals its base row's block count; the
        # leave-one-out (min1, min2) reduction is undefined on degree-1
        # rows (the XLA path raises for the same reason).
        min_blocks = min(sum(1 for v in row if v >= 0) for row in shifts_key)
        if min_blocks < 2:
            raise ValueError(
                "self_exclude=True needs every check row to have degree >= 2 "
                f"(base graph has a {min_blocks}-block row)"
            )
    run = _build(
        shifts_key, Z, max_iter, float(alpha), block_batch, interpret,
        self_exclude,
    )
    hard_t, iters_t, ok_t = run(llr.T.astype(jnp.float32))
    return {
        "hard": hard_t.T.astype(jnp.int8),
        "iters_used": iters_t[0],
        "parity_ok": ok_t[0].astype(bool),
    }


__all__ = ["decode_ldpc_nms_pallas"]
