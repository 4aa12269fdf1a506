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
    msg_w,     # [m, BT] f32 scratch (per-row shared message)
    state_w,   # [2, BT] f32 scratch: row 0 = done, row 1 = iters_used
    *,
    shifts: Tuple[Tuple[int, ...], ...],
    Z: int,
    max_iter: int,
    alpha: float,
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
            mrow = msg_w[r * Z : (r + 1) * Z, :]
            for c, s in blocks(r):
                x = llr_w[c * Z : (c + 1) * Z, :]
                ext = pltpu.roll(x, -s % Z, 0) - mrow
                exts.append(ext)
            sgn = None
            mag = None
            for ext in exts:
                es = jnp.sign(ext)
                ea = jnp.abs(ext)
                sgn = es if sgn is None else sgn * es
                mag = ea if mag is None else jnp.minimum(mag, ea)
            update = alpha * sgn * mag  # [Z, BT]
            # frozen frames keep their llr/msg unchanged
            new_msg = jnp.where(done > 0.0, mrow, update)
            for ext, (c, s) in zip(exts, blocks(r)):
                new_vals = jnp.where(done > 0.0, ext + mrow, ext + update)
                llr_w[c * Z : (c + 1) * Z, :] = pltpu.roll(new_vals, s % Z, 0)
            msg_w[r * Z : (r + 1) * Z, :] = new_msg

        ok_now = syndrome_ok()  # [1, BT]
        newly = jnp.where((done == 0.0) & ok_now, 1.0, 0.0)
        state_w[1:2, :] = state_w[1:2, :] + jnp.where(done > 0.0, 0.0, 1.0)
        state_w[0:1, :] = done + newly

    jax.lax.fori_loop(0, max_iter, body, None)

    hard_ref[...] = (llr_w[...] < 0.0).astype(jnp.int32)
    iters_ref[...] = state_w[1:2, :].astype(jnp.int32)
    ok_ref[...] = syndrome_ok().astype(jnp.int32)


@functools.lru_cache(maxsize=16)
def _build(shifts_key, Z: int, max_iter: int, alpha: float, BT: int, interpret: bool):
    shifts = shifts_key
    nb = len(shifts[0])
    mb = len(shifts)
    n, m = nb * Z, mb * Z

    kernel = functools.partial(
        _kernel_body, shifts=shifts, Z=Z, max_iter=max_iter, alpha=alpha
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
                pltpu.VMEM((m, BT), jnp.float32),
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
    block_batch: int = 256,
    interpret: bool = False,
) -> dict:
    """Fused-kernel layered NMS.  llr: [B, n] → same dict as the XLA path."""

    B = int(llr.shape[0])
    if B % block_batch:
        raise ValueError(f"batch {B} must be a multiple of block_batch {block_batch}")
    shifts_key = tuple(tuple(int(v) for v in row) for row in np.asarray(base_graph.shifts))
    run = _build(shifts_key, Z, max_iter, float(alpha), block_batch, interpret)
    hard_t, iters_t, ok_t = run(llr.T.astype(jnp.float32))
    return {
        "hard": hard_t.T.astype(jnp.int8),
        "iters_used": iters_t[0],
        "parity_ok": ok_t[0].astype(bool),
    }


__all__ = ["decode_ldpc_nms_pallas"]
