"""Layered normalized min-sum LDPC decoding — batched, layer-parallel.

Reference semantics: `dl_scl_polar/nr/ldpc/decode_nms.py` — strictly
sequential row updates; per row the extrinsic is `llr[idx] − msg[r, idx]`,
the update is `α·∏sign·min|·|` with a *single shared min for all edges* (no
self-exclusion / second-min — reference simplification preserved exactly),
written back in place; hard decision + syndrome early stop per iteration.

TPU-native re-design: rows are grouped host-side into *layers* of
column-disjoint rows by a greedy in-order pass.  Rows within a layer touch
disjoint LLR positions, so updating them in parallel is bit-identical to
the reference's sequential order.  For the lifted circulant graphs each
block-row is one layer, so an iteration is ~3 vectorized gather/update
steps instead of mZ Python-loop rows.  Early stopping becomes a per-frame
`done` mask inside a `lax.fori_loop`; `iters_used` reproduces the
reference's accounting.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _layers_from_h(H_key: Tuple[bytes, int, int]) -> Tuple[np.ndarray, np.ndarray, List[np.ndarray]]:
    H = np.frombuffer(H_key[0], dtype=np.int8).reshape(H_key[1], H_key[2])
    m, n = H.shape
    row_cols = [np.where(H[r] == 1)[0] for r in range(m)]
    deg_max = max((c.size for c in row_cols), default=0)

    # Greedy in-order grouping into column-disjoint layers: preserves the
    # reference's sequential-update semantics exactly.
    layers: List[List[int]] = []
    layer_cols: List[set] = []
    for r in range(m):
        cols = set(row_cols[r].tolist())
        if layers and not (cols & layer_cols[-1]):
            layers[-1].append(r)
            layer_cols[-1] |= cols
        else:
            layers.append([r])
            layer_cols.append(set(cols))

    # Padded edge tables: sentinel column index n marks padding.
    idx = np.full((m, deg_max), n, dtype=np.int32)
    for r in range(m):
        idx[r, : row_cols[r].size] = row_cols[r]
    pad = idx == n
    return idx, pad, [np.asarray(l, dtype=np.int32) for l in layers]


@functools.lru_cache(maxsize=None)
def _prep(H_bytes: bytes, m: int, n: int):
    return _layers_from_h((H_bytes, m, n))


def decode_ldpc_nms_batch(
    llr: jnp.ndarray,
    H: np.ndarray,
    max_iter: int = 20,
    alpha: float = 0.8,
    early_stop: bool = True,
    *,
    self_exclude: bool = False,
    dtype=jnp.float32,
) -> dict:
    """llr [B, n] → {"hard" [B, n] int8, "iters_used" [B], "parity_ok" [B]}.

    self_exclude=False (default) preserves the reference's simplification —
    one shared α·∏sign·min message for every edge of a row, *including* the
    edge's own contribution (`dl_scl_polar/nr/ldpc/decode_nms.py`).  That
    self-reinforcement cripples the decoder (the demo graph's FER barely
    leaves 1.0 below ~10 dB — the reference's own published curves show the
    same).  self_exclude=True is textbook layered NMS: per-edge extrinsic
    excluding the edge itself via a two-min (min1/min2) reduction, the
    algorithm a real comparison arm needs (used by `--nms_exact` sweeps).
    """

    H = (np.asarray(H) % 2).astype(np.int8)
    m, n = H.shape
    if int(llr.shape[-1]) != n:
        raise ValueError("llr length mismatch")
    B = int(llr.shape[0])
    idx_np, pad_np, layers = _prep(H.tobytes(), m, n)
    deg_max = idx_np.shape[1]
    if self_exclude and m:
        min_deg = int(np.min((~pad_np).sum(axis=1)))
        if min_deg < 2:
            raise ValueError(
                "self_exclude=True needs every check row to have degree >= 2 "
                f"(leave-one-out min is undefined on degree-{min_deg} rows)"
            )
    Hd = jnp.asarray(H, dtype)

    def one_iteration(llr_x, msg):
        # llr_x: [B, n+1] (sentinel col n); msg: [B, m, deg] under
        # self_exclude, else the scalar-per-row [B, m] (every real edge of
        # a row carries the same shared-min value — materializing it
        # per-edge would deg_max-fold the state for nothing)
        for rows in layers:
            cols = idx_np[rows]  # [L, deg] static
            pad = jnp.asarray(pad_np[rows])  # [L, deg]
            prev = msg[:, rows] if self_exclude else msg[:, rows, None]
            ext = llr_x[:, cols] - prev  # [B, L, deg]
            sgn = jnp.where(pad[None], 1.0, jnp.sign(ext))
            mag = jnp.where(pad[None], jnp.inf, jnp.abs(ext))
            sprod = jnp.prod(sgn, axis=-1, keepdims=True)  # [B, L, 1]
            if self_exclude:
                amin = jnp.argmin(mag, axis=-1, keepdims=True)
                is_min = jnp.arange(deg_max)[None, None] == amin
                min1 = jnp.min(mag, axis=-1, keepdims=True)
                min2 = jnp.min(
                    jnp.where(is_min, jnp.inf, mag), axis=-1, keepdims=True
                )
                # per-edge: sign product / own sign, min over the others
                update = alpha * (sprod * sgn) * jnp.where(is_min, min2, min1)
                msg = msg.at[:, rows].set(jnp.where(pad[None], 0.0, update))
            else:
                row_upd = alpha * sprod * jnp.min(mag, axis=-1, keepdims=True)
                update = row_upd * jnp.ones_like(ext)
                msg = msg.at[:, rows].set(row_upd[..., 0])
            llr_x = llr_x.at[:, cols].set(ext + update)
        return llr_x, msg

    def syndrome_ok(llr_x):
        hard = (llr_x[:, :n] < 0).astype(dtype)
        syn = jnp.mod(hard @ Hd.T, 2.0)
        return jnp.all(syn == 0.0, axis=-1)

    def body(it, state):
        llr_x, msg, done, iters_used = state
        new_llr, new_msg = one_iteration(llr_x, msg)
        llr_x = jnp.where(done[:, None], llr_x, new_llr)
        mask = done[:, None, None] if self_exclude else done[:, None]
        msg = jnp.where(mask, msg, new_msg)
        ok_now = syndrome_ok(llr_x)
        newly = ~done & ok_now if early_stop else jnp.zeros_like(done)
        iters_used = jnp.where(newly, it + 1, iters_used)
        done = done | newly
        return llr_x, msg, done, iters_used

    llr_x = jnp.concatenate(
        [llr.astype(dtype), jnp.zeros((B, 1), dtype)], axis=-1
    )
    msg_shape = (B, m, deg_max) if self_exclude else (B, m)
    state = (
        llr_x,
        jnp.zeros(msg_shape, dtype),
        jnp.zeros((B,), bool),
        jnp.full((B,), max_iter, jnp.int32),
    )
    llr_x, msg, done, iters_used = jax.lax.fori_loop(0, max_iter, body, state)

    hard = (llr_x[:, :n] < 0).astype(jnp.int8)
    return {"hard": hard, "iters_used": iters_used, "parity_ok": syndrome_ok(llr_x)}


def decode_ldpc_nms(
    llr: np.ndarray,
    H: np.ndarray,
    max_iter: int = 20,
    alpha: float = 0.8,
    early_stop: bool = True,
    self_exclude: bool = False,
) -> dict:
    """Scalar reference-compatible API (1D llr)."""

    llr = np.asarray(llr, dtype=np.float64)
    if llr.ndim != 1:
        raise ValueError("llr must be 1D")
    res = decode_ldpc_nms_batch(
        jnp.asarray(llr)[None], H, max_iter=max_iter, alpha=alpha,
        early_stop=early_stop, self_exclude=self_exclude, dtype=jnp.float64,
    )
    return {
        "hard": np.asarray(res["hard"][0], dtype=np.int8),
        "iters_used": int(res["iters_used"][0]),
        "parity_ok": bool(res["parity_ok"][0]),
    }


__all__ = ["decode_ldpc_nms", "decode_ldpc_nms_batch"]
