"""Probe: how often is the fork's surviving-parent permutation the identity
across a whole 128-frame kernel tile?  If frequent, the kernel could skip the
clone-gather behind a scalar guard.

Replays the ops/scl.py fork schedule (same math) on CPU and reports, per
info phase and overall, the fraction of BT=128 tiles whose parent gather is
the identity (parents == [0..M-1] for every lane).

    python tools/probe_identity_forks.py --M 8 --snr_db 5 --frames 2048
"""

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=8)
    ap.add_argument("--snr_db", type=float, default=5.0)
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--bt", type=int, default=128)
    args = ap.parse_args()

    from polar_code_tpu import config
    from polar_code_tpu.channel import awgn_llr, bpsk, noise_var_coded
    from polar_code_tpu.ops.crc import attach_crc_batch
    from polar_code_tpu.ops.polar_transform import encode_batch
    from polar_code_tpu.ops.scl import f_minsum, g_update, _level_offsets, _softplus
    from polar_code_tpu.polar.construct import construct_info_set, frozen_mask
    from polar_code_tpu.utils.seeding import fold_key

    cfg = config.DEFAULTS
    N, K, M, B = cfg.N, cfg.K, args.M, args.frames
    info_set = construct_info_set(N, K)
    frozen = frozen_mask(N, np.asarray(info_set))
    off, state_len = _level_offsets(N)
    n = int(math.log2(N))

    key = jax.random.key(0)
    kp, kn = jax.random.split(fold_key(key, 7))
    payload = jax.random.bernoulli(kp, 0.5, (B, K - cfg.crc_bits)).astype(jnp.int8)
    msg = attach_crc_batch(payload, cfg.crc_poly)
    code = encode_batch(msg, info_set, N)
    llr = awgn_llr(kn, bpsk(code), noise_var_coded(args.snr_db, K, N))

    chan = llr.T.astype(jnp.float32)
    llr_st = jnp.zeros((M, state_len, B), jnp.float32)
    bit_st = jnp.zeros((M, state_len, B), jnp.int8)
    pm = jnp.full((M, B), jnp.inf, jnp.float32).at[0].set(0.0)

    def run_updates(llr_st, bit_st, phase):
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
            child = f_minsum(a, b) if op == "f" else g_update(a, b, bit_st[:, o : o + half, :])
            if child.ndim == 2:
                child = jnp.broadcast_to(child, (M, half, B))
            llr_st = llr_st.at[:, o : o + half, :].set(child)
        return llr_st

    def propagate_bits(bit_st, phase, cur):
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

    iota = jnp.arange(M)[:, None]
    tiles = B // args.bt
    ident_tiles = []  # per info phase: count of identity tiles
    for phase in range(N):
        llr_st = run_updates(llr_st, bit_st, phase)
        leaf = llr_st[:, off[n], :]
        if frozen[phase]:
            pm = pm + _softplus(-leaf)
            bit_st = propagate_bits(bit_st, phase, jnp.zeros((M, 1, B), jnp.int8))
            continue
        pm0 = pm + _softplus(-leaf)
        pm1 = pm + _softplus(leaf)
        cand_pm = jnp.stack([pm0, pm1], axis=1).reshape(2 * M, B)
        order = jnp.argsort(cand_pm, axis=0, stable=True)
        winners = order[:M]
        parent = winners >> 1
        bit = (winners & 1).astype(jnp.int8)
        ident = np.asarray(jnp.all(parent == iota, axis=0))  # [B]
        ident_tiles.append(
            int(np.sum(ident.reshape(tiles, args.bt).all(axis=1)))
        )
        llr_st = jnp.take_along_axis(llr_st, parent[:, None, :], axis=0)
        bit_st = jnp.take_along_axis(bit_st, parent[:, None, :], axis=0)
        pm = jnp.take_along_axis(cand_pm, winners, axis=0)
        bit_st = propagate_bits(bit_st, phase, bit[:, None, :])

    arr = np.asarray(ident_tiles, np.float64) / tiles
    lanewise = None
    print(f"M={M} snr={args.snr_db}dB frames={B} tiles of {args.bt}")
    print(f"identity-tile fraction: mean={arr.mean():.3f}  min={arr.min():.3f}  max={arr.max():.3f}")
    print("per-info-phase (first 32):", np.round(arr[:32], 2).tolist())
    print("per-info-phase (last 32):", np.round(arr[-32:], 2).tolist())


if __name__ == "__main__":
    main()
