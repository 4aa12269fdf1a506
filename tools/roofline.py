"""Roofline / utilization model for the fused SCL kernel on TPU v5e.

Every perf claim so far is *relative* (×CPU-reference, ×XLA, A/B deltas).
This tool makes the absolute claim: it statically counts the vector work
one decode performs — mirroring `ops/scl_pallas.py`'s code paths over the
exact (N, K) schedule — and compares the measured decode rate against the
v5e VPU issue ceiling.

Model
-----
The kernel is VPU-bound: all hot work is f32 elementwise on [span, BT]
blocks (BT = 128 lanes; spans pack into 8-row sublanes → one vreg covers
8×128 elements).  MXU work (CRC syndrome matmuls) is negligible (<0.5%
of FLOPs) and overlaps.  We count **vreg-ops**: each elementwise op on a
[span, BT] block costs ceil(span/8) vector instructions.  Sub-8-row
blocks waste sublanes — exactly the inefficiency the model must capture,
since most SCL rows are narrow.

v5e ceiling: 8×128 f32 lanes/instruction at ~1.67 GHz and ~2 vector
issues/cycle → ~3.4e12 f32 element-ops/s ≈ 3.3e9 vreg-ops/s.  (Derived:
v5e peak 197 bf16 TFLOP/s over 4 MXUs of 128×128×2 flops fixes the clock
near 1.67 GHz; the 2-issue VPU figure is the public TPU architectural
number.  Treat the ceiling as ±20% — the conclusions below do not hinge
on the third digit.)

Predicted time/frame = vreg_ops_per_tile / (RATE · BT).
Utilization = predicted / measured.

Run (TPU):   python tools/roofline.py --measure
Model only:  python tools/roofline.py
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# ---- v5e VPU ceiling ----------------------------------------------------
CLOCK_HZ = 1.67e9
VPU_ISSUE = 2.0  # vector ALU ops / cycle
VREG_RATE = CLOCK_HZ * VPU_ISSUE  # vreg-ops / s
BT = 128

# op-cost convention (element-ops per element, counted from the jnp source)
F_OPS = 7        # sign·sign·min(|a|,|b|): 2 abs, 2 sign, min, 2 mul
G_OPS = 3        # b + (1−2c)·a
XOR_OPS = 3      # a + b − 2ab
SOFTPLUS_OPS = 6  # max, abs, neg, exp, log1p, add
SORT_LAYER_OPS = 8  # 2 rolls + cmp-chain (3) + 2 selects + iota masks


def _vr(span: int) -> int:
    return max(1, -(-span // 8))


def model_counts(N: int, K: int, M: int, *, sigma_skip: bool = True,
                 full_unroll: bool = False) -> dict:
    """Per-BT-tile vreg-op count of one kernel invocation (one decode of
    BT frames), mirroring ops/scl_pallas.py's lazy-clone code paths."""

    from polar_code_tpu.ops.scl_pallas import _schedule_tables
    from polar_code_tpu.polar.construct import construct_info_set

    method = "gaussian" if N <= 128 else "gaussian_bitrev"
    info = np.asarray(construct_info_set(N, K, method=method))
    (upd, store, frozen, infoidx, _, _, glevel,
     gpar_need, comb_need) = _schedule_tables(N, info)
    n = int(math.log2(N))
    lazy = M > 1
    lgm = max(1, (M - 1).bit_length()) if M > 1 else 0

    def tree(span):  # σ/clone select tree over M sources on [span, BT] rows
        return M * (M - 1) * _vr(span) + 3 * lgm  # + index-bit extraction

    v = 0  # vreg-ops per tile
    for p in range(N):
        gl = int(glevel[p])
        # LLR updates: one g at gl (phase 0: none), f-descent below it
        if gl > 0:
            span = N >> gl
            v += G_OPS * _vr(span)
            if lazy:
                if not sigma_skip:
                    # round-4 behavior: parent (gl>1) + left-bit gathers
                    if gl > 1:
                        v += tree(2 * span)
                    v += tree(span)
                elif gl == n:
                    pass  # parent σ removed (even-fork materialization)
                elif gl > 1 and (gpar_need[p] if full_unroll else True):
                    v += tree(2 * span)
        for lv in range(1, n + 1):
            if upd[p, lv] == 1:
                v += F_OPS * _vr(N >> lv)
        # leaf decision
        if frozen[p]:
            v += (SOFTPLUS_OPS + 1) * _vr(M)
        else:
            v += 12 * _vr(M)  # candidate metrics (shared softplus, masks)
            R = 2 * M
            layers = 0
            k = 2
            while k <= R:
                layers += (k // 2).bit_length()
                k *= 2
            v += SORT_LAYER_OPS * layers * _vr(R)  # packed bitonic
            v += 8 * _vr(M)  # parent/bit extraction, pm writeback
            if lazy:
                v += tree(2 * n - 1)  # σ compose
                if sigma_skip and p % 2 == 0:
                    v += tree(2)  # even-fork parent materialization
            v += 4 * _vr(M) * 2  # trace writes
        # partial-sum combine chain
        lvl, node = n, p
        first = True
        while lvl > 0 and node % 2 == 1:
            span = N >> lvl
            v += XOR_OPS * _vr(span)
            if lazy:
                needed = bool(comb_need[p, lvl]) if (full_unroll and sigma_skip) else True
                if needed:
                    v += tree(span)
            node //= 2
            lvl -= 1
            first = False
        if lvl > 0 and not first:
            v += _vr(N >> lvl)  # final store write
    # final sort + chunked syndrome backtrack + selected-path backtrack
    if M > 1:
        layers = 0
        k = 2
        while k <= M:
            layers += (k // 2).bit_length()
            k *= 2
        v += SORT_LAYER_OPS * layers * _vr(M)
        v += K * (M * (M - 1) + 5 * M + 6)  # per-row backtrack select trees
        v += K * (M + 3)  # selected-path backtrack
    return {"vregs_per_tile": v}


def predict_us_per_frame(N, K, M, **kw) -> float:
    c = model_counts(N, K, M, **kw)
    return c["vregs_per_tile"] / VREG_RATE / BT * 1e6


def measure_us_per_frame(N, K, M, batch, iters=6, rounds=4) -> float:
    import jax
    import jax.numpy as jnp
    from polar_code_tpu import config
    from polar_code_tpu.channel import awgn_llr, bpsk, noise_var_coded
    from polar_code_tpu.ops.crc import attach_crc_batch
    from polar_code_tpu.ops.polar_transform import encode_batch
    from polar_code_tpu.ops.scl_pallas import decode_scl_pallas
    from polar_code_tpu.polar.construct import construct_info_set
    from polar_code_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = config.DEFAULTS
    method = "gaussian" if N <= 128 else "gaussian_bitrev"
    info = construct_info_set(N, K, method=method)
    kp, kn = jax.random.split(jax.random.key(0))
    payload = jax.random.bernoulli(kp, 0.5, (batch, K - cfg.crc_bits)).astype(jnp.int8)
    code = encode_batch(attach_crc_batch(payload, cfg.crc_poly), info, N)
    llr = jnp.asarray(
        jax.device_get(awgn_llr(kn, bpsk(code), noise_var_coded(5.0, K, N))),
        jnp.float32,
    )
    fn = jax.jit(
        lambda x: decode_scl_pallas(x, info, M, cfg.crc_poly)["crc_pass"]
    )
    jax.device_get(fn(llr))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(llr) for _ in range(iters)]
        jax.device_get(outs)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best / batch * 1e6


SHAPES = [
    # (N, M, batch for measurement)
    (128, 1, 262144), (128, 4, 262144), (128, 8, 262144),
    (512, 4, 65536), (512, 8, 65536),
    (1024, 4, 65536), (1024, 8, 65536),
    (2048, 8, 16384),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="measure on the TPU (otherwise model-only table)")
    args = ap.parse_args()

    print(f"v5e VPU ceiling model: {VREG_RATE:.2e} vreg-ops/s "
          f"({CLOCK_HZ/1e9:.2f} GHz x {VPU_ISSUE:.0f} issue); BT={BT}")
    hdr = f"{'shape':>16} {'vregs/tile':>12} {'pred us/fr':>11}"
    if args.measure:
        hdr += f" {'meas us/fr':>11} {'roofline%':>10}"
    print(hdr)
    for N, M, batch in SHAPES:
        K = N // 2
        fu = N <= 128
        pred = predict_us_per_frame(N, K, M, full_unroll=fu)
        c = model_counts(N, K, M, full_unroll=fu)
        line = f"P({N},{K}) M={M:>2} {c['vregs_per_tile']:>12,} {pred:>11.3f}"
        if args.measure:
            meas = measure_us_per_frame(N, K, M, batch)
            line += f" {meas:>11.3f} {100*pred/meas:>9.1f}%"
        print(line, flush=True)


if __name__ == "__main__":
    main()
