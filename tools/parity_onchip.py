"""On-hardware exact-parity harness: Pallas kernel vs XLA SCL on the real TPU.

CI checks kernel<->XLA bit-parity only in interpret mode on CPU
(`tests/test_pallas_kernel.py`; conftest forces the CPU platform).  A Mosaic
miscompile on the actual chip would pass that CI.  This tool closes the gap:
it runs BOTH decoders on the real TPU over AWGN-realistic LLRs and asserts

  * `best_path_bits` exactly equal (int8),
  * `crc_pass` exactly equal (bool),
  * `best_path_info_llrs` close (f32; fused-multiply-add rounding may differ
    legitimately between XLA and Mosaic schedules, so this one is a
    tolerance check),

over the matrix N=128 x M in {1,4,8}, N in {512,1024} x M in {4,8}, and
N=2048 x M in {2,4,8} (the full set of shipped (N, M, loop_unroll)
defaults), including forced-bit plans (the DL-SCL retry decode path), the
exact-bf16 partial-sum-plane option, a lazy-clone vs fork-clone kernel
cross-check, and — at N=2048 M=8, where the shipped default is U=512 —
a U=32 unroll-invariance row so both ends of the unroll range are
certified.  Batches are > one 128-row kernel tile so tile-boundary bugs
cannot hide.

If an XLA reference compile is rejected by the remote-compile relay at a
big shape, the harness falls back to a kernel-vs-kernel cross-check
(fork-clone U=32 kernel as the reference — a maximally different Mosaic
program — anchored by the XLA-parity rows that did compile) and says so
in the log.

Reference semantics being certified: `decode_scl` of
/root/reference/dl_scl_polar/polar/scl.py:108-209 (our XLA `ops/scl.py` is
the parity-tested semantic twin; this tool proves the kernel matches it on
hardware, not just under interpret emulation).

Run:  python tools/parity_onchip.py | tee results_validation/parity_onchip.txt
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from polar_code_tpu.utils.cache import enable_compilation_cache
from polar_code_tpu.channel import awgn_llr, bpsk, noise_var_coded
from polar_code_tpu.ops.crc import attach_crc_batch
from polar_code_tpu.ops.polar_transform import encode_batch
from polar_code_tpu.ops.scl import decode_scl_batch
from polar_code_tpu.ops.scl_pallas import decode_scl_pallas
from polar_code_tpu.polar.construct import construct_info_set

CRC = "0x1864CFB"  # 5G CRC-24A, the modern package's polynomial


def make_llrs(N, K, B, seed, snr_db=5.0):
    """AWGN LLRs from real encoded random-payload frames (f32 on device).

    Realistic inputs (mix of CRC-pass and CRC-fail frames at 5 dB) rather
    than pure noise, so the CRC-select path is exercised in both branches.
    """
    info_set = construct_info_set(N, K, method="gaussian_bitrev")
    payload_bits = K - 24
    kp, kn = jax.random.split(jax.random.key(seed))
    payload = jax.random.bernoulli(kp, 0.5, (B, payload_bits)).astype(jnp.int8)
    msg = attach_crc_batch(payload, CRC)
    code = encode_batch(msg, info_set, N)
    nv = noise_var_coded(snr_db, K, N)
    llr = awgn_llr(kn, bpsk(code), nv).astype(jnp.float32)
    return jax.device_get(llr), info_set


def make_forced(B, K, seed):
    """Random DL-SCL-style plans: prefix-fix, one flip, free tail (int8)."""
    rng = np.random.default_rng(seed)
    forced = np.full((B, K), -1, np.int8)
    for b in range(B):
        i = rng.integers(0, K)
        forced[b, :i] = rng.integers(0, 2, size=i)
    return forced


def check(tag, N, K, M, llr_np, info_set, *, forced=None, bit_dtype=None,
          lazy_clone=None, loop_unroll=None, xla_cache={}):
    llr = jnp.asarray(llr_np)
    fk = None if forced is None else jnp.asarray(forced)
    key = (N, M, forced is None)
    if key not in xla_cache:
        t0 = time.perf_counter()
        try:
            ref = decode_scl_batch(llr, info_set, M, CRC, force_info_bits=fk)
            ref = jax.device_get((ref.best_path_bits, ref.crc_pass,
                                  ref.best_path_info_llrs))
            print(f"  [xla  {time.perf_counter()-t0:6.1f}s compile+run]",
                  flush=True)
        except Exception as e:  # remote-compile relay rejection at big shapes
            print(f"  [xla reference UNAVAILABLE ({type(e).__name__}); "
                  f"falling back to fork-clone U=32 kernel as reference]",
                  flush=True)
            t0 = time.perf_counter()
            ref = decode_scl_pallas(llr, info_set, M, CRC, force_info_bits=fk,
                                    lazy_clone=False, loop_unroll=32)
            ref = jax.device_get((ref["best_path_bits"], ref["crc_pass"],
                                  ref["best_path_info_llrs"]))
            print(f"  [kernel-ref {time.perf_counter()-t0:6.1f}s]", flush=True)
        xla_cache[key] = ref
    ref_bits, ref_crc, ref_llrs = xla_cache[key]
    t0 = time.perf_counter()
    out = decode_scl_pallas(llr, info_set, M, CRC, force_info_bits=fk,
                            bit_dtype=bit_dtype, lazy_clone=lazy_clone,
                            loop_unroll=loop_unroll)
    out = jax.device_get(out)
    dt = time.perf_counter() - t0
    bits_neq = int(np.sum(np.any(out["best_path_bits"] != ref_bits, axis=1)))
    crc_neq = int(np.sum(out["crc_pass"] != ref_crc))
    llr_err = float(np.max(np.abs(out["best_path_info_llrs"] - ref_llrs)))
    ok = bits_neq == 0 and crc_neq == 0 and llr_err < 1e-3
    B = llr_np.shape[0]
    print(f"{tag:46s} B={B:4d} bits_neq={bits_neq:3d}/{B} "
          f"crc_neq={crc_neq:3d} max|dllr|={llr_err:.2e} "
          f"[kernel {dt:5.1f}s] {'OK' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256,
                    help="frames; must span >1 kernel tile (tile=128)")
    ap.add_argument("--skip_n2048", action="store_true")
    args = ap.parse_args()
    enable_compilation_cache()
    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0]})")
    B = args.batch
    fails = 0

    # (N, Ms, forced_Ms) — extras (bf16 / fork-clone) exercised at max M
    matrix = [
        (128, (1, 4, 8), (8,)),
        (512, (4, 8), (8,)),
        (1024, (4, 8), (8,)),
    ]
    if not args.skip_n2048:
        # every shipped N>=2048 unroll default: U=256 at M=2, U=32 at M=4,
        # U=512 at M=8 — forced plans at both DL-SCL-relevant widths
        matrix.append((2048, (2, 4, 8), (2, 4, 8)))
    for N, Ms, forced_Ms in matrix:
        K = N // 2
        llr, info_set = make_llrs(N, K, B, seed=N)
        cache = {}
        for M in Ms:
            fails += not check(f"N={N} M={M} plain", N, K, M, llr, info_set,
                               xla_cache=cache)
        forced = make_forced(B, K, seed=N + 1)
        for M in forced_Ms:
            fails += not check(f"N={N} M={M} forced-plan", N, K, M, llr,
                               info_set, forced=forced, xla_cache=cache)
        M = Ms[-1]
        fails += not check(f"N={N} M={M} bf16 planes", N, K, M, llr, info_set,
                           bit_dtype=jnp.bfloat16, xla_cache=cache)
        if M > 1:
            fails += not check(f"N={N} M={M} fork-clone mode", N, K, M, llr,
                               info_set, lazy_clone=False, xla_cache=cache)
        if N >= 2048:
            # unroll invariance: the U=512 shipped default is checked by the
            # plain row above; U=32 generates a very different Mosaic
            # program for the same semantics
            fails += not check(f"N={N} M={M} U=32 unroll", N, K, M, llr,
                               info_set, loop_unroll=32, xla_cache=cache)

    print(f"\n{'ALL PARITY CHECKS PASSED' if fails == 0 else f'{fails} FAILURES'}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
