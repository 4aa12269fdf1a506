"""Benchmark: decoded frames/s on one chip, one JSON line per metric.

Line 1 (the headline, what the driver's BENCH_r*.json records): plain SCL
M=8 P(128,64).  Subsequent lines track the rest of the perf story:

  * adaptive two-stage SCL (M_first=1 → M_final=8 on CRC failure, the
    modern form of the legacy re-decode scheme, reference
    `simulator.py:111-116`) at the same 5 dB operating point;
  * large-N: SCL M=8 P(1024,512) through the fused kernel;
  * largest shape: SCL M=8 P(2048,1024) through the fused kernel
    (U=512 unroll default).

Protocol (all lines): one jit-compiled Monte-Carlo step (payload → CRC-24
→ polar encode → BPSK → AWGN at 5 dB → decode → CRC select) generated
on-device with a fresh PRNG key per step, so no step can be served from a
cache.  Throughput counts decoded frames, matching the reference's
`decode_scl` work per frame.

Baselines: the reference implementation (`/root/reference`,
single-threaded NumPy `decode_scl`) measured on this machine's CPU —
4.73 frames/s for M=8 P(128,64) (tools/time_reference.py, 2026-08-17)
0.0656 frames/s for M=8 P(1024,512)
(tools/time_reference_n1024.py, 2026-08-21, 15.25 s/frame), and
0.0261 frames/s for M=8 P(2048,1024)
(tools/time_reference_n2048.py, 2026-08-21).  `vs_baseline` is the
speedup over the like-for-like number — the BASELINE.json "≥100× decoded
frames/s" target metric.  The adaptive line is compared against the
reference's plain M=8 CPU decode: the adaptive scheme does the same
decoding job (identical operating point), faster.
"""

from __future__ import annotations

import argparse
import json
import time

REF_CPU_M8_FPS = 4.73  # reference decode_scl, M=8, P(128,64), 1 CPU thread
REF_CPU_M8_N1024_FPS = 0.0656  # reference decode_scl, M=8, P(1024,512)
REF_CPU_M8_N2048_FPS = 0.02610  # reference decode_scl, M=8, P(2048,1024)
# (tools/time_reference_n2048.py, 2026-08-21, 38.31 s/frame)


def main() -> None:
    parser = argparse.ArgumentParser()
    # measured plateau on v5e: 65536 → 2.55M fps, 131072 → 2.69M,
    # 262144 → 2.81M, 524288+ → flat (~2.80M); 262144 is the knee
    parser.add_argument("--batch", type=int, default=262144)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--M", type=int, default=8)
    parser.add_argument("--snr_db", type=float, default=5.0)
    parser.add_argument(
        "--headline_only", action="store_true",
        help="emit only the first (driver headline) metric line",
    )
    # large-N line: 65536 frames/call is the measured-plateau call size
    # for the N=1024 kernel (docs/KERNEL.md)
    parser.add_argument("--batch_n1024", type=int, default=65536)
    # N=2048: 16384 frames/call (the round-4 unroll-sweep call size)
    parser.add_argument("--batch_n2048", type=int, default=16384)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from polar_code_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from polar_code_tpu import config
    from polar_code_tpu.channel import awgn_llr, bpsk, noise_var_coded
    from polar_code_tpu.ops.adaptive import decode_scl_adaptive
    from polar_code_tpu.ops.backend import resolve_backend
    from polar_code_tpu.ops.crc import attach_crc_batch
    from polar_code_tpu.ops.polar_transform import encode_batch
    from polar_code_tpu.ops.scl import decode_scl_batch
    from polar_code_tpu.ops.scl_pallas import decode_scl_pallas
    from polar_code_tpu.polar.construct import construct_info_set

    cfg = config.DEFAULTS

    def make_step(N, K, batch, decode, method="gaussian"):
        """One Monte-Carlo sim+decode step over `batch` frames at 5 dB."""
        info_set = construct_info_set(N, K, method=method)
        nv = noise_var_coded(args.snr_db, K, N)
        payload_bits = K - cfg.crc_bits

        @jax.jit
        def step(key):
            kp, kn = jax.random.split(key)
            payload = jax.random.bernoulli(
                kp, 0.5, (batch, payload_bits)
            ).astype(jnp.int8)
            msg = attach_crc_batch(payload, cfg.crc_poly)
            code = encode_batch(msg, info_set, N)
            llr = awgn_llr(kn, bpsk(code), nv)
            bits, crc_pass = decode(llr, info_set)
            frame_ok = jnp.all(bits == msg, axis=1)
            return jnp.sum(crc_pass), jnp.sum(frame_ok)

        return step

    def run_metric(metric, step, batch, iters, baseline_fps):
        # Warmup / compile.  NB: sync with device_get, not
        # block_until_ready — the latter does not reliably wait for
        # execution on the axon backend.
        jax.device_get(step(jax.random.key(0)))
        t0 = time.perf_counter()
        # dispatch all steps asynchronously (distinct keys), then one sync
        outs = [step(jax.random.key(1 + i)) for i in range(iters)]
        outs = jax.device_get(outs)
        dt = time.perf_counter() - t0
        total = batch * iters
        fps = total / dt
        crc_rate = float(sum(int(o[0]) for o in outs)) / total
        assert crc_rate > 0.5, f"{metric}: crc pass rate {crc_rate}"
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": round(fps, 1),
                    "unit": "frames/s",
                    "vs_baseline": round(fps / baseline_fps, 1),
                }
            ),
            flush=True,
        )

    # ---- headline: plain SCL M=8 P(128,64) ----
    use_pallas = (
        resolve_backend(
            "auto", batch=args.batch, M=args.M, dtype=jnp.float32,
            N=cfg.N, K=cfg.K,
        )
        == "pallas"
    )

    def decode_plain(llr, info_set):
        if use_pallas:
            out = decode_scl_pallas(llr, info_set, args.M, cfg.crc_poly)
            return out["best_path_bits"], out["crc_pass"]
        res = decode_scl_batch(llr, info_set, M=args.M, crc=cfg.crc_poly)
        return res.best_path_bits, res.crc_pass

    run_metric(
        f"scl_m{args.M}_sim_decode_frames_per_s",
        make_step(cfg.N, cfg.K, args.batch, decode_plain),
        args.batch, args.iters, REF_CPU_M8_FPS,
    )
    if args.headline_only:
        return

    # ---- adaptive two-stage: M=1 first pass, CRC failures re-decoded at
    # M=8 (compacted on-device).  Same operating point as the headline.
    def decode_adaptive(llr, info_set):
        out = decode_scl_adaptive(llr, info_set, 1, args.M, cfg.crc_poly)
        return out["best_path_bits"], out["crc_pass"]

    run_metric(
        f"scl_adaptive_m1_m{args.M}_sim_decode_frames_per_s",
        make_step(cfg.N, cfg.K, args.batch, decode_adaptive),
        args.batch, args.iters, REF_CPU_M8_FPS,
    )

    # ---- large-N: SCL M=8 P(1024,512) through the fused kernel ----
    def decode_kernel(llr, info_set):
        out = decode_scl_pallas(llr, np.asarray(info_set), args.M, cfg.crc_poly)
        return out["best_path_bits"], out["crc_pass"]

    # gaussian_bitrev: the corrected DEGA ordering — the reference's set is
    # bit-reversed relative to its natural-order decoder, which is harmless
    # at N=128 but FER≈0.93 at N=1024/5 dB (docs/KERNEL.md); throughput is
    # identical either way, but the CRC-sanity gate needs a working code.
    run_metric(
        f"scl_m{args.M}_n1024_sim_decode_frames_per_s",
        make_step(1024, 512, args.batch_n1024, decode_kernel,
                  method="gaussian_bitrev"),
        args.batch_n1024, max(2, args.iters // 2), REF_CPU_M8_N1024_FPS,
    )

    # ---- largest shape: SCL M=8 P(2048,1024), U=512 unroll default ----
    run_metric(
        f"scl_m{args.M}_n2048_sim_decode_frames_per_s",
        make_step(2048, 1024, args.batch_n2048, decode_kernel,
                  method="gaussian_bitrev"),
        args.batch_n2048, max(2, args.iters // 4), REF_CPU_M8_N2048_FPS,
    )


if __name__ == "__main__":
    main()
