"""Benchmark: SCL M=8 P(128,64) decoded frames/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: one jit-compiled Monte-Carlo step (payload → CRC-24 → polar
encode → BPSK → AWGN at 5 dB → SCL(M=8) decode → CRC select) generated
on-device with a fresh PRNG key per step, so no step can be served from a
cache.  Throughput counts decoded frames, matching the reference's
`decode_scl` work per frame.

Baseline: the reference implementation (`/root/reference`, single-threaded
NumPy `decode_scl`) measured on this machine's CPU at 4.73 frames/s for
M=8 P(128,64) (40-frame steady-state timing, 2026-08-17; re-measure with
tools/time_reference.py).  `vs_baseline` is the speedup over that number —
the BASELINE.json "≥100× decoded frames/s" target metric.
"""

from __future__ import annotations

import argparse
import json
import time

REF_CPU_M8_FPS = 4.73  # reference decode_scl, M=8, P(128,64), 1 CPU thread


def main() -> None:
    parser = argparse.ArgumentParser()
    # measured plateau on v5e: 65536 → 2.55M fps, 131072 → 2.69M,
    # 262144 → 2.81M, 524288+ → flat (~2.80M); 262144 is the knee
    parser.add_argument("--batch", type=int, default=262144)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--M", type=int, default=8)
    parser.add_argument("--snr_db", type=float, default=5.0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from polar_code_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from polar_code_tpu import config
    from polar_code_tpu.channel import awgn_llr, bpsk, noise_var_coded
    from polar_code_tpu.ops.backend import resolve_backend
    from polar_code_tpu.ops.crc import attach_crc_batch
    from polar_code_tpu.ops.polar_transform import encode_batch
    from polar_code_tpu.ops.scl import decode_scl_batch
    from polar_code_tpu.ops.scl_pallas import decode_scl_pallas
    from polar_code_tpu.polar.construct import construct_info_set

    cfg = config.DEFAULTS
    info_set = construct_info_set(cfg.N, cfg.K)
    nv = noise_var_coded(args.snr_db, cfg.K, cfg.N)
    payload_bits = cfg.K - cfg.crc_bits
    use_pallas = (
        resolve_backend(
            "auto", batch=args.batch, M=args.M, dtype=jnp.float32,
            N=cfg.N, K=cfg.K,
        )
        == "pallas"
    )

    @jax.jit
    def step(key):
        kp, kn = jax.random.split(key)
        payload = jax.random.bernoulli(kp, 0.5, (args.batch, payload_bits)).astype(jnp.int8)
        msg = attach_crc_batch(payload, cfg.crc_poly)
        code = encode_batch(msg, info_set, cfg.N)
        llr = awgn_llr(kn, bpsk(code), nv)
        if use_pallas:
            out = decode_scl_pallas(llr, info_set, args.M, cfg.crc_poly)
            bits, crc_pass = out["best_path_bits"], out["crc_pass"]
        else:
            res = decode_scl_batch(llr, info_set, M=args.M, crc=cfg.crc_poly)
            bits, crc_pass = res.best_path_bits, res.crc_pass
        frame_ok = jnp.all(bits == msg, axis=1)
        return jnp.sum(crc_pass), jnp.sum(frame_ok)

    # Warmup / compile.  NB: sync with device_get, not block_until_ready —
    # the latter does not reliably wait for execution on the axon backend.
    jax.device_get(step(jax.random.key(0)))

    t0 = time.perf_counter()
    # dispatch all steps asynchronously (distinct keys), then one sync
    outs = [step(jax.random.key(1 + i)) for i in range(args.iters)]
    outs = jax.device_get(outs)
    dt = time.perf_counter() - t0

    total = args.batch * args.iters
    fps = total / dt
    crc_rate = float(sum(int(o[0]) for o in outs)) / total
    assert crc_rate > 0.5, f"decoder sanity failed: crc pass rate {crc_rate}"
    print(
        json.dumps(
            {
                "metric": f"scl_m{args.M}_sim_decode_frames_per_s",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / REF_CPU_M8_FPS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
