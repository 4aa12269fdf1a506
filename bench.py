"""Benchmark: SCL M=8 P(128,64) decoded frames/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference implementation (`/root/reference`, single-threaded
NumPy `decode_scl`) measured on this machine's CPU at 4.73 frames/s for
M=8 P(128,64) (40-frame steady-state timing, 2026-08-17; see
tools/time_reference.py to re-measure).  `vs_baseline` is the speedup over
that number, i.e. the BASELINE.json "≥100× decoded frames/s" target metric.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

REF_CPU_M8_FPS = 4.73  # reference decode_scl, M=8, P(128,64), 1 CPU thread


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8192)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--M", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from polar_code_tpu import config
    from polar_code_tpu.channel import noise_var_coded
    from polar_code_tpu.ops.scl import decode_scl_batch
    from polar_code_tpu.polar.construct import construct_info_set

    cfg = config.DEFAULTS
    info_set = construct_info_set(cfg.N, cfg.K)
    nv = noise_var_coded(5.0, cfg.K, cfg.N)

    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(args.batch, cfg.N))
    sym = 1.0 - 2.0 * bits
    llr_host = 2.0 * (sym + rng.normal(0, np.sqrt(nv), size=sym.shape)) / nv
    llr = jnp.asarray(llr_host, jnp.float32)

    @jax.jit
    def decode(llr):
        res = decode_scl_batch(llr, info_set, M=args.M, crc=cfg.crc_poly)
        return res.best_path_bits, res.crc_pass

    # Warmup / compile.
    out = decode(llr)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = decode(llr)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = args.batch * args.iters / dt
    print(
        json.dumps(
            {
                "metric": f"scl_m{args.M}_decode_frames_per_s",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / REF_CPU_M8_FPS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
