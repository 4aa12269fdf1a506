"""Measure the reference implementation's CPU decode throughput.

Produces the `REF_CPU_M8_FPS` baseline used by bench.py's `vs_baseline`.
Requires the reference tree mounted at /root/reference.

    OMP_NUM_THREADS=1 python tools/time_reference.py
"""

import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np


def main() -> None:
    from dl_scl_polar import config
    from dl_scl_polar.polar.crc import attach_crc
    from dl_scl_polar.polar.polar import construct_info_set, encode
    from dl_scl_polar.polar.scl import decode_scl

    cfg = config.DEFAULTS
    info_set = construct_info_set(cfg.N, cfg.K)
    rng = np.random.default_rng(0)
    nv = 1.0 / (2.0 * (cfg.K / cfg.N) * 10 ** 0.5)  # 5 dB
    frames = []
    for _ in range(40):
        payload = rng.integers(0, 2, size=cfg.K - cfg.crc_bits, dtype=np.int8)
        code = encode(attach_crc(payload, cfg.crc_poly))
        y = (1.0 - 2.0 * code) + rng.normal(0, np.sqrt(nv), size=cfg.N)
        frames.append(2.0 * y / nv)

    for M in (1, 8):
        decode_scl(frames[0], info_set, M, crc=cfg.crc_poly)  # warmup
        t0 = time.perf_counter()
        for llr in frames:
            decode_scl(llr, info_set, M, crc=cfg.crc_poly)
        dt = time.perf_counter() - t0
        print(
            f"reference decode_scl M={M}: {len(frames) / dt:.2f} frames/s "
            f"({dt / len(frames) * 1e3:.1f} ms/frame)"
        )


if __name__ == "__main__":
    main()
