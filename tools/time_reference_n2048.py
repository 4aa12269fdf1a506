"""Measure the reference decode_scl at P(2048,1024) M=8 on CPU.

Produces the `REF_CPU_M8_N2048_FPS` baseline used by bench.py's
largest-shape metric line.  The reference's own CLIs never run N=2048,
but its `decode_scl` accepts any power-of-two N
(`/root/reference/dl_scl_polar/polar/scl.py:108`), so this is the honest
like-for-like CPU number.

    OMP_NUM_THREADS=1 python tools/time_reference_n2048.py
"""

import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np


def main() -> None:
    from dl_scl_polar.polar.crc import attach_crc
    from dl_scl_polar.polar.polar import _polar_transform, construct_info_set
    from dl_scl_polar.polar.scl import decode_scl

    N, K, crc_poly, crc_bits = 2048, 1024, "0x1864CFB", 24
    info_set = construct_info_set(N, K)
    rng = np.random.default_rng(0)
    nv = 1.0 / (2.0 * (K / N) * 10 ** 0.5)  # 5 dB
    frames = []
    for _ in range(2):
        payload = rng.integers(0, 2, size=K - crc_bits, dtype=np.int8)
        # reference `encode` is pinned to config.DEFAULTS (N=128); build
        # the u-vector injection + transform directly for N=2048
        u = np.zeros(N, dtype=np.int8)
        u[info_set] = attach_crc(payload, crc_poly).astype(np.int8) & 1
        code = _polar_transform(u)
        y = (1.0 - 2.0 * code) + rng.normal(0, np.sqrt(nv), size=N)
        frames.append(2.0 * y / nv)

    t0 = time.perf_counter()
    for llr in frames:
        decode_scl(llr, info_set, 8, crc=crc_poly)
    dt = time.perf_counter() - t0
    print(
        f"reference decode_scl N=2048 K=1024 M=8: {len(frames) / dt:.5f} "
        f"frames/s ({dt / len(frames):.2f} s/frame)"
    )


if __name__ == "__main__":
    main()
