"""Re-run the REFERENCE SCL decoder at M=2, Eb/N0=5.5 dB with many more frames.

Round-1 validation left one outlier: ours 4.200e-02 vs ref-artifact 5.400e-02
(z=2.88, ref ran only 3000 frames — /root/reference/results/fer_M2.csv:4).
This reproduces the reference's exact frame loop (run_fer_sweep.py:60-95,
same rng stream: payload + noise are the only rng consumers, so SCL-only
replay matches the artifact's first 3000 frames bit-for-bit) and extends it
to --frames (default 30000) to decide whether the outlier is MC noise or a bug.

Usage: python tools/revalidate_m2.py [--frames 30000] [--M 2] [--snr 5.5]
Writes results_validation/ref_recheck_M{M}_{snr}dB.txt
"""
import argparse
import math
import sys

import numpy as np

sys.path.insert(0, "/root/reference")
from dl_scl_polar import config  # noqa: E402
from dl_scl_polar.polar.polar import construct_info_set, encode  # noqa: E402
from dl_scl_polar.polar.crc import attach_crc, check_crc  # noqa: E402
from dl_scl_polar.polar.scl import decode_scl  # noqa: E402
from dl_scl_polar.utils.seeding import seed_all  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30000)
    ap.add_argument("--M", type=int, default=2)
    ap.add_argument("--snr", type=float, default=5.5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = config.get_config()
    seed_all(args.seed)
    info_set = construct_info_set(cfg.N, cfg.K)
    payload_bits = cfg.K - cfg.crc_bits

    rng = np.random.default_rng(args.seed + int(args.snr * 10))
    ebno = 10 ** (args.snr / 10.0)
    noise_var = 1.0 / (2.0 * (cfg.K / cfg.N) * ebno)
    sigma = math.sqrt(noise_var)

    errors = 0
    errors_at_3000 = None
    for frame in range(args.frames):
        payload = rng.integers(0, 2, size=payload_bits, dtype=np.int8)
        msg = attach_crc(payload, cfg.crc_poly)
        code = encode(msg)
        symbols = 1.0 - 2.0 * code.astype(np.float64)
        noise = rng.normal(0.0, sigma, size=symbols.shape)
        llr = 2.0 * (symbols + noise) / noise_var
        out = decode_scl(llr, info_set, args.M, crc=cfg.crc_poly)
        bits = out.get("best_path_bits")
        ok = bits is not None and check_crc(bits, cfg.crc_poly)
        if not ok:
            errors += 1
        if frame + 1 == 3000:
            errors_at_3000 = errors
        if (frame + 1) % 1000 == 0:
            print(f"{frame+1} frames, fer={errors/(frame+1):.4e}", flush=True)

    fer = errors / args.frames
    lines = [
        f"reference SCL M={args.M} @ {args.snr} dB, {args.frames} frames (seed {args.seed})",
        f"fer = {fer:.4e} ({errors} errors)",
    ]
    if errors_at_3000 is not None:
        lines.append(
            f"fer at first 3000 frames = {errors_at_3000/3000:.4e} "
            f"(artifact /root/reference/results/fer_M{args.M}.csv says 5.400e-02 @ 5.5 dB)"
        )
    out_path = f"results_validation/ref_recheck_M{args.M}_{args.snr}dB.txt"
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
