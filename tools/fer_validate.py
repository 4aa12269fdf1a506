"""Validate FER curves vs reference artifacts at 5.0 dB within binomial CI."""
import sys, math
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from polar_code_tpu.eval import run_fer_sweep

# reference artifacts (results/fer_M*.csv @5.0dB): (fer_scl, fer_dl, ref_frames)
REF = {
    1: (2.573e-01, 1.753e-01, 3000),
    2: (1.040e-01, 8.733e-02, 3000),
    4: (4.550e-02, 3.550e-02, 2000),
    8: (1.300e-02, 1.000e-02, 2000),
}
FRAMES = 30000
for M, (ref_scl, ref_dl, ref_frames) in REF.items():
    args = run_fer_sweep.build_argparser().parse_args([
        "--M", str(M), "--frames", str(FRAMES), "--snr_lo", "5.0", "--snr_hi", "5.0",
        "--retries", "8", "--beta", f"/root/reference/checkpoints/beta_M{M}.npy",
        "--out_dir", "/tmp/fer_val", "--plot_dir", "/tmp/fer_val", "--batch", "8192",
    ])
    run_fer_sweep.run_sweep(args)
    row = open(f"/tmp/fer_val/fer_M{M}.csv").read().strip().splitlines()[1].split(",")
    fer_scl, fer_dl = float(row[1]), float(row[3])
    for name, ours, ref in (("SCL", fer_scl, ref_scl), ("DL", fer_dl, ref_dl)):
        # 95% CI combining both binomial uncertainties
        se = math.sqrt(ref*(1-ref)/ref_frames + ours*(1-ours)/FRAMES)
        z = abs(ours - ref) / se if se > 0 else 0.0
        status = "OK " if z < 2.5 else "FAIL"
        print(f"M={M} {name}: ours={ours:.4e} ref={ref:.4e} z={z:.2f} {status}")
