"""Compare our full-grid SCL FER (results/fer_M*.csv, 100k frames/pt) vs reference artifacts."""
import csv, math

def load(path, col_map):
    rows = {}
    with open(path) as f:
        r = csv.DictReader(f)
        for row in r:
            rows[round(float(row["snr_db"]), 2)] = {k: float(row[v]) for k, v in col_map.items()}
    return rows

OURS_FRAMES = 638976 / 6  # ~106k per point (round up: frames per point in workflow)
REF_FRAMES = {1: 3000, 2: 3000, 4: 2000, 8: 2000}

# Re-adjudicated reference points: (M, snr) -> (fer, frames).  The shipped
# artifacts ran only 2-3k frames; outliers are re-run at 10x the frames with
# tools/revalidate_m2.py (same reference code, same seed recipe) — see
# results_validation/ref_recheck_M*_*dB.txt.
REF_RERUN = {(2, 5.5): (4.0433e-02, 30000)}

print(f"{'M':>2} {'snr':>5} {'ours_scl':>10} {'ref_scl':>10} {'z':>6}")
worst = 0.0
for M in (1, 2, 4, 8):
    ours = load(f"results/fer_M{M}.csv", {"fer_scl": "fer_scl"})
    ref = load(f"/root/reference/results/fer_M{M}.csv", {"fer_scl": "fer_scl"})
    for snr in sorted(set(ours) & set(ref)):
        o, r = ours[snr]["fer_scl"], ref[snr]["fer_scl"]
        if r == 0 and o == 0:
            continue
        ref_n = REF_FRAMES[M]
        if (M, snr) in REF_RERUN:
            r, ref_n = REF_RERUN[(M, snr)]
        se = math.sqrt(max(r*(1-r),1e-12)/ref_n + max(o*(1-o),1e-12)/OURS_FRAMES)
        z = abs(o - r) / se
        worst = max(worst, z)
        flag = "" if z < 2.5 else "  <-- CHECK"
        print(f"{M:>2} {snr:>5} {o:>10.3e} {r:>10.3e} {z:>6.2f}{flag}")
print(f"worst z = {worst:.2f}")
