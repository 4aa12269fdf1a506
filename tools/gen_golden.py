"""Generate hermetic golden vectors from the reference implementation."""
import sys
sys.path.insert(0, "/root/reference")
import numpy as np
from dl_scl_polar.polar.polar import construct_info_set, sc_decode
from dl_scl_polar.polar.scl import decode_scl
from dl_scl_polar.dlscl.flip import decode_with_retries

N, K = 128, 64
CRC = "0x1864CFB"
info_set = construct_info_set(N, K)
rng = np.random.default_rng(20260817)
nv = 1.0 / (2.0 * (K / N) * 10 ** (4.5 / 10.0))
B = 12
llrs = []
for _ in range(B):
    bits = rng.integers(0, 2, size=N)
    y = (1.0 - 2.0 * bits) + rng.normal(0, np.sqrt(nv), size=N)
    llrs.append(2.0 * y / nv)
llrs = np.stack(llrs)

out = {"llrs": llrs, "info_set": np.asarray(info_set)}
out["sc_bits"] = np.stack([sc_decode(l, info_set) for l in llrs])
for M in (1, 8):
    res = [decode_scl(l, info_set, M, crc=CRC) for l in llrs]
    out[f"scl_m{M}_best"] = np.stack([r["best_path_bits"] for r in res])
    out[f"scl_m{M}_metrics"] = np.stack([np.pad(np.asarray(r["metrics"]), (0, M - len(r["metrics"])), constant_values=np.inf) for r in res])
    out[f"scl_m{M}_best_llrs"] = np.stack([r["best_path_info_llrs"] for r in res])
dl = [decode_with_retries(l, info_set, 2, 4, crc=CRC) for l in llrs]
out["dl_m2_best"] = np.stack([r["best_path_bits"] for r in dl])
out["dl_m2_success"] = np.asarray([r["success"] for r in dl])
out["dl_m2_attempts"] = np.asarray([len(r["attempts"]) - 1 for r in dl])
np.savez_compressed("/root/repo/tests/golden/ref_p128_k64.npz", **out)
print("saved", {k: v.shape for k, v in out.items()})
