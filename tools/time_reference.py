import sys, time
sys.path.insert(0, "/root/reference")
import numpy as np
from dl_scl_polar.polar.polar import construct_info_set, encode
from dl_scl_polar.polar.crc import attach_crc
from dl_scl_polar.polar.scl import decode_scl
from dl_scl_polar import config

cfg = config.DEFAULTS
info_set = construct_info_set(cfg.N, cfg.K)
rng = np.random.default_rng(0)
frames = []
for _ in range(40):
    payload = rng.integers(0, 2, size=cfg.K - cfg.crc_bits, dtype=np.int8)
    msg = attach_crc(payload, cfg.crc_poly)
    code = encode(msg)
    noise = rng.normal(0, np.sqrt(1/(2*0.5*10**0.5)), size=128)
    llr = 2.0*((1.0-2.0*code)+noise)/(1/(2*0.5*10**0.5))
    frames.append(llr)
for M in (1, 8):
    # warmup
    decode_scl(frames[0], info_set, M, crc=cfg.crc_poly)
    t0 = time.perf_counter()
    for llr in frames:
        decode_scl(llr, info_set, M, crc=cfg.crc_poly)
    dt = time.perf_counter() - t0
    print(f"reference decode_scl M={M}: {len(frames)/dt:.2f} frames/s  ({dt/len(frames)*1e3:.1f} ms/frame)")
