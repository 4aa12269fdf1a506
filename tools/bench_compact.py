"""Device-side retry-compaction timing: FER chunk M=8 on one chip.

    python tools/bench_compact.py [batch] [compacts-csv]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time

import numpy as np
import jax
from polar_code_tpu import config
from polar_code_tpu.channel import noise_var_coded, noise_var_uncoded
from polar_code_tpu.polar.construct import construct_info_set
from polar_code_tpu.sim.pipeline import make_fer_chunk
from polar_code_tpu.utils.cache import enable_compilation_cache
from polar_code_tpu.utils.seeding import fold_key, make_key

enable_compilation_cache()  # the compact chunk graphs cost ~2 min to compile

cfg = config.DEFAULTS
info = construct_info_set(cfg.N, cfg.K)
beta = np.load(str(Path(__file__).resolve().parent.parent / "checkpoints/beta_M8.npy"))
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
M, retries = 8, 8
root = make_key(0)

fns = {}
compacts = ([int(x) for x in sys.argv[2].split(',')]
            if len(sys.argv) > 2 else [0, 128, 256, 512, 1024])
for compact in compacts:
    fns[compact] = make_fer_chunk(N=cfg.N, K=cfg.K, crc_poly=cfg.crc_poly, info_set=info,
                                  M=M, retries=retries, beta=beta, batch=B, compact=compact)
for snr in [4.0, 5.0, 6.0]:
    nv_c, nv_u = noise_var_coded(snr, cfg.K, cfg.N), noise_var_uncoded(snr)
    for compact, fn in fns.items():
        jax.device_get(fn(fold_key(root, 999, 0), nv_c, nv_u))  # compile+warm
        t0 = time.perf_counter()
        outs = [fn(fold_key(root, int(snr*10), i), nv_c, nv_u) for i in range(8)]
        outs = jax.device_get(outs)
        dt = time.perf_counter() - t0
        fps = B * 8 / dt
        scl_err = sum(int(o["scl_errors"]) for o in outs)
        dl_err = sum(int(o["dl_errors"]) for o in outs)
        print(f"snr={snr} compact={compact:5d}: {dt*1000/8:8.2f} ms/chunk  {fps:10.0f} frames/s  scl_err={scl_err} dl_err={dl_err}", flush=True)
