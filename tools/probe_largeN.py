"""On-chip probe: SCL kernel at N=256/512 — compile viability, timing, sanity.

Usage: python /tmp/probe_largeN.py N M [full_unroll(0/1)] [batch]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N = int(sys.argv[1])
M = int(sys.argv[2])
full_unroll = bool(int(sys.argv[3])) if len(sys.argv) > 3 else None
batch = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
method = sys.argv[5] if len(sys.argv) > 5 else "gaussian"

import jax
import jax.numpy as jnp

from polar_code_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from polar_code_tpu import config
from polar_code_tpu.channel import awgn_llr, bpsk, noise_var_coded
from polar_code_tpu.ops.crc import attach_crc_batch
from polar_code_tpu.ops.polar_transform import encode_batch
from polar_code_tpu.ops.scl_pallas import decode_scl_pallas
from polar_code_tpu.polar.construct import construct_info_set

cfg = config.DEFAULTS
K = N // 2  # info+crc
info_set = construct_info_set(N, K, method=method)
payload_bits = K - cfg.crc_bits
snr_db = 5.0
nv = noise_var_coded(snr_db, K, N)


@jax.jit
def step(key):
    kp, kn = jax.random.split(key)
    payload = jax.random.bernoulli(kp, 0.5, (batch, payload_bits)).astype(jnp.int8)
    msg = attach_crc_batch(payload, cfg.crc_poly)
    code = encode_batch(msg, info_set, N)
    llr = awgn_llr(kn, bpsk(code), nv)
    out = decode_scl_pallas(llr, info_set, M, cfg.crc_poly, full_unroll=full_unroll)
    bits, crc_pass = out["best_path_bits"], out["crc_pass"]
    frame_ok = jnp.all(bits == msg, axis=1)
    return jnp.sum(crc_pass), jnp.sum(frame_ok)


t0 = time.perf_counter()
o = jax.device_get(step(jax.random.key(0)))
t_compile = time.perf_counter() - t0
print(f"N={N} M={M} full_unroll={full_unroll} batch={batch} construction={method}")
print(f"first-call (compile+run): {t_compile:.1f}s  crc_pass={int(o[0])}/{batch} frame_ok={int(o[1])}")

# pipelined timing: 8 dispatches per sync, min of 3
times = []
for rep in range(3):
    t0 = time.perf_counter()
    outs = [step(jax.random.key(100 * rep + i)) for i in range(8)]
    outs = jax.device_get(outs)
    times.append(time.perf_counter() - t0)
dt = min(times)
fps = batch * 8 / dt
print(f"steady: {dt*1000/8:.2f} ms/step ({batch} frames) = {fps:,.0f} frames/s")

# high-SNR sanity: everything must decode exactly
nv_hi = noise_var_coded(9.0, K, N)


@jax.jit
def step_hi(key):
    kp, kn = jax.random.split(key)
    payload = jax.random.bernoulli(kp, 0.5, (batch, payload_bits)).astype(jnp.int8)
    msg = attach_crc_batch(payload, cfg.crc_poly)
    code = encode_batch(msg, info_set, N)
    llr = awgn_llr(kn, bpsk(code), nv_hi)
    out = decode_scl_pallas(llr, info_set, M, cfg.crc_poly, full_unroll=full_unroll)
    return jnp.sum(jnp.all(out["best_path_bits"] == msg, axis=1))

ok = int(jax.device_get(step_hi(jax.random.key(7))))
print(f"9 dB exact-recovery: {ok}/{batch}")
