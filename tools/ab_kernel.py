"""Interleaved A/B timing of SCL-kernel variants on the TPU.

The tunnel's timing noise is ±10-20%, so variants are timed in interleaved
rounds and the per-variant MIN over rounds is reported (min-of-many is the
noise-robust statistic for a deterministic workload).

    python tools/ab_kernel.py --M 8 --variants packed,batcher
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, nargs="+", default=[8, 4, 2, 1])
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--snr_db", type=float, default=5.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from polar_code_tpu import config
    from polar_code_tpu.channel import awgn_llr, bpsk, noise_var_coded
    from polar_code_tpu.ops.crc import attach_crc_batch
    from polar_code_tpu.ops.polar_transform import encode_batch
    from polar_code_tpu.ops.scl_pallas import decode_scl_pallas
    from polar_code_tpu.polar.construct import construct_info_set

    cfg = config.DEFAULTS
    info_set = construct_info_set(cfg.N, cfg.K)
    B = args.batch
    # realistic operating-point LLRs (decode work is data-dependent: the
    # identity-permutation skip rate depends on channel conditions)
    kp, kn = jax.random.split(jax.random.key(0))
    payload = jax.random.bernoulli(kp, 0.5, (B, cfg.K - cfg.crc_bits)).astype(jnp.int8)
    msg = attach_crc_batch(payload, cfg.crc_poly)
    code = encode_batch(msg, info_set, cfg.N)
    llr = awgn_llr(kn, bpsk(code), noise_var_coded(args.snr_db, cfg.K, cfg.N))
    llr = jax.device_get(llr)
    llr = jnp.asarray(llr, jnp.float32)

    variants = {
        "full": dict(full_unroll=True),
        "pairloop": dict(full_unroll=False),
    }
    for M in args.M:
        fns = {}
        for name, kw in variants.items():
            fn = jax.jit(
                lambda x, M=M, kw=kw: decode_scl_pallas(
                    x, info_set, M, cfg.crc_poly, **kw
                )["crc_pass"]
            )
            jax.device_get(fn(llr))  # compile + warm
            fns[name] = fn
        best = {k: float("inf") for k in fns}
        for _ in range(args.rounds):
            for name, fn in fns.items():
                t0 = time.perf_counter()
                outs = [fn(llr) for _ in range(args.iters)]
                jax.device_get(outs)
                best[name] = min(best[name], (time.perf_counter() - t0) / args.iters)
        line = f"M={M}: " + "  ".join(
            f"{k}={v*1e3:.2f}ms ({B/v:,.0f} fps)" for k, v in best.items()
        )
        if len(best) == 2:
            a, b = list(best.values())
            line += f"  ratio={b/a:.3f}"
        print(line)


if __name__ == "__main__":
    main()
