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
    ap.add_argument("--N", type=int, default=None, help="code length (default config)")
    ap.add_argument("--K", type=int, default=None, help="info+CRC bits (default config)")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--snr_db", type=float, default=5.0)
    ap.add_argument(
        "--variants", type=str, default="full:full_unroll=True,pairloop:full_unroll=False",
        help="comma-separated name:kw=val[;kw=val...] decode_scl_pallas kwargs, "
        "e.g. 'u2:full_unroll=False;loop_unroll=2,u8:full_unroll=False;loop_unroll=8'",
    )
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
    N = args.N or cfg.N
    K = args.K or cfg.K
    construction = "gaussian" if N <= 128 else "gaussian_bitrev"
    info_set = construct_info_set(N, K, method=construction)
    B = args.batch
    # realistic operating-point LLRs (decode work is data-dependent: the
    # identity-permutation skip rate depends on channel conditions)
    kp, kn = jax.random.split(jax.random.key(0))
    payload = jax.random.bernoulli(kp, 0.5, (B, K - cfg.crc_bits)).astype(jnp.int8)
    msg = attach_crc_batch(payload, cfg.crc_poly)
    code = encode_batch(msg, info_set, N)
    llr = awgn_llr(kn, bpsk(code), noise_var_coded(args.snr_db, K, N))
    llr = jax.device_get(llr)
    llr = jnp.asarray(llr, jnp.float32)

    def _parse_val(v: str):
        if v in ("True", "False", "None"):
            return {"True": True, "False": False, "None": None}[v]
        try:
            return int(v)
        except ValueError:
            return v

    variants = {}
    for spec in args.variants.split(","):
        name, _, kws = spec.partition(":")
        variants[name] = {
            k: _parse_val(v)
            for k, _, v in (kw.partition("=") for kw in kws.split(";") if kw)
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
