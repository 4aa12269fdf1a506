"""Interleaved A/B timing of PAC-kernel variants on the TPU.

Same methodology as tools/ab_kernel.py (tunnel noise ±10-20% → interleaved
rounds, per-variant min): realistic operating-point LLRs, device-resolution
batch, outputs reduced on device.

    python tools/ab_pac.py --N 64 --Kp 32 --L 8 --variants "lazy:lazy_clone=True,fork:lazy_clone=False"
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=64)
    ap.add_argument("--Kp", type=int, default=32, help="payload bits (pre-CRC)")
    ap.add_argument("--L", type=int, nargs="+", default=[8])
    ap.add_argument("--crc_len", type=int, default=16)
    ap.add_argument("--crc_poly", type=lambda s: int(s, 0), default=0x1021)
    ap.add_argument("--gen", type=str, default="1011011")
    ap.add_argument("--profile", type=str, default="dega")
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--snr_db", type=float, default=2.5)
    ap.add_argument(
        "--variants", type=str,
        default="lazy:lazy_clone=True,fork:lazy_clone=False",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from polar_code_tpu.legacy.crclib import crc as crc_cls
    from polar_code_tpu.legacy.pac import pac_encode_batch
    from polar_code_tpu.legacy.pac_pallas import pac_list_decode_pallas
    from polar_code_tpu.legacy.rate_profile import rateprofile
    from polar_code_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    N, Kp = args.N, args.Kp
    gen = tuple(int(c) for c in args.gen)
    rp = rateprofile(N, Kp + args.crc_len, 2.0, 0)
    rp.build_mask(args.profile)
    mask = rp.modify_profile()

    B = args.batch
    rng = np.random.default_rng(0)
    # codewords from ≤4096 unique messages tiled to B (CRC attach is a
    # per-frame host loop); decode work is LLR-driven and every frame
    # gets independent noise, so the timing is unaffected
    Bu = min(B, 4096)
    msgs = rng.integers(0, 2, size=(Bu, Kp)).astype(np.int8)
    if args.crc_len:
        c = crc_cls(args.crc_len, args.crc_poly)
        full = np.concatenate(
            [msgs, np.stack([c.crcCalc(m) for m in msgs]).astype(np.int8)], axis=1
        )
    else:
        full = msgs
    x = np.asarray(pac_encode_batch(jnp.asarray(full), mask, gen, N))
    x = np.tile(x, (B // Bu + (B % Bu > 0), 1))[:B]
    nv = 1.0 / (2.0 * (Kp / N) * 10 ** (args.snr_db / 10.0))
    y = (1.0 - 2.0 * x) + rng.normal(0, np.sqrt(nv), size=x.shape)
    llr = jnp.asarray(2.0 * y / nv, jnp.float32)

    def _parse_val(v):
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

    for L in args.L:
        fns = {}
        for name, kw in variants.items():
            fn = jax.jit(
                lambda xx, L=L, kw=kw: pac_list_decode_pallas(
                    xx, mask, gen, L, crc_len=args.crc_len,
                    crc_poly=args.crc_poly, **kw
                )["crc_pass"].sum()
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
        line = f"N={N} L={L}: " + "  ".join(
            f"{k}={v*1e3:.2f}ms ({B/v:,.0f} fps)" for k, v in best.items()
        )
        if len(best) == 2:
            a, b = list(best.values())
            line += f"  ratio={b/a:.3f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
