"""Capture a TensorBoard-compatible device trace of one headline bench step.

Runs the same jit-compiled Monte-Carlo sim+decode step as bench.py's
headline metric (plain SCL M=8 P(128,64) through the fused kernel) under
`utils/profiling.py::trace` and writes the trace to
`results_validation/trace_scl_m8/` — the committed utilization artifact
referenced by docs/ROOFLINE.md.

Run (TPU):  python tools/capture_trace.py [--batch 65536] [--steps 3]

If the backend does not support jax.profiler (some tunneled backends
don't), the tool says so and exits non-zero rather than committing an
empty directory.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument(
        "--out", default=str(Path(__file__).resolve().parent.parent
                            / "results_validation" / "trace_scl_m8")
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
    from polar_code_tpu.utils.cache import enable_compilation_cache
    from polar_code_tpu.utils.profiling import trace

    enable_compilation_cache()
    cfg = config.DEFAULTS
    info_set = construct_info_set(cfg.N, cfg.K)
    nv = noise_var_coded(5.0, cfg.K, cfg.N)

    @jax.jit
    def step(key):
        kp, kn = jax.random.split(key)
        payload = jax.random.bernoulli(
            kp, 0.5, (args.batch, cfg.K - cfg.crc_bits)
        ).astype(jnp.int8)
        msg = attach_crc_batch(payload, cfg.crc_poly)
        code = encode_batch(msg, info_set, cfg.N)
        llr = awgn_llr(kn, bpsk(code), nv)
        out = decode_scl_pallas(llr, info_set, 8, cfg.crc_poly)
        return out["crc_pass"].sum()

    # compile outside the trace so the artifact shows steady-state steps
    jax.device_get(step(jax.random.key(0)))

    with trace(args.out):
        for i in range(args.steps):
            jax.device_get(step(jax.random.key(1 + i)))

    outdir = Path(args.out)
    produced = [p for p in outdir.rglob("*") if p.is_file()] if outdir.exists() else []
    if not produced:
        print("no trace files produced — backend lacks jax.profiler support")
        return 1
    total = sum(p.stat().st_size for p in produced)
    print(f"trace written: {len(produced)} files, {total/1e6:.1f} MB under {outdir}")
    for p in sorted(produced)[:10]:
        print(" ", p.relative_to(outdir))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
