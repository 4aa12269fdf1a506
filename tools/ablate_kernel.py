"""Fine-grained stage attribution of the SCL kernel via SCL_KERNEL_ABLATE.

Each ablation config is a different Mosaic program, and the kernel reads
SCL_KERNEL_ABLATE at import — so every config runs in its own subprocess.
Reports min-of-rounds device-resolution time (64k frames/call: tunnel
dispatch overhead ≲3%) and the delta vs the un-ablated baseline.

    python tools/ablate_kernel.py --M 8                  # single-stage table
    python tools/ablate_kernel.py --M 8 --configs floor  # skeleton floor

Ablated kernels produce WRONG results — timing attribution only.
"""

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from polar_code_tpu import config
from polar_code_tpu.polar.construct import construct_info_set
from polar_code_tpu.ops.scl_pallas import decode_scl_pallas
from polar_code_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
cfg = config.DEFAULTS
N, K, M, B = {N}, {K}, {M}, {B}
info_set = construct_info_set(N, K)
rng = np.random.default_rng(0)
llr = jnp.asarray(rng.normal(0, 5, size=(B, N)), jnp.float32)
fn = jax.jit(lambda x: decode_scl_pallas(
    x, info_set, M, cfg.crc_poly, full_unroll={full_unroll})["crc_pass"].sum())
jax.device_get(fn(llr))  # compile + warm
best = float("inf")
for _ in range({rounds}):
    t0 = time.perf_counter()
    outs = [fn(llr) for _ in range({iters})]
    jax.device_get(outs)
    best = min(best, (time.perf_counter() - t0) / {iters})
print("RESULT " + json.dumps({{"ms": best * 1e3}}))
"""


def run_config(ablate: str, args) -> float:
    env = dict(os.environ)
    env["SCL_KERNEL_ABLATE"] = ablate
    code = _CHILD.format(
        repo=str(REPO), N=args.N, K=args.K, M=args.M, B=args.batch,
        rounds=args.rounds, iters=args.iters,
        full_unroll=args.full_unroll,
    )
    p = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])["ms"]
    raise RuntimeError(
        f"config {ablate!r} failed:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    )


SINGLES = [
    "clone", "sort", "crc", "backtrack", "propagate", "fg",
    "traces", "metric", "forkmath", "frozen",
]
# everything ablatable off: what's left is init + final sort + output writes
# + the Mosaic pipeline itself (the "skeleton floor")
FLOOR = "fg,fork,frozen,propagate,backtrack,crc,traces"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=8)
    ap.add_argument("--N", type=int, default=128)
    ap.add_argument("--K", type=int, default=64)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--full_unroll", default="None",
                    help="None (auto) / True / False")
    ap.add_argument("--configs", default="singles",
                    choices=["singles", "floor", "both"])
    args = ap.parse_args()

    base = run_config("", args)
    print(f"baseline           {base:8.2f} ms   ({args.batch/base*1e3:,.0f} fps)")
    rows = []
    if args.configs in ("singles", "both"):
        rows += SINGLES
    if args.configs in ("floor", "both"):
        rows += [FLOOR, FLOOR + ",clone,sort"]
    for ab in rows:
        t = run_config(ab, args)
        name = ab if len(ab) < 19 else "FLOOR(" + str(ab.count(",") + 1) + ")"
        print(
            f"-{name:<18}{t:8.2f} ms   delta {base - t:+7.2f} ms "
            f"({(base - t) / base * 100:5.1f}%)"
        )


if __name__ == "__main__":
    main()
