"""Subprocess worker for the multi-host integration test.

Launched by `tests/test_multihost.py` as one process of an N-process
`jax.distributed` CPU cluster (Gloo collectives over localhost), each process
exposing a configurable number of virtual CPU devices.  Runs the real FER
sweep CLI over the resulting global mesh — the same code path a TPU pod
slice would take via `maybe_distributed_init`.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--coordinator", type=str, default="")
    ap.add_argument("--devices_per_proc", type=int, required=True)
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--plot_dir", type=str, required=True)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--retries", type=int, default=2)
    ap.add_argument("--state", type=str, default=None)
    ap.add_argument("--snr_split", action="store_true")
    ap.add_argument("--snr_hi", type=float, default=2.0)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_proc}"
    )
    if args.num_processes > 1:
        # exercise maybe_distributed_init's env-var path
        os.environ["JAX_COORDINATOR_ADDRESS"] = args.coordinator
        os.environ["JAX_NUM_PROCESSES"] = str(args.num_processes)
        os.environ["JAX_PROCESS_ID"] = str(args.process_id)

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon sitecustomize workaround

    from polar_code_tpu.eval.run_fer_sweep import main as fer_main

    fer_main(
        [
            "--M", "1",
            "--frames", str(args.frames),
            "--batch", str(args.batch),
            "--retries", str(args.retries),
            "--snr_lo", "2.0",
            "--snr_hi", str(args.snr_hi),
            "--snr_step", "0" if args.snr_hi <= 2.0 else "0.5",
            "--out_dir", args.out_dir,
            "--plot_dir", args.plot_dir,
            *(["--state", args.state] if args.state else []),
            *(["--snr_split"] if args.snr_split else []),
        ]
    )
    sys.exit(0)


if __name__ == "__main__":
    main()
