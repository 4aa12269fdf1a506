"""FER sweep CLI comparing baseline SCL and DL-SCL with β-guided flips.

Work-alike of `dl_scl_polar/eval/run_fer_sweep.py`: identical flags, stdout
lines, CSV schema (`snr_db[,fer_uncoded,ber_uncoded],fer_scl,ber_scl,
fer_dl,ber_dl`) and semilogy PNG — but the Monte-Carlo loop is a batched,
jit-compiled device pipeline processing thousands of frames per step,
sharded over all available devices, instead of a per-frame Python loop.

Frame counts are rounded up to a whole number of device chunks; FER/BER are
normalized by the frames actually simulated (statistically identical to the
reference protocol).
"""

from __future__ import annotations

import argparse

import time
from pathlib import Path
from typing import Dict, List

import numpy as np

from .. import config
from ..channel import noise_var_coded, noise_var_uncoded
from ..parallel.mesh import (
    allgather_table_exact,
    frames_mesh,
    is_coordinator,
    local_frames_mesh,
    maybe_distributed_init,
    split_points,
    sync_processes,
)
from ..polar.construct import construct_info_set
from ..sim.pipeline import make_fer_chunk
from ..utils.seeding import fold_key, make_key, seed_all


def run_sweep(args: argparse.Namespace) -> None:
    import jax

    from ..utils.cache import enable_compilation_cache

    cfg = config.get_config()
    seed_all(args.seed)
    enable_compilation_cache()
    maybe_distributed_init()
    coord = is_coordinator()
    say = print if coord else (lambda *a, **k: None)

    if getattr(args, "N", None):
        cfg.N = args.N
    if getattr(args, "K", None):
        cfg.K = args.K
    config.validate_code_shape(cfg.N, cfg.K, cfg.crc_bits)
    info_set = construct_info_set(
        cfg.N, cfg.K, method=getattr(args, "construction", "gaussian")
    )

    snr_points = (
        np.arange(args.snr_lo, args.snr_hi + 1e-9, args.snr_step)
        if args.snr_step > 0
        else np.array([args.snr_lo])
    )

    beta = np.load(args.beta) if args.beta else None

    # Eb/N0-point split (multi-host): each process simulates whole sweep
    # points on its LOCAL devices (no per-chunk DCN collectives); rows are
    # merged bit-exactly at the end.  Per-point keys fold only on the SNR
    # tag and chunk index, so the merged CSV is byte-identical to an
    # unsplit run at the same --batch.
    snr_split = bool(getattr(args, "snr_split", False)) and jax.process_count() > 1
    if snr_split and args.state:
        raise ValueError("--state resume is not supported with --snr_split")
    if snr_split:
        n_dev = len(jax.local_devices())
        mesh = local_frames_mesh()
    else:
        n_dev = len(jax.devices())
        mesh = frames_mesh() if n_dev > 1 else None
    batch = min(args.batch, max(args.frames, 1))
    batch = max(n_dev, (batch // n_dev) * n_dev)

    chunk_fn = make_fer_chunk(
        N=cfg.N, K=cfg.K, crc_poly=cfg.crc_poly, info_set=info_set,
        M=args.M, retries=args.retries, beta=beta, batch=batch,
        include_uncoded=args.include_uncoded, mesh=mesh,
        compact=args.compact,
    )
    root_key = make_key(args.seed)

    from ..utils.resume import SweepState

    state = SweepState(
        args.state,
        {
            "sweep": "fer", "M": args.M, "frames": args.frames,
            "retries": args.retries, "seed": args.seed, "batch": batch,
            "beta": args.beta or "", "include_uncoded": bool(args.include_uncoded),
        },
        writer=coord,
    )

    results: List[Dict[str, float]] = []
    t_start = time.perf_counter()
    frames_done = 0

    my_indices = split_points(len(snr_points)) if snr_split else range(len(snr_points))
    rows_by_idx: Dict[int, Dict[str, float]] = {}
    for point_idx in my_indices:
        snr_db = snr_points[point_idx]
        cached = state.get(float(snr_db))
        if cached is not None:
            say(f"SNR={snr_db:.2f} dB -> resumed from state")
            results.append(cached)
            continue
        nv_c = noise_var_coded(float(snr_db), cfg.K, cfg.N)
        nv_u = noise_var_uncoded(float(snr_db))
        snr_tag = int(round(float(snr_db) * 10))

        acc: Dict[str, int] = {}
        total_frames = 0
        # dispatch all chunks asynchronously (fixed frame budget), sync once
        pending = []
        chunk_idx = 0
        while total_frames < args.frames:
            key = fold_key(root_key, snr_tag, chunk_idx)
            pending.append(chunk_fn(key, nv_c, nv_u))
            total_frames += batch
            chunk_idx += 1
        for out in jax.device_get(pending):
            for k, v in out.items():
                acc[k] = acc.get(k, 0) + int(v)
        frames_done += total_frames

        row = {
            "snr_db": float(snr_db),
            "fer_scl": acc["scl_errors"] / total_frames,
            "fer_dl": acc["dl_errors"] / total_frames,
            "ber_scl": acc["scl_bit_errors"] / acc["bits_coded"],
            "ber_dl": acc["dl_bit_errors"] / acc["bits_coded"],
        }
        if args.include_uncoded:
            row["fer_uncoded"] = acc["uncoded_errors"] / total_frames
            row["ber_uncoded"] = acc["uncoded_bit_errors"] / acc["bits_uncoded"]
            say(
                f"SNR={snr_db:.2f} dB -> Uncoded FER={row['fer_uncoded']:.3e}, "
                f"BER={row['ber_uncoded']:.3e}; "
                f"SCL FER={row['fer_scl']:.3e}, BER={row['ber_scl']:.3e}; "
                f"DL FER={row['fer_dl']:.3e}, BER={row['ber_dl']:.3e}"
            )
        else:
            say(
                f"SNR={snr_db:.2f} dB -> SCL FER={row['fer_scl']:.3e}, "
                f"BER={row['ber_scl']:.3e}; "
                f"DL FER={row['fer_dl']:.3e}, BER={row['ber_dl']:.3e}"
            )
        state.record(float(snr_db), row)
        rows_by_idx[point_idx] = row
        results.append(row)

    if snr_split:
        # merge the distributed rows (collective: every process participates)
        fields = ["snr_db", "fer_scl", "ber_scl", "fer_dl", "ber_dl"]
        if args.include_uncoded:
            fields += ["fer_uncoded", "ber_uncoded"]
        table = np.zeros((len(snr_points), len(fields)), np.float64)
        for pi, row in rows_by_idx.items():
            table[pi] = [row[f] for f in fields]
        table = allgather_table_exact(table)
        results = [dict(zip(fields, table[i])) for i in range(len(snr_points))]

    elapsed = time.perf_counter() - t_start
    if elapsed > 0:
        say(
            f"Simulated {frames_done} frames in {elapsed:.2f}s "
            f"({frames_done / elapsed:.0f} frames/s on {n_dev} device(s))"
        )

    if not coord:
        sync_processes("fer_sweep_end")
        return

    output_dir = Path(args.out_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    csv_path = output_dir / f"fer_M{args.M}.csv"
    with csv_path.open("w") as f:
        headers = ["snr_db"]
        if args.include_uncoded:
            headers.extend(["fer_uncoded", "ber_uncoded"])
        headers.extend(["fer_scl", "ber_scl", "fer_dl", "ber_dl"])
        f.write(",".join(headers) + "\n")
        for row in results:
            values = [f"{row['snr_db']:.3f}"]
            if args.include_uncoded:
                values.extend([
                    f"{row['fer_uncoded']:.6e}",
                    f"{row['ber_uncoded']:.6e}",
                ])
            values.extend([
                f"{row['fer_scl']:.6e}",
                f"{row['ber_scl']:.6e}",
                f"{row['fer_dl']:.6e}",
                f"{row['ber_dl']:.6e}",
            ])
            f.write(",".join(values) + "\n")
    say(f"Saved FER table to {csv_path}")

    plot_dir = Path(args.plot_dir)
    plot_dir.mkdir(parents=True, exist_ok=True)
    plot_path = plot_dir / f"fer_M{args.M}.png"
    _plot(results, plot_path, args.include_uncoded)
    say(f"Saved FER plot to {plot_path}")
    sync_processes("fer_sweep_end")


def _plot(results: List[Dict[str, float]], plot_path: Path, include_uncoded: bool) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(6, 4))
    snrs = [row["snr_db"] for row in results]
    keys = (("fer_uncoded",) if include_uncoded else ()) + ("fer_scl", "fer_dl")
    # semilogy warns on all-zero data (tiny smoke-test sweeps) — fall back
    # to a linear axis there
    draw = plt.plot if all(
        row[k] == 0.0 for row in results for k in keys
    ) else plt.semilogy
    if include_uncoded:
        draw(snrs, [row["fer_uncoded"] for row in results], "^-", label="Uncoded")
    draw(snrs, [row["fer_scl"] for row in results], "o-", label="SCL")
    draw(snrs, [row["fer_dl"] for row in results], "s-", label="DL-SCL")
    plt.xlabel("Eb/N0 (dB)")
    plt.ylabel("Frame Error Rate")
    plt.grid(True, which="both", ls="--", alpha=0.4)
    plt.legend()
    plt.tight_layout()
    plt.savefig(plot_path, dpi=200)
    plt.close()


def build_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Run FER sweep for DL-SCL")
    parser.add_argument("--M", type=int, required=True, help="List size")
    parser.add_argument("--N", type=int, help="Code length (default: config, 128)")
    parser.add_argument("--K", type=int, help="Info+CRC bits (default: config, 64)")
    parser.add_argument(
        "--construction", type=str, default="gaussian",
        choices=["gaussian", "gaussian_bitrev", "polarization"],
        help="Info-set construction (use gaussian_bitrev/polarization for N>128)",
    )
    parser.add_argument("--frames", type=int, default=10000, help="Frames per SNR point")
    parser.add_argument("--snr_lo", type=float, default=4.0)
    parser.add_argument("--snr_hi", type=float, default=6.5)
    parser.add_argument("--snr_step", type=float, default=0.5)
    parser.add_argument("--retries", type=int, default=8)
    parser.add_argument("--beta", type=str, help="Path to trained β matrix (.npy)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out_dir", type=str, default="results")
    parser.add_argument("--plot_dir", type=str, default="plots")
    parser.add_argument(
        "--include_uncoded",
        action="store_true",
        help="Also simulate an uncoded BPSK baseline",
    )
    parser.add_argument(
        "--batch", type=int, default=4096,
        help="Device batch (frames per jit step, rounded to the device count)",
    )
    parser.add_argument(
        "--state", type=str, default=None,
        help="Optional JSON state file: completed Eb/N0 points are recorded "
             "and skipped on re-run (checkpoint/resume for long sweeps)",
    )
    parser.add_argument(
        "--compact", type=int, default=-1,
        help="Device-side retry compaction capacity (frames per retry chunk; "
             "0 = masked full-batch retries). Results are identical; big "
             "speedup at SNRs where baseline failures are rare",
    )
    parser.add_argument(
        "--snr_split", action="store_true",
        help="Multi-host: assign whole Eb/N0 points to processes round-robin "
             "(each on its local devices, no per-chunk DCN collectives) "
             "instead of sharding frames globally; rows are merged "
             "bit-exactly at the end. No-op single-process.",
    )
    return parser


def main(argv: List[str] | None = None) -> None:
    args = build_argparser().parse_args(argv)
    run_sweep(args)


if __name__ == "__main__":
    main()
