"""Unified BER/FER sweep CLI across coding schemes.

Work-alike of `dl_scl_polar/eval/run_ber_sweep.py`: same four schemes
(`polar_scl`, `dl_scl`, `nr_polar_scl`, `nr_ldpc`), flags, payload-only BER
accounting, `avg_work` semantics (DL-SCL retries / LDPC iterations), CSV
schema and optional plot.  The per-frame while-loop becomes a host-side
stopping-rule controller over jit-compiled device chunks: simulate a batch,
pull back five scalar counters, repeat until `bit_errors ≥ err_cap` or
`bits_total ≥ bits_cap` (caps may overshoot by at most one chunk, as the
reference overshoots by one frame).
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict, Iterable, List, Optional

import numpy as np

from .. import config as global_config
from ..nr.ldpc import build_h_matrix, load_base_graph
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
from ..sim.pipeline import make_ber_chunk
from ..utils.seeding import fold_key, make_key, seed_all


def _resolve_base_graph(args: argparse.Namespace):
    """Demo graph by number (reference parity) or a real shift table by file.

    `--bg_file` loads a TS 38.212-style edge-list table (see
    `nr/ldpc/nr_tables.py`) lifted at `--Z`; `--bg ira<m>x<n>` generates a
    QC-IRA graph (`nr/ldpc/qc_ira.py` — a real waterfall, unlike the demo
    graph); otherwise `--bg` selects the built-in demo graph exactly as
    the reference does."""

    if getattr(args, "bg_file", None):
        from ..nr.ldpc.nr_tables import load_base_graph_file

        return load_base_graph_file(args.bg_file, args.Z)
    if str(args.bg).startswith("ira"):
        from ..nr.ldpc.qc_ira import make_qc_ira_bg, parse_ira_spec

        return make_qc_ira_bg(*parse_ira_spec(str(args.bg)), args.Z)
    return load_base_graph(int(args.bg))


def _noise_var(EbN0_dB: float, payload_bits: int, coded_bits: int) -> float:
    # Es/N0 = Eb/N0 · (K_payload/E): CRC bits count as overhead
    # (reference eval/run_ber_sweep.py:105-109).
    ebno_lin = 10 ** (EbN0_dB / 10.0)
    esn0_lin = ebno_lin * (payload_bits / coded_bits)
    return 1.0 / (2.0 * esn0_lin)


def run(args: argparse.Namespace) -> List[Dict[str, float]]:
    import jax

    from ..utils.cache import enable_compilation_cache

    seed_all(args.seed)
    enable_compilation_cache()
    maybe_distributed_init()
    coord = is_coordinator()

    N = args.N if args.N is not None else args.E
    K_total = args.K_payload + args.K_crc
    info_set = None
    H = None
    params_label = ""

    if args.scheme in {"polar_scl", "dl_scl", "nr_polar_scl"}:
        info_set = construct_info_set(N, K_total, method=args.construction)

    bg = None
    if args.scheme == "polar_scl":
        params_label = (
            f"M={args.M},adaptive_from={args.adaptive_from}"
            if args.adaptive_from
            else f"M={args.M}"
        )
    elif args.scheme == "dl_scl":
        params_label = f"M={args.M},retries={args.retries}"
    elif args.scheme == "nr_polar_scl":
        params_label = f"M={args.M},ilv={args.ilv_mode}"
    elif args.scheme == "nr_ldpc":
        bg = _resolve_base_graph(args)  # resolved once, reused for the chunk
        H = build_h_matrix(bg, args.Z)
        k = H.shape[1] - H.shape[0]
        if k != K_total:
            raise ValueError("LDPC payload+CRC size mismatch with base graph")
        bg_label = args.bg_file or f"bg={args.bg}"
        nms_label = ",exact_nms" if args.nms_exact else ""
        params_label = (
            f"{bg_label},Z={args.Z},iter={args.max_iter},alpha={args.alpha}{nms_label}"
        )
    else:
        raise ValueError(f"Unsupported scheme: {args.scheme}")

    beta = np.load(args.beta) if args.beta else None

    # Eb/N0-point split (multi-host): whole points assigned round-robin to
    # processes, each running on its local devices; merged bit-exactly below.
    snr_split = bool(getattr(args, "snr_split", False)) and jax.process_count() > 1
    if snr_split and args.state:
        raise ValueError("--state resume is not supported with --snr_split")
    if snr_split:
        n_dev = len(jax.local_devices())
        mesh = local_frames_mesh()
    else:
        n_dev = len(jax.devices())
        mesh = frames_mesh() if n_dev > 1 else None
    batch = max(n_dev, (args.batch // n_dev) * n_dev)

    chunk_fn = make_ber_chunk(
        scheme=args.scheme, E=args.E, N=N, K_payload=args.K_payload,
        K_crc=args.K_crc, crc_poly=args.crc_poly, info_set=info_set,
        M=args.M, retries=args.retries, beta=beta, ilv_mode=args.ilv_mode,
        H=H, max_iter=args.max_iter, alpha=args.alpha, batch=batch, mesh=mesh,
        ldpc_bg=bg,
        ldpc_Z=args.Z if args.scheme == "nr_ldpc" else None,
        nms_exact=args.nms_exact,
        compact=args.compact,
        adaptive_from=args.adaptive_from,
    )
    root_key = make_key(args.seed)

    from ..utils.resume import SweepState

    state = SweepState(
        args.state,
        {
            "sweep": "ber", "scheme": args.scheme, "K_payload": args.K_payload,
            "K_crc": args.K_crc, "E": args.E, "N": N, "M": args.M,
            "retries": args.retries, "seed": args.seed, "batch": batch,
            "err_cap": args.err_cap, "bits_cap": args.bits_cap,
            "beta": args.beta or "", "bg": args.bg,
            "bg_file": args.bg_file or "", "Z": args.Z,
            "max_iter": args.max_iter, "alpha": args.alpha,
            "nms_exact": args.nms_exact,
        },
        writer=coord,
    )

    EbN0_values = np.arange(args.EbN0_lo, args.EbN0_hi + 1e-12, args.EbN0_step)
    rows: List[Dict[str, float]] = []

    my_indices = split_points(len(EbN0_values)) if snr_split else range(len(EbN0_values))
    rows_by_idx: Dict[int, Dict[str, float]] = {}
    for point_idx in my_indices:
        EbN0_dB = EbN0_values[point_idx]
        cached = state.get(float(EbN0_dB))
        if cached is not None:
            rows.append(cached)
            continue
        nv = _noise_var(float(EbN0_dB), args.K_payload, args.E)
        acc = {"bit_errors": 0, "frame_errors": 0, "bits_total": 0, "frames": 0, "work_sum": 0.0}
        # keep one chunk in flight so host accounting overlaps device compute
        chunk_idx = 0

        def dispatch():
            nonlocal chunk_idx
            key = fold_key(root_key, point_idx, chunk_idx)
            chunk_idx += 1
            return chunk_fn(key, nv)

        inflight = [dispatch()]
        while acc["bit_errors"] < args.err_cap and acc["bits_total"] < args.bits_cap:
            while len(inflight) < 3:  # keep the device queue full
                inflight.append(dispatch())
            out = jax.device_get(inflight.pop(0))
            for k in acc:
                acc[k] += float(out[k]) if k == "work_sum" else int(out[k])
        del inflight  # speculative chunks past the caps are simply not counted

        ber = acc["bit_errors"] / acc["bits_total"] if acc["bits_total"] else float("nan")
        fer = acc["frame_errors"] / acc["frames"] if acc["frames"] else float("nan")
        avg_work = acc["work_sum"] / acc["frames"] if acc["frames"] else 0.0
        row = {
            "scheme": args.scheme,
            "code": args.scheme,
            "N_or_E": args.E,
            "K_payload": args.K_payload,
            "K_crc": args.K_crc,
            "rate": args.K_payload / args.E,
            "params": params_label,
            "EbN0_dB": float(EbN0_dB),
            "bits_total": acc["bits_total"],
            "bit_errors": acc["bit_errors"],
            "ber": ber,
            "fer": fer,
            "avg_work": avg_work,
        }
        state.record(float(EbN0_dB), row)
        rows_by_idx[point_idx] = row
        rows.append(row)

    if snr_split:
        # merge the numeric fields across processes (collective); the
        # metadata columns are identical everywhere and rebuilt locally
        fields = ["EbN0_dB", "bits_total", "bit_errors", "ber", "fer", "avg_work"]
        table = np.zeros((len(EbN0_values), len(fields)), np.float64)
        for pi, row in rows_by_idx.items():
            table[pi] = [row[f] for f in fields]
        table = allgather_table_exact(table)
        rows = []
        for i in range(len(EbN0_values)):
            merged = dict(zip(fields, table[i]))
            merged["bits_total"] = int(merged["bits_total"])
            merged["bit_errors"] = int(merged["bit_errors"])
            rows.append({
                "scheme": args.scheme, "code": args.scheme, "N_or_E": args.E,
                "K_payload": args.K_payload, "K_crc": args.K_crc,
                "rate": args.K_payload / args.E, "params": params_label,
                **merged,
            })
    return rows


def write_csv(rows: List[Dict[str, float]], path: Path) -> None:
    if not rows:
        return
    header = [
        "scheme", "code", "N_or_E", "K_payload", "K_crc", "rate", "params",
        "EbN0_dB", "bits_total", "bit_errors", "ber", "fer", "avg_work",
    ]
    with path.open("w") as f:
        f.write(",".join(header) + "\n")
        for row in rows:
            f.write(",".join(str(row[col]) for col in header) + "\n")


def plot_rows(rows: List[Dict[str, float]], path: Path) -> None:
    if not rows:
        return
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows_sorted = sorted(rows, key=lambda r: r["EbN0_dB"])
    snrs = [r["EbN0_dB"] for r in rows_sorted]
    plt.figure(figsize=(6, 4))
    plt.semilogy(snrs, [r["ber"] for r in rows_sorted], "o-", label="BER")
    plt.semilogy(snrs, [r["fer"] for r in rows_sorted], "s-", label="FER")
    plt.xlabel("Eb/N0 (dB)")
    plt.ylabel("Error Rate")
    plt.grid(True, which="both", ls="--", alpha=0.4)
    plt.legend()
    plt.tight_layout()
    path.parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(path, dpi=200)
    plt.close()


def parse_args(argv: Optional[Iterable[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="BER/FER sweep across schemes")
    parser.add_argument("--scheme", required=True, choices=["polar_scl", "dl_scl", "nr_polar_scl", "nr_ldpc"], help="Coding scheme")
    parser.add_argument("--K_payload", type=int, required=True, help="Payload bits per frame")
    parser.add_argument("--K_crc", type=int, required=True, help="CRC bits per frame")
    parser.add_argument("--E", type=int, required=True, help="Coded bits transmitted")
    parser.add_argument("--N", type=int, help="Polar length before rate match (defaults to E)")
    parser.add_argument(
        "--construction",
        type=str,
        default="gaussian",
        choices=["gaussian", "gaussian_bitrev", "polarization"],
        help="Info-set construction. 'gaussian' replicates the reference's "
        "DEGA (near-optimal at N=128 but degrading for larger codes — its "
        "recursion indexes channels in bit-reversed order); use "
        "'gaussian_bitrev' or 'polarization' for N > 128.",
    )
    parser.add_argument("--crc_poly", type=str, default=global_config.DEFAULTS.crc_poly)
    parser.add_argument("--M", type=int, default=4, help="List size for polar decoders")
    parser.add_argument(
        "--adaptive_from", type=int, default=0,
        help="polar_scl only: two-stage adaptive decode — first pass at "
        "this list size, CRC failures re-decoded at --M (legacy "
        "simulator.py:111-116 semantics, device-side compaction). 0 = off. "
        "avg_work reports the re-decoded fraction.",
    )
    parser.add_argument("--retries", type=int, default=8, help="Retries for DL-SCL")
    parser.add_argument("--beta", type=str, help="Path to beta matrix (DL-SCL)")
    parser.add_argument("--ilv_mode", type=str, default="default")
    parser.add_argument(
        "--nms_exact", action="store_true",
        help="textbook two-min layered NMS (self-excluding extrinsics) "
        "instead of the reference's shared-min simplification — required "
        "for a meaningful LDPC waterfall (see nr/ldpc/decode_nms.py)",
    )
    parser.add_argument(
        "--bg", type=str, default="2",
        help="LDPC base graph: demo graph number (1/2, reference parity) or "
        "'ira<m>x<n>' for a generated QC-IRA code (e.g. ira4x8)",
    )
    parser.add_argument(
        "--bg_file", type=str, default=None,
        help="External LDPC shift table (edge-list CSV, per-iLS or single "
             "column; e.g. real TS 38.212 BG1/BG2 tables), lifted at --Z",
    )
    parser.add_argument("--Z", type=int, default=2, help="LDPC lifting size")
    parser.add_argument("--max_iter", type=int, default=20)
    parser.add_argument("--alpha", type=float, default=0.8)
    parser.add_argument("--EbN0_lo", type=float, required=True)
    parser.add_argument("--EbN0_hi", type=float, required=True)
    parser.add_argument("--EbN0_step", type=float, default=0.5)
    parser.add_argument("--bits_cap", type=float, default=1e7)
    parser.add_argument("--err_cap", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, required=True, help="CSV output path")
    parser.add_argument("--plot", type=str, help="Optional plot path")
    parser.add_argument("--batch", type=int, default=2048, help="Frames per device chunk")
    parser.add_argument(
        "--state", type=str, default=None,
        help="Optional JSON state file for checkpoint/resume of sweep points",
    )
    parser.add_argument(
        "--compact", type=int, default=-1,
        help="Device-side retry compaction capacity for dl_scl (frames per "
             "retry chunk; 0 = masked full-batch retries)",
    )
    parser.add_argument(
        "--snr_split", action="store_true",
        help="Multi-host: assign whole Eb/N0 points to processes round-robin "
             "(each on its local devices, no per-chunk DCN collectives); "
             "rows are merged bit-exactly at the end. No-op single-process.",
    )
    args = parser.parse_args(list(argv) if argv is not None else None)

    if args.scheme == "dl_scl" and not args.beta:
        raise ValueError("--beta is required for dl_scl scheme")
    return args


def main(argv: Optional[Iterable[str]] = None) -> None:
    args = parse_args(argv)
    rows = run(args)
    if is_coordinator():
        out_path = Path(args.out)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        write_csv(rows, out_path)
        if args.plot:
            plot_rows(rows, Path(args.plot))
    sync_processes("ber_sweep_end")


if __name__ == "__main__":
    main()
