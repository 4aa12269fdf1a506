"""Dataset generation for β flip-metric training.

Work-alike of `dl_scl_polar/train/make_dataset.py`: transmit the all-zero
payload codeword at the given Eb/N0, keep frames where baseline SCL fails
the CRC, and label each with the first flip index (in ascending-|L0| order,
≤ 8 attempts) whose forced retry recovers the true info word.  Same `.npz`
shard schema (`abs_l0` f32[S,K], `flip_idx` i32[S], `meta` json).

TPU-native form: frames are simulated in device batches; the oracle search
is a `lax.scan` over the 8 attempts whose body is the batched forced-SCL
decoder with per-frame masks — the nested decode-inside-decode loop of the
reference becomes one compiled graph.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import List

import numpy as np

from .. import config
from ..channel import awgn_llr, noise_var_coded
from ..ops.crc import attach_crc
from ..ops.polar_transform import encode_batch
from ..polar.construct import construct_info_set
from ..utils.seeding import fold_key, make_key, seed_all


def _make_oracle_chunk(
    cfg, info_set, M: int, batch: int, max_attempts: int, compact: int = 0,
    out_cap: int = 0,
):
    import jax
    import jax.numpy as jnp

    from ..ops.backend import make_scl_decoder, stable_partition_perm

    info_np = np.asarray(info_set)
    K = int(info_np.size)
    B = batch
    C = min(int(compact), B) if compact else 0
    # labeled-row output capacity: B/4 covers even the reference's
    # highest-yield regime (M=1 at 5 dB labels ~19% of frames); the
    # generator detects overflow per chunk and errors with guidance
    out_cap = min(B, int(out_cap) if out_cap else max(256, B // 4))

    _decode_full = make_scl_decoder(
        info_np, M, cfg.crc_poly, batch=B, dtype=jnp.float32, N=cfg.N
    )
    _decode_chunk = (
        make_scl_decoder(info_np, M, cfg.crc_poly, batch=C, dtype=jnp.float32, N=cfg.N)
        if C
        else _decode_full
    )
    payload = np.zeros(cfg.K - cfg.crc_bits, dtype=np.int8)
    info_bits = attach_crc(payload, cfg.crc_poly)
    # encode with THIS chunk's (N, info_set) — the scalar polar.api.encode
    # is pinned to the default P(128,64) config
    code = np.asarray(
        encode_batch(jnp.asarray(info_bits.astype(np.int8))[None], info_np, cfg.N)[0],
        dtype=np.int8,
    )
    symbols = jnp.asarray(1.0 - 2.0 * code.astype(np.float32))
    info_vec = jnp.asarray(info_bits.astype(np.int32))
    pos = jnp.arange(K)[None, :]

    def _oracle_scan(llr_n, best_bits_n, order_n, decode_n):
        """≤ max_attempts forced retries on an [n]-frame slab."""

        n = llr_n.shape[0]

        def body(carry, j):
            found, label = carry
            idx = order_n[:, j]
            flip_bit = (1 - jnp.take_along_axis(best_bits_n, idx[:, None], axis=1)).astype(jnp.int8)
            forced = jnp.where(pos < idx[:, None], best_bits_n, jnp.int8(-1))
            forced = jnp.where(pos == idx[:, None], flip_bit, forced)
            r_bits, _, r_pass = decode_n(llr_n, forced)
            ok = r_pass & jnp.all(
                r_bits.astype(jnp.int32) == info_vec[None, :], axis=1
            )
            newly = ~found & ok
            label = jnp.where(newly, idx.astype(jnp.int32), label)
            return (found | ok, label), None

        (found, label), _ = jax.lax.scan(
            body,
            (jnp.zeros((n,), bool), jnp.zeros((n,), jnp.int32)),
            jnp.arange(max_attempts),
        )
        return found, label

    def chunk(key, noise_var):
        llr = awgn_llr(key, jnp.broadcast_to(symbols, (B, cfg.N)), noise_var)
        best_bits, best_llrs, crc_pass = _decode_full(llr)
        fail = ~crc_pass
        abs_l0 = jnp.abs(best_llrs)  # [B, K]
        # only the max_attempts smallest-|L0| indices are ever tried: top_k
        # beats the full row argsort ~50× on TPU (23 vs 1145 ms at
        # [8192, 512]; the full sort made N=1024 dataset generation
        # argsort-bound).  top_k on the negated values yields ascending
        # |L0| with the same lowest-index tie-break as a stable argsort.
        order = jax.lax.top_k(-abs_l0, max_attempts)[1].astype(jnp.int32)

        if not C:
            found, label = _oracle_scan(llr, best_bits, order, _decode_full)
        else:
            # Only failed frames need the oracle search: gather them into
            # fixed-capacity slabs on-device (same scheme as the retry
            # compaction in dlscl/flip.py), search, scatter labels back.
            count = jnp.sum(fail.astype(jnp.int32))
            perm = stable_partition_perm(~fail)
            nchunks = (count + C - 1) // C

            def cond(c):
                return c[0] < nchunks

            def slab(c):
                i, found, label = c
                offs = i * C + jnp.arange(C, dtype=jnp.int32)
                valid = offs < count
                sel_raw = perm[jnp.minimum(offs, B - 1)]
                sel = jnp.where(valid, sel_raw, B)  # B = dropped
                f_c, l_c = _oracle_scan(
                    llr[sel_raw], best_bits[sel_raw], order[sel_raw], _decode_chunk
                )
                found = found.at[sel].set(f_c, mode="drop")
                label = label.at[sel].set(l_c, mode="drop")
                return (i + 1, found, label)

            _, found, label = jax.lax.while_loop(
                cond,
                slab,
                (jnp.int32(0), jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32)),
            )
        # Compact the outputs on-device to the labeled rows only: the full
        # [B, K] |L0| plane is dead weight for every unlabeled frame, and
        # device→host bandwidth is the binding constraint on this loop
        # (at B=32768, K=512 the uncompacted plane is 64 MB/chunk — the
        # transfer alone ran the whole generator at ~7k frames/s; the
        # compacted outputs are ~2 MB and the decode becomes the
        # bottleneck again).
        labeled = fail & found
        lab_first = stable_partition_perm(~labeled)  # labeled frames first
        sel = lab_first[:out_cap]
        return {
            "fail": fail,
            "n_labeled": jnp.sum(labeled.astype(jnp.int32)),
            "lab_idx": sel,
            "label": label[sel],
            "abs_l0": abs_l0[sel].astype(jnp.float32),
        }

    return jax.jit(chunk)


def generate_samples(args: argparse.Namespace) -> None:
    import jax

    cfg = config.get_config()
    if getattr(args, "N", None):
        cfg.N = args.N
    if getattr(args, "K", None):
        cfg.K = args.K
    config.validate_code_shape(cfg.N, cfg.K, cfg.crc_bits)
    construction = getattr(args, "construction", "gaussian")
    from ..utils.cache import enable_compilation_cache

    seed_all(args.seed)
    enable_compilation_cache()
    info_set = construct_info_set(cfg.N, cfg.K, method=construction)
    noise_var = noise_var_coded(args.snr_db, cfg.K, cfg.N)

    from ..ops.backend import auto_compact_capacity

    batch = min(args.batch, max(args.frames, 1))
    max_attempts = min(8, cfg.K)
    chunk_fn = _make_oracle_chunk(
        cfg, info_set, args.M, batch, max_attempts,
        compact=auto_compact_capacity(args.compact, batch),
        out_cap=getattr(args, "out_cap", 0),
    )
    root_key = make_key(args.seed)

    abs_l0_samples: List[np.ndarray] = []
    labels: List[int] = []
    failures = 0
    frames_done = 0
    chunk_idx = 0
    window: List = []  # keep several chunks in flight (async dispatch)

    def drain(out, take):
        nonlocal failures
        cap = out["lab_idx"].shape[0]
        n_lab = int(out["n_labeled"])
        if n_lab > cap:
            # The compaction is a stable partition, so real frames
            # (index < take) sort ahead of the padded tail of a partial
            # final chunk.  Overflow can drop real rows only when the
            # kept capacity is filled entirely by real frames; labeled
            # padded-tail frames spilling past cap are harmless.
            if int(np.sum(out["lab_idx"][:cap] < take)) == cap:
                raise RuntimeError(
                    f"labeled-row capacity overflow ({n_lab} > {cap}); "
                    f"raise --out_cap or lower --batch"
                )
            n_lab = cap
        lab_idx = out["lab_idx"][:n_lab]
        keep = lab_idx < take  # honor a partial tail chunk
        failures += int(np.sum(out["fail"][:take])) - int(np.sum(keep))
        for r in np.where(keep)[0]:
            abs_l0_samples.append(out["abs_l0"][r])
            labels.append(int(out["label"][r]))

    t_start = time.perf_counter()
    drained = 0
    frames_drained = 0

    def progress():
        dt = time.perf_counter() - t_start
        print(
            f"  {frames_drained}/{args.frames} frames, "
            f"{len(labels)} labels, {failures} unrepaired, "
            f"{frames_drained / dt:,.0f} frames/s",
            flush=True,
        )

    while frames_done < args.frames:
        take = min(batch, args.frames - frames_done)
        window.append((chunk_fn(fold_key(root_key, chunk_idx), noise_var), take))
        frames_done += take
        chunk_idx += 1
        if len(window) >= 16:
            out, take = window.pop(0)
            drain(jax.device_get(out), take)
            drained += 1
            frames_drained += take
            if drained % 32 == 0:
                progress()
    for out, take in window:
        drain(jax.device_get(out), take)
        drained += 1
        frames_drained += take
    progress()

    if not abs_l0_samples:
        raise RuntimeError("No samples collected; consider increasing frames or SNR")

    abs_array = np.stack(abs_l0_samples).astype(np.float32)
    label_array = np.asarray(labels, dtype=np.int32)
    meta = {
        "M": args.M,
        "EbN0_dB": args.snr_db,
        "seed": args.seed,
        "frames": args.frames,
        "N": cfg.N,
        "K": cfg.K,
        "construction": construction,
        "crc_poly": cfg.crc_poly,
        "crc_bits": cfg.crc_bits,
        "samples": int(label_array.size),
        "failures": int(failures),
    }

    out_path = Path(args.out)
    out_dir = out_path.parent if out_path.parent != Path("") else Path(".")
    out_dir.mkdir(parents=True, exist_ok=True)
    shard = out_dir / f"{out_path.name}_part0.npz"
    np.savez_compressed(shard, abs_l0=abs_array, flip_idx=label_array, meta=json.dumps(meta))
    print(f"Saved {label_array.size} samples to {shard}")


def build_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Generate DL-SCL flip dataset")
    parser.add_argument("--M", type=int, required=True, help="SCL list size")
    parser.add_argument("--N", type=int, help="Code length (default: config, 128)")
    parser.add_argument("--K", type=int, help="Info+CRC bits (default: config, 64)")
    parser.add_argument(
        "--construction", type=str, default="gaussian",
        choices=["gaussian", "gaussian_bitrev", "polarization"],
        help="Info-set construction (use gaussian_bitrev/polarization for N>128)",
    )
    parser.add_argument("--snr_db", type=float, default=5.0, help="AWGN Eb/N0 in dB")
    parser.add_argument("--frames", type=int, default=100000, help="Number of frames to simulate")
    parser.add_argument("--seed", type=int, default=0, help="RNG seed")
    parser.add_argument("--out", type=str, required=True, help="Output prefix for dataset shards")
    parser.add_argument("--batch", type=int, default=4096, help="Frames per device chunk")
    parser.add_argument(
        "--compact", type=int, default=-1,
        help="Oracle-search compaction capacity (−1 auto, 0 off): only "
             "baseline-failing frames go through the ≤8-attempt search",
    )
    parser.add_argument(
        "--out_cap", type=int, default=0,
        help="Labeled-row output capacity per chunk (0 auto = batch/4). "
             "Only this many [K]-wide |L0| rows cross device→host per "
             "chunk; at low-FER operating points a small cap (e.g. 1024) "
             "cuts the transfer ~30×. Overflow raises with guidance.",
    )
    return parser


def main(argv: list[str] | None = None) -> None:
    args = build_argparser().parse_args(argv)
    generate_samples(args)


if __name__ == "__main__":
    main()
