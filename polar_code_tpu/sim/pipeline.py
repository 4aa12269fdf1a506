"""Batched Monte-Carlo frame pipelines.

One jit-compiled function replaces every per-frame Python loop in the
reference sweeps (`eval/run_fer_sweep.py:79-121`, `eval/run_ber_sweep.py:127-166`):

    keys → payloads → CRC → encode → BPSK → AWGN → LLR → decode → counters

The chunk functions return *summed* counters (a handful of scalars), so the
host↔device traffic per chunk is negligible and, on a sharded mesh, the sum
over the frame axis lowers to one psum-style all-reduce.

Noise variance enters as a traced scalar so a single compilation serves the
whole Eb/N0 sweep.
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..channel import awgn_llr, bpsk
from ..dlscl.flip import decode_with_retries_batch
from ..nr.ldpc.decode_nms import decode_ldpc_nms_batch
from ..nr.ldpc.encode import encode_ldpc_batch
from ..nr.ldpc.rate_match import derate_match_ldpc, rate_match_ldpc
from ..nr.polar.scl_nr import (
    decode_rate_matched_scl_batch,
    encode_rate_matched_batch,
)
from ..ops.crc import attach_crc_batch
from ..ops.polar_transform import encode_batch
from ..ops.scl import decode_scl_batch
from ..parallel.mesh import shard_frames


def _random_payload(key, batch: int, bits: int) -> jnp.ndarray:
    return jax.random.bernoulli(key, 0.5, (batch, bits)).astype(jnp.int8)


def make_fer_chunk(
    *,
    N: int,
    K: int,
    crc_poly: str,
    info_set: np.ndarray,
    M: int,
    retries: int,
    beta: Optional[np.ndarray],
    batch: int,
    include_uncoded: bool = False,
    dtype=jnp.float32,
    mesh=None,
    backend: str = "auto",
    compact: int = 0,
):
    """Build the jitted FER-sweep chunk: (key, σ²_coded, σ²_uncoded) → counters.

    Runs baseline SCL and DL-SCL on the same frames (reference
    `simulate_frame`, `run_fer_sweep.py:28-38`) — the baseline decode is
    shared rather than duplicated.
    """

    payload_bits = K - _crc_degree(crc_poly)
    beta_arr = jnp.asarray(beta, dtype) if beta is not None else None
    info_np = np.asarray(info_set)
    multi = mesh is not None and len(mesh.devices.flat) > 1
    from ..ops.backend import resolve_backend

    decode_backend = resolve_backend(
        backend, batch=batch, M=M, dtype=dtype, multi_device=multi,
        N=N, K=K,
    )

    def chunk(key, noise_var_coded, noise_var_uncoded):
        kp, kn, kun = jax.random.split(key, 3)
        payload = shard_frames(_random_payload(kp, batch, payload_bits), mesh)
        msg = attach_crc_batch(payload, crc_poly)
        code = encode_batch(msg, info_np, N)
        llr = awgn_llr(kn, bpsk(code), noise_var_coded, dtype=dtype)
        llr = shard_frames(llr, mesh)

        dl = decode_with_retries_batch(
            llr, info_np, M, retries, crc=crc_poly, beta=beta_arr, dtype=dtype,
            backend=decode_backend,
            compact_capacity=_resolve_compact(compact, multi, batch),
        )
        scl_bits = dl["baseline_bits"]
        dl_bits = dl["best_path_bits"]

        msg_i = msg.astype(jnp.int32)
        scl_bit_err = jnp.sum(scl_bits.astype(jnp.int32) != msg_i)
        dl_bit_err = jnp.sum(dl_bits.astype(jnp.int32) != msg_i)
        out = {
            "scl_errors": jnp.sum(~dl["baseline_pass"]),
            "dl_errors": jnp.sum(~dl["success"]),
            "scl_bit_errors": scl_bit_err,
            "dl_bit_errors": dl_bit_err,
            "bits_coded": jnp.asarray(batch * K, jnp.int32),
            "retries_used": jnp.sum(dl["attempts_used"]),
        }
        if include_uncoded:
            unc_sym = bpsk(payload)
            unc_llr = awgn_llr(kun, unc_sym, noise_var_uncoded, dtype=dtype)
            unc_dec = (unc_llr < 0).astype(jnp.int8)
            unc_errs = jnp.sum(unc_dec.astype(jnp.int32) != payload.astype(jnp.int32), axis=1)
            out["uncoded_errors"] = jnp.sum(unc_errs > 0)
            out["uncoded_bit_errors"] = jnp.sum(unc_errs)
            out["bits_uncoded"] = jnp.asarray(batch * payload_bits, jnp.int32)
        return out

    return jax.jit(chunk)


def _crc_degree(poly: str) -> int:
    from ..ops.crc import crc_degree

    return crc_degree(poly)


def _resolve_compact(compact: int, multi: bool, batch: int) -> int:
    """Retry-compaction capacity (−1 auto / 0 off / >0 explicit — measured
    4–5× FER-sweep speedup at every Eb/N0 with identical results, see
    tools/bench_compact.py). Multi-device meshes resolve to 0 so the
    gathers stay on-chip."""

    from ..ops.backend import auto_compact_capacity

    return auto_compact_capacity(compact, batch, multi=multi)


def make_ber_chunk(
    *,
    scheme: str,
    E: int,
    N: int,
    K_payload: int,
    K_crc: int,
    crc_poly: str,
    info_set: Optional[np.ndarray],
    M: int,
    retries: int,
    beta: Optional[np.ndarray],
    ilv_mode: str,
    H: Optional[np.ndarray],
    max_iter: int,
    alpha: float,
    batch: int,
    dtype=jnp.float32,
    mesh=None,
    backend: str = "auto",
    ldpc_bg=None,
    ldpc_Z: Optional[int] = None,
    nms_exact: bool = False,
    compact: int = 0,
    adaptive_from: int = 0,
):
    """Build the jitted unified-BER-sweep chunk: (key, σ²) → counters.

    Reproduces the scheme dispatch and payload-only BER / avg_work
    accounting of `eval/run_ber_sweep.py:112-181`.

    adaptive_from > 0 (polar_scl only): two-stage adaptive decoding —
    first pass at that list size, CRC failures re-decoded at M
    (`ops/adaptive.py`); avg_work becomes the re-decoded fraction.
    """

    if scheme not in {"polar_scl", "dl_scl", "nr_polar_scl", "nr_ldpc"}:
        raise ValueError(f"Unsupported scheme: {scheme}")
    if adaptive_from and scheme != "polar_scl":
        raise ValueError("--adaptive_from is only supported for polar_scl")
    if adaptive_from and K_crc == 0:
        raise ValueError("adaptive decoding needs a CRC (K_crc > 0)")
    if adaptive_from and adaptive_from >= M:
        raise ValueError(
            f"adaptive_from ({adaptive_from}) must be < M ({M}): the second "
            "stage must use a strictly larger list than the first"
        )
    beta_arr = jnp.asarray(beta, dtype) if beta is not None else None
    info_np = np.asarray(info_set) if info_set is not None else None
    multi = mesh is not None and len(mesh.devices.flat) > 1
    from ..ops.backend import resolve_backend

    if scheme != "nr_ldpc":
        decode_backend = resolve_backend(
            backend, batch=batch, M=M, dtype=dtype, multi_device=multi,
            N=N, K=(K_payload + K_crc),
        )
    else:
        # the fused NMS kernel needs the circulant structure (bg, Z)
        from ..ops.backend import on_tpu

        ldpc_kernel = (
            backend != "xla"
            and ldpc_bg is not None
            and ldpc_Z is not None
            and batch % 256 == 0
            and not multi
            and on_tpu()
        )
        decode_backend = "pallas" if ldpc_kernel else "xla"

    def chunk(key, noise_var):
        kp, kn = jax.random.split(key)
        payload = shard_frames(_random_payload(kp, batch, K_payload), mesh)
        work = jnp.zeros((batch,), jnp.float32)

        if scheme in {"polar_scl", "dl_scl"}:
            msg = payload if K_crc == 0 else attach_crc_batch(payload, crc_poly)
            codeword = encode_batch(msg, info_np, N)
        elif scheme == "nr_polar_scl":
            codeword = encode_rate_matched_batch(
                payload, crc_poly, N, E, info_np, ilv_mode
            )
        else:  # nr_ldpc
            msg = payload if K_crc == 0 else attach_crc_batch(payload, crc_poly)
            codeword = rate_match_ldpc(encode_ldpc_batch(msg, H), E)

        llr = awgn_llr(kn, bpsk(codeword), noise_var, dtype=dtype)
        llr = shard_frames(llr, mesh)

        if scheme == "polar_scl":
            if adaptive_from:
                from ..ops.adaptive import decode_scl_adaptive

                res = decode_scl_adaptive(
                    llr, info_np, adaptive_from, M, crc_poly, dtype=dtype,
                    backend=backend,
                    capacity=_resolve_compact(compact, multi, batch),
                )
                candidate = res["best_path_bits"][:, :K_payload]
                work = res["second_stage"].astype(jnp.float32)
            elif decode_backend == "pallas":
                from ..ops.scl_pallas import decode_scl_pallas

                candidate = decode_scl_pallas(llr, info_np, M, crc_poly)[
                    "best_path_bits"
                ][:, :K_payload]
            else:
                res = decode_scl_batch(llr, info_np, M, crc_poly, dtype=dtype)
                candidate = res.best_path_bits[:, :K_payload]
        elif scheme == "dl_scl":
            res = decode_with_retries_batch(
                llr, info_np, M, retries, crc=crc_poly, beta=beta_arr, dtype=dtype,
                backend=decode_backend,
                compact_capacity=_resolve_compact(compact, multi, batch),
            )
            candidate = res["best_path_bits"][:, :K_payload]
            work = res["attempts_used"].astype(jnp.float32)
        elif scheme == "nr_polar_scl":
            res = decode_rate_matched_scl_batch(
                llr, crc_poly, N, E, info_np, M, ilv_mode, dtype=dtype,
                backend=decode_backend,
            )
            candidate = res["best_path_bits"][:, :K_payload]
        else:  # nr_ldpc
            internal = derate_match_ldpc(llr, int(H.shape[1]))
            if decode_backend == "pallas":
                from ..nr.ldpc.nms_pallas import decode_ldpc_nms_pallas

                res = decode_ldpc_nms_pallas(
                    internal, ldpc_bg, ldpc_Z, max_iter=max_iter, alpha=alpha,
                    self_exclude=nms_exact,
                )
            else:
                res = decode_ldpc_nms_batch(
                    internal, H, max_iter=max_iter, alpha=alpha,
                    self_exclude=nms_exact, dtype=dtype,
                )
            candidate = res["hard"][:, :K_payload]
            work = res["iters_used"].astype(jnp.float32)

        frame_bit_errs = jnp.sum(
            candidate.astype(jnp.int32) != payload.astype(jnp.int32), axis=1
        )
        return {
            "bit_errors": jnp.sum(frame_bit_errs),
            "frame_errors": jnp.sum(frame_bit_errs > 0),
            "bits_total": jnp.asarray(batch * K_payload, jnp.int32),
            "frames": jnp.asarray(batch, jnp.int32),
            "work_sum": jnp.sum(work),
        }

    return jax.jit(chunk)


__all__ = ["make_fer_chunk", "make_ber_chunk"]
