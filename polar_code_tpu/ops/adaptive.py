"""Two-stage adaptive SCL decoding, entirely on-device.

Reference analogue: the legacy simulator decodes at L=1 and re-decodes any
CRC-failing frame at ``list_size_max`` (`simulator.py:111-116`).  This is
the modern-pipeline form of the same idea: decode the full batch at a small
``M_first``; frames whose CRC fails are gathered into fixed-capacity chunks
inside a ``lax.while_loop`` (the compaction scheme of
`dlscl/flip.py::_decode_with_retries_compact`) and re-decoded at
``M_final``.  No host round-trips.

Per frame the result equals: stage-1 output if its CRC passed, else the
stage-2 (``M_final``) output — decided per frame, so it is NOT identical to
plain SCL-``M_final``: a frame whose ``M_first`` decode passes CRC with a
wrong codeword keeps it.  Note the trigger differs from the legacy code on
exactly that case: `simulator.py:111-116` re-decodes on a *genie*
ground-truth comparison (``pcf.fails(message, decoded) > 0``), so a stage-1
undetected error (CRC passes, wrong codeword) is re-decoded — and possibly
corrected — by the legacy code but kept here.  The CRC trigger is the
practical (implementable-without-genie) variant of the two-stage scheme;
FER can differ by at most the stage-1 undetected-error rate.

Throughput: at Eb/N0 where most frames pass at ``M_first`` the cost
approaches the ``M_first`` kernel's (v5e, P(128,64): M=1 3.4 ms vs M=8
5.7 ms per 8192 frames, so ~1.5× for high-SNR sweep points at ≲15% FER₁).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def decode_scl_adaptive(
    llr: jnp.ndarray,
    info_set,
    M_first: int,
    M_final: int,
    crc: str,
    *,
    dtype=jnp.float32,
    capacity: int = -1,
    backend: str = "auto",
) -> dict:
    """Adaptive decode of a batch.  llr: [B, N].

    capacity: stage-2 chunk size (−1 auto: the kernel block on a single
    TPU, else a masked full-batch second stage; >0 explicit — any positive
    value works on CPU too, used by the equality tests).

    Returns {"best_path_bits" [B, K], "best_path_info_llrs" [B, K],
    "crc_pass" [B], "second_stage" [B] (bool: frame was re-decoded)}.
    """

    if crc is None:
        raise ValueError("adaptive decoding needs a CRC to detect stage-1 failures")
    info_np = np.asarray(info_set)
    B, N = int(llr.shape[0]), int(llr.shape[1])
    K = int(info_np.size)

    from .backend import (
        auto_compact_capacity,
        make_scl_decoder,
        stable_partition_perm,
    )

    dec1 = make_scl_decoder(
        info_np, M_first, crc, batch=B, dtype=dtype, backend=backend, N=N
    )
    bits, llrs, ok = dec1(llr)
    llrs = llrs.astype(dtype)

    C = auto_compact_capacity(int(capacity), B)
    if C == 0:
        # no compaction available (CPU / multi-device mesh): masked
        # full-batch second stage — same results, all-frames cost
        dec2 = make_scl_decoder(
            info_np, M_final, crc, batch=B, dtype=dtype, backend=backend, N=N
        )
        b2, l2, ok2 = dec2(llr)
        sel = ok[:, None]
        return {
            "best_path_bits": jnp.where(sel, bits, b2),
            "best_path_info_llrs": jnp.where(sel, llrs, l2.astype(dtype)),
            "crc_pass": ok | ok2,
            "second_stage": ~ok,
        }

    # an explicit "pallas" request may be ineligible at the chunk size
    chunk_backend = "auto" if backend == "pallas" else backend
    dec2 = make_scl_decoder(
        info_np, M_final, crc, batch=C, dtype=dtype, backend=chunk_backend, N=N
    )

    done = ok
    count = jnp.sum((~done).astype(jnp.int32))
    # failing frames first, in index order (≡ stable argsort of the pass
    # mask, via O(B) cumsums — see backend.stable_partition_perm)
    order = stable_partition_perm(done)
    nchunks = (count + C - 1) // C

    def cond(c):
        return c[0] < nchunks

    def chunk(c):
        i, bits, llrs, okf = c
        offs = i * C + jnp.arange(C, dtype=jnp.int32)
        valid = offs < count
        sel_raw = order[jnp.minimum(offs, B - 1)]
        sel = jnp.where(valid, sel_raw, B)  # B = out of range → dropped

        r_bits, r_llrs, r_pass = dec2(llr[sel_raw])
        bits = bits.at[sel].set(r_bits, mode="drop")
        llrs = llrs.at[sel].set(r_llrs.astype(dtype), mode="drop")
        okf = okf.at[sel].set(r_pass, mode="drop")
        return (i + 1, bits, llrs, okf)

    _, bits, llrs, okf = jax.lax.while_loop(
        cond, chunk, (jnp.int32(0), bits, llrs, done)
    )
    return {
        "best_path_bits": bits,
        "best_path_info_llrs": llrs,
        "crc_pass": okf,
        "second_stage": ~ok,
    }


__all__ = ["decode_scl_adaptive"]
