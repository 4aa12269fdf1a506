"""Decode-backend selection: fused Pallas kernel vs pure-XLA graph.

The Pallas kernel (`ops/scl_pallas.py`) is ~6× faster than the XLA graph on
a TPU chip but requires: a TPU device, f32, power-of-two list size, and a
batch divisible by the kernel's block size.  `resolve_backend` picks the
fastest eligible path; everything falls back to the always-correct XLA
decoder (`ops/scl.py`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

PALLAS_BLOCK = 128


def on_tpu() -> bool:
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    kind = (getattr(dev, "device_kind", "") or "").upper()
    return "TPU" in kind or dev.platform in ("tpu",)


def resolve_backend(
    backend: str,
    *,
    batch: int,
    M: int,
    dtype,
    multi_device: bool = False,
    N: Optional[int] = None,
    K: Optional[int] = None,
) -> str:
    """Return "pallas" or "xla" for a decode of the given shape.

    When the code shape (N, K) is supplied, kernel eligibility also checks
    the kernel's VMEM footprint against the per-core budget.  Under the
    lazy-clone kernel every (N ≤ 1024, M ≤ 8) shape fits at plain f32 —
    N=1024 M=8 included (bf16 bit planes remain an explicit option, never
    auto-selected) — so this gate now only trips for shapes beyond the
    supported range."""

    if backend not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown backend: {backend}")
    if backend == "xla":
        return "xla"
    fits_vmem = True
    if N is not None and K is not None:
        from .scl_pallas import kernel_fit_dtype

        # auto-engages exact bf16 bit planes when f32 doesn't fit
        fits_vmem = kernel_fit_dtype(N, K, M, PALLAS_BLOCK) is not None
    eligible = (
        (M & (M - 1)) == 0
        and M <= 8  # sort/clone networks sized (and measured) for M ≤ 8
        and fits_vmem
        and batch % PALLAS_BLOCK == 0
        and jnp.dtype(dtype) == jnp.float32
        and not multi_device
        and on_tpu()
    )
    if backend == "pallas" and not eligible:
        raise ValueError(
            "pallas backend requires a TPU, f32, power-of-two M <= 8, "
            f"batch % {PALLAS_BLOCK} == 0, a single-device mesh, and a "
            "code that fits the kernel's VMEM budget"
        )
    return "pallas" if eligible else "xla"


def make_scl_decoder(
    info_np, M: int, crc, *, batch: int, dtype, backend: str = "auto",
    N: int,
):
    """Shared kernel/XLA dispatch: returns `decode(llr[, forced]) ->
    (best_path_bits, best_path_info_llrs, crc_pass)` for the given shape.

    Falls back to the XLA decoder whenever the batch/backend is not
    Pallas-eligible (an explicit "pallas" request for an ineligible batch
    still raises, from `resolve_backend`).  `N` is required so
    auto-selection always checks the kernel's VMEM budget (over-budget
    shapes, e.g. N=1024 M=8 in f32 traces, must route to XLA rather than
    fail the Mosaic compile)."""

    which = resolve_backend(
        backend, batch=batch, M=M, dtype=dtype, N=N,
        K=int(np.asarray(info_np).size),
    )

    def decode(llr, forced=None):
        if which == "pallas":
            from .scl_pallas import decode_scl_pallas

            out = decode_scl_pallas(llr, info_np, M, crc, force_info_bits=forced)
            return out["best_path_bits"], out["best_path_info_llrs"], out["crc_pass"]
        from .scl import decode_scl_batch

        res = decode_scl_batch(llr, info_np, M, crc, force_info_bits=forced, dtype=dtype)
        return res.best_path_bits, res.best_path_info_llrs, res.crc_pass

    return decode


def auto_compact_capacity(compact: int, batch: int, multi: bool = False) -> int:
    """Normalize a compaction request: −1 = auto (PALLAS_BLOCK on a single
    TPU device, else off), 0 = off, >0 = explicit capacity (clamped to the
    batch).  Multi-device meshes always resolve to 0 so the gathers stay
    on-chip."""

    if multi or compact == 0:
        return 0
    if compact > 0:
        return min(compact, batch)
    return PALLAS_BLOCK if (on_tpu() and batch > PALLAS_BLOCK) else 0


def stable_partition_perm(mask):
    """Permutation putting mask==False elements first, stably — the exact
    result of ``jnp.argsort(mask, stable=True)`` for a 1-D bool mask, in
    O(B) cumsums instead of a comparator sort.

    XLA's TPU sort is expensive even for 1-D bool keys (a 262144-element
    stable bool argsort costs ~10 ms of VPU sort-network passes; the
    retry-compaction loops pay it once per retry step).  The two cumsums +
    one scatter below are bandwidth-bound and measure ~100× cheaper.
    Used by the device-side compaction gathers (dlscl/flip.py,
    ops/adaptive.py, train/make_dataset.py)."""

    import jax.numpy as jnp

    m = mask.astype(jnp.int32)
    n_false = mask.size - jnp.sum(m)
    # destination slot of each element: falses keep order at the front,
    # trues keep order after every false
    pos_true = n_false + jnp.cumsum(m) - 1
    pos_false = jnp.cumsum(1 - m) - 1
    dest = jnp.where(mask, pos_true, pos_false)
    return (
        jnp.zeros((mask.size,), jnp.int32)
        .at[dest]
        .set(jnp.arange(mask.size, dtype=jnp.int32), mode="drop")
    )


__all__ = [
    "resolve_backend",
    "on_tpu",
    "PALLAS_BLOCK",
    "make_scl_decoder",
    "auto_compact_capacity",
    "stable_partition_perm",
]
