"""Decode-backend selection: fused Pallas kernel vs pure-XLA graph.

The Pallas kernel (`ops/scl_pallas.py`) is ~6× faster than the XLA graph on
a TPU chip but requires: a TPU device, f32, power-of-two list size, and a
batch divisible by the kernel's block size.  `resolve_backend` picks the
fastest eligible path; everything falls back to the always-correct XLA
decoder (`ops/scl.py`).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

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
) -> str:
    """Return "pallas" or "xla" for a decode of the given shape."""

    if backend not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown backend: {backend}")
    if backend == "xla":
        return "xla"
    eligible = (
        (M & (M - 1)) == 0
        and M <= 8  # VMEM budget: per-path state + traces at BT=128
        and batch % PALLAS_BLOCK == 0
        and jnp.dtype(dtype) == jnp.float32
        and not multi_device
        and on_tpu()
    )
    if backend == "pallas" and not eligible:
        raise ValueError(
            "pallas backend requires a TPU, f32, power-of-two M, "
            f"batch % {PALLAS_BLOCK} == 0, and a single-device mesh"
        )
    return "pallas" if eligible else "xla"


__all__ = ["resolve_backend", "on_tpu", "PALLAS_BLOCK"]
