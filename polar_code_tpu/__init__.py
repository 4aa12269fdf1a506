"""polar_code_tpu — a TPU-native polar-code Monte-Carlo simulation and decoding framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of the
reference `dl_scl_polar` package (see SURVEY.md): polar code construction,
encoding, SC / CRC-aided SCL decoding, DL-SCL flip-retry with a learned
symmetric β metric, NR-style rate-matched polar and LDPC comparison codecs,
dataset generation, β training, and FER/BER sweep evaluation CLIs.

Design stance (TPU-first, not a port):
  * every per-frame Python loop in the reference becomes one jit-compiled
    batched pipeline over a `[B]` frame axis,
  * the SCL list axis (M ≤ 8) and code axis (N) live on-chip with the batch
    in the TPU lane dimension,
  * data-dependent control flow (CRC early exit, retries, stopping rules)
    becomes masked fixed-trip device loops plus a host-side chunk controller,
  * multi-chip scaling uses `jax.sharding.Mesh` over a `frames` axis with
    psum-style counter aggregation.
"""

from . import config
from .polar.construct import construct_info_set

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy re-exports of the main entry points (avoid importing the heavy
    # decoder modules until first use).
    lazy = {
        "decode_scl_batch": ("polar_code_tpu.ops.scl", "decode_scl_batch"),
        "decode_scl_pallas": ("polar_code_tpu.ops.scl_pallas", "decode_scl_pallas"),
        "sc_decode_batch": ("polar_code_tpu.ops.sc", "sc_decode_batch"),
        "decode_scl_adaptive": ("polar_code_tpu.ops.adaptive", "decode_scl_adaptive"),
        "decode_with_retries_batch": ("polar_code_tpu.dlscl.flip", "decode_with_retries_batch"),
        "SymmetricBeta": ("polar_code_tpu.dlscl.beta", "SymmetricBeta"),
        "encode_batch": ("polar_code_tpu.ops.polar_transform", "encode_batch"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'polar_code_tpu' has no attribute {name!r}")


__all__ = [
    "config",
    "construct_info_set",
    "decode_scl_adaptive",
    "decode_scl_batch",
    "decode_scl_pallas",
    "sc_decode_batch",
    "decode_with_retries_batch",
    "SymmetricBeta",
    "encode_batch",
    "__version__",
]
