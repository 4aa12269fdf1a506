"""Persistent XLA/Mosaic compilation cache.

On this class of deployment, compiles go through a remote-compile service
and cost 10–120 s per unique graph (the unrolled SCL pipelines are large).
The persistent cache makes every re-run — across processes — skip straight
to execution.  All CLIs and `bench.py` call `enable_compilation_cache()`.

* respects an externally set ``JAX_COMPILATION_CACHE_DIR``;
* opt out with ``POLAR_CODE_TPU_NO_CACHE=1``;
* default location ``~/.cache/polar_code_tpu/jax``.
"""

from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX at a persistent compile cache; returns the directory used."""

    if os.environ.get("POLAR_CODE_TPU_NO_CACHE"):
        return None
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR") and path is None:
        # the env var only takes effect if it was set before jax import;
        # applying it via config makes this order-independent
        path = os.environ["JAX_COMPILATION_CACHE_DIR"]
    if path is None:
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "polar_code_tpu", "jax"
        )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
    except Exception:  # read-only home, unsupported backend — never fatal
        return None
    return path


__all__ = ["enable_compilation_cache"]
