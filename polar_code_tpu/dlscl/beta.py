"""Learnable symmetric β metric for DL-SCL — pure JAX.

Reference: `dl_scl_polar/dlscl/beta.py` (a torch `nn.Module`).  Here the
module is functional: parameters are a pytree (`{"off_diag": [dim, dim]}`)
usable with optax, and the forward is a single matmul `Q = |L0| @ β` that
XLA maps straight onto the MXU for batched inputs.

Invariants preserved from the reference:
  * β = triu(off_diag, 1) + triu(off_diag, 1)ᵀ + I — symmetric, unit diagonal.
  * Only the strict upper triangle of `off_diag` affects the forward; the
    full matrix (including the never-used lower triangle) carries the L2
    penalty during training, as in the reference.
  * `clamp_diagonal` zeroes the learnable diagonal (init + between steps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class SymmetricBeta:
    """Symmetric correlation matrix with unit diagonal (functional module)."""

    def __init__(self, dim: int, init_range: float = 0.2) -> None:
        if dim <= 0:
            raise ValueError("dim must be positive")
        self.dim = dim
        self.init_range = float(init_range)

    def init(self, key: jax.Array) -> dict:
        off = jax.random.uniform(
            key, (self.dim, self.dim), minval=-self.init_range, maxval=self.init_range
        )
        off = off * (1.0 - jnp.eye(self.dim))
        return {"off_diag": off}

    @staticmethod
    def clamp_diagonal(params: dict) -> dict:
        off = params["off_diag"]
        return {"off_diag": off * (1.0 - jnp.eye(off.shape[0], dtype=off.dtype))}

    @staticmethod
    def beta_matrix(params: dict) -> jnp.ndarray:
        off = params["off_diag"]
        upper = jnp.triu(off, k=1)
        return upper + upper.T + jnp.eye(off.shape[0], dtype=off.dtype)

    def apply(self, params: dict, abs_l0: jnp.ndarray) -> jnp.ndarray:
        """Q = |L0| @ β for [dim] or [batch, dim] inputs."""

        if abs_l0.ndim not in (1, 2):
            raise ValueError("abs_l0 must be 1D or 2D")
        beta = self.beta_matrix(params)
        return abs_l0 @ beta

    __call__ = apply


def beta_from_checkpoint(path: str) -> np.ndarray:
    """Load a β matrix saved as .npy (reference checkpoint format)."""

    return np.load(path)


__all__ = ["SymmetricBeta", "beta_from_checkpoint"]
