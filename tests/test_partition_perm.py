"""stable_partition_perm ≡ jnp.argsort(mask, stable=True) for bool masks.

The compaction loops (dlscl/flip.py, ops/adaptive.py, train/make_dataset.py)
replaced their per-step stable bool argsorts with the O(B) cumsum+scatter
partition; this pins the exact-equality contract the swap relies on.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polar_code_tpu.ops.backend import stable_partition_perm


@pytest.mark.parametrize("size", [1, 7, 128, 1000, 8192])
@pytest.mark.parametrize("p", [0.0, 0.01, 0.5, 0.99, 1.0])
def test_matches_stable_argsort(size, p):
    rng = np.random.default_rng(size * 31 + int(p * 100))
    mask = jnp.asarray(rng.random(size) < p)
    ref = jnp.argsort(mask, stable=True).astype(jnp.int32)
    out = stable_partition_perm(mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_under_jit_and_grad_free_contexts():
    mask = jnp.asarray([True, False, True, False, False])
    out = jax.jit(stable_partition_perm)(mask)
    np.testing.assert_array_equal(np.asarray(out), [1, 3, 4, 0, 2])
