"""β module invariants (ref category 2): symmetry, unit diag, grads, 1D/2D."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polar_code_tpu.dlscl.beta import SymmetricBeta


def test_beta_matrix_symmetric_unit_diag():
    model = SymmetricBeta(16)
    params = model.init(jax.random.key(0))
    beta = np.asarray(SymmetricBeta.beta_matrix(params))
    np.testing.assert_allclose(beta, beta.T)
    np.testing.assert_allclose(np.diag(beta), np.ones(16))


def test_forward_1d_2d():
    model = SymmetricBeta(8)
    params = model.init(jax.random.key(1))
    x1 = jnp.arange(8.0)
    x2 = jnp.stack([x1, 2 * x1])
    q1 = model.apply(params, x1)
    q2 = model.apply(params, x2)
    assert q1.shape == (8,)
    assert q2.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(q2[0]), np.asarray(q1), rtol=1e-6)
    with pytest.raises(ValueError):
        model.apply(params, jnp.zeros((2, 2, 8)))


def test_forward_differentiable():
    model = SymmetricBeta(8)
    params = model.init(jax.random.key(2))

    def loss(params):
        return jnp.sum(model.apply(params, jnp.ones(8)) ** 2)

    grads = jax.grad(loss)(params)
    g = np.asarray(grads["off_diag"])
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_clamp_diagonal():
    model = SymmetricBeta(8)
    params = {"off_diag": jnp.ones((8, 8))}
    clamped = SymmetricBeta.clamp_diagonal(params)
    np.testing.assert_allclose(np.diag(np.asarray(clamped["off_diag"])), np.zeros(8))
    off = np.asarray(clamped["off_diag"])
    assert (off[~np.eye(8, dtype=bool)] == 1).all()
