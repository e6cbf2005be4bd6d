"""Spline transform invariants: invertibility, logdet-vs-autodiff, oracle parity."""
import jax
import jax.numpy as jnp
import numpy as np

from radmmm_tpu.ops.splines import (
    piecewise_linear_transform, piecewise_linear_inverse_transform,
    piecewise_quadratic_transform, unbounded_piecewise_quadratic_transform)


def test_piecewise_linear_roundtrip(rng):
    N, K, B = 16, 5, 8
    x = rng.uniform(0.05, 0.95, (N, K)).astype(np.float32)
    q = rng.standard_normal((N, K, B)).astype(np.float32)
    y, logj = piecewise_linear_transform(jnp.asarray(x), jnp.asarray(q))
    x2, logj_inv = piecewise_linear_inverse_transform(y, jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(x2), x, atol=2e-5)
    np.testing.assert_allclose(np.asarray(logj), -np.asarray(logj_inv),
                               atol=2e-5)


def test_piecewise_linear_logdet_matches_autodiff(rng):
    N, K, B = 4, 3, 8
    x = rng.uniform(0.1, 0.9, (N, K)).astype(np.float32)
    q = rng.standard_normal((N, K, B)).astype(np.float32)

    def f(xi, qi):
        y, _ = piecewise_linear_transform(xi[None], qi[None])
        return y[0]

    logj = np.asarray(piecewise_linear_transform(jnp.asarray(x),
                                                 jnp.asarray(q))[1])
    for i in range(N):
        J = jax.jacfwd(f)(jnp.asarray(x[i]), jnp.asarray(q[i]))
        want = np.log(np.abs(np.linalg.det(np.asarray(J))))
        np.testing.assert_allclose(logj[i], want, atol=1e-4)


def test_piecewise_linear_outlier_passthru(rng):
    x = np.array([[-0.5, 1.5, 0.5]], dtype=np.float32)
    q = rng.standard_normal((1, 3, 8)).astype(np.float32)
    y, logj = piecewise_linear_transform(jnp.asarray(x), jnp.asarray(q))
    y = np.asarray(y)
    # out-of-range values pass through with unit jacobian contribution
    assert y[0, 0] == -0.5 and y[0, 1] == 1.5
    assert 0.0 < y[0, 2] < 1.0


def test_quadratic_roundtrip(rng):
    N, K = 32, 7  # K bins -> K widths, K+1 heights
    x = rng.uniform(0.02, 0.98, (N,)).astype(np.float32)
    w_t = rng.standard_normal((N, K)).astype(np.float32)
    v_t = rng.standard_normal((N, K + 1)).astype(np.float32)
    y, logj = piecewise_quadratic_transform(jnp.asarray(x), jnp.asarray(w_t),
                                            jnp.asarray(v_t))
    x2, _ = piecewise_quadratic_transform(y, jnp.asarray(w_t),
                                          jnp.asarray(v_t), inverse=True)
    np.testing.assert_allclose(np.asarray(x2), x, atol=1e-4)


def test_quadratic_logdet_matches_autodiff(rng):
    K = 5
    x = rng.uniform(0.1, 0.9, (6,)).astype(np.float32)
    w_t = rng.standard_normal((6, K)).astype(np.float32)
    v_t = rng.standard_normal((6, K + 1)).astype(np.float32)

    def f(xi, wi, vi):
        return piecewise_quadratic_transform(xi[None], wi[None], vi[None])[0][0]

    logj = np.asarray(piecewise_quadratic_transform(
        jnp.asarray(x), jnp.asarray(w_t), jnp.asarray(v_t))[1])
    for i in range(6):
        g = jax.grad(f)(jnp.asarray(x[i]), jnp.asarray(w_t[i]),
                        jnp.asarray(v_t[i]))
        np.testing.assert_allclose(logj[i], np.log(np.abs(np.asarray(g))),
                                   atol=1e-4)


def test_unbounded_quadratic_identity_outside(rng):
    K = 4
    x = np.array([-2.0, -0.1, 0.5, 1.2, 3.0], dtype=np.float32)
    w_t = rng.standard_normal((5, K)).astype(np.float32)
    v_t = rng.standard_normal((5, K + 1)).astype(np.float32)
    y, logj = unbounded_piecewise_quadratic_transform(
        jnp.asarray(x), jnp.asarray(w_t), jnp.asarray(v_t))
    y, logj = np.asarray(y), np.asarray(logj)
    for i in (0, 1, 3, 4):
        assert y[i] == x[i] and logj[i] == 0.0
    assert 0.0 < y[2] < 1.0
    # roundtrip through inverse
    x2, _ = unbounded_piecewise_quadratic_transform(
        jnp.asarray(y), jnp.asarray(w_t), jnp.asarray(v_t), inverse=True)
    np.testing.assert_allclose(np.asarray(x2), x, atol=1e-4)


def test_quadratic_oracle_parity_small_case():
    """Hand-checkable case: uniform widths, flat heights -> identity map."""
    K = 4
    x = jnp.asarray(np.linspace(0.05, 0.95, 9, dtype=np.float32))
    w_t = jnp.zeros((9, K))
    v_t = jnp.zeros((9, K + 1))
    y, logj = piecewise_quadratic_transform(x, w_t, v_t)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logj), 0.0, atol=1e-5)
