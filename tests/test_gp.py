"""GP regression tests.

Oracles: direct dense-formula posterior (numpy f64), interpolation behavior
at training points, hyperparameter recovery on synthetic data, and the
differentiable log marginal likelihood."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cortex_tpu.models import GP, fit_gp_ml
from cortex_tpu.models.gp import matern32_kernel, matern52_kernel, rbf_kernel


def _data(n=30, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(-3, 3, size=(n, 1)), axis=0).astype(np.float32)
    y = (np.sin(2 * X[:, 0]) + 0.1 * rng.normal(size=n)).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(y), rng


def test_posterior_matches_dense_formula():
    X, y, rng = _data()
    ell, sig2, noise = 0.8, 1.3, 0.05
    gp = GP(kernel="rbf", lengthscale=ell, variance=sig2, noise=noise)
    post = gp.fit(X, y)
    Xs = jnp.asarray(np.linspace(-3, 3, 17, dtype=np.float32)[:, None])
    mean, var = post.predict(Xs)

    Xn = np.asarray(X, np.float64)
    Xsn = np.asarray(Xs, np.float64)
    k = lambda a, b: sig2 * np.exp(-0.5 * ((a[:, None, 0] - b[None, :, 0]) ** 2) / ell**2)
    K = k(Xn, Xn) + noise * np.eye(len(Xn))
    Ks = k(Xn, Xsn)
    Kinv_y = np.linalg.solve(K, np.asarray(y, np.float64))
    mean_d = Ks.T @ Kinv_y
    var_d = np.diag(k(Xsn, Xsn)) - np.sum(Ks * np.linalg.solve(K, Ks), axis=0)
    np.testing.assert_allclose(np.asarray(mean), mean_d, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var), var_d, rtol=1e-2, atol=1e-4)
    # Log marginal likelihood against the dense formula.
    lml_d = (
        -0.5 * np.asarray(y, np.float64) @ Kinv_y
        - 0.5 * np.linalg.slogdet(K)[1]
        - 0.5 * len(Xn) * np.log(2 * np.pi)
    )
    assert float(post.lml) == pytest.approx(lml_d, rel=1e-4)


def test_interpolates_noiseless_targets():
    # Noise-FREE targets: the posterior mean must pass through them.  (With
    # noisy targets, exact-GP "interpolation" is impossible for any
    # precision: noise components lie along near-null kernel eigendirections
    # that a smooth RBF prior cannot represent.)
    rng = np.random.default_rng(0)
    X = jnp.asarray(np.sort(rng.uniform(-3, 3, size=(30, 1)), axis=0).astype(np.float32))
    y = jnp.sin(2.0 * X[:, 0])
    post = GP(kernel="rbf", lengthscale=0.8, variance=1.0, noise=1e-3).fit(X, y)
    mean, var = post.predict(X)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(y), atol=0.02)
    assert np.all(np.asarray(var) < 0.02)
    # Far from data the prior reasserts itself.
    far_mean, far_var = post.predict(jnp.asarray([[25.0]]))
    assert abs(float(far_mean[0])) < 0.05
    assert float(far_var[0]) == pytest.approx(1.0, rel=0.05)


@pytest.mark.parametrize("kern", [rbf_kernel, matern32_kernel, matern52_kernel])
def test_kernels_are_valid_covariances(kern):
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(12, 2)).astype(np.float32))
    K = np.asarray(kern(A, A, lengthscale=0.7, variance=2.0), np.float64)
    np.testing.assert_allclose(K, K.T, atol=1e-6)
    np.testing.assert_allclose(np.diag(K), 2.0, rtol=1e-5)
    evals = np.linalg.eigvalsh(K + 1e-8 * np.eye(12))
    assert np.all(evals > -1e-6)


def test_fit_gp_ml_recovers_signal():
    X, y, rng = _data(n=80, seed=2)
    gp, losses = fit_gp_ml(X, y, n_steps=300)
    assert float(losses[-1]) < float(losses[0])
    # Fitted noise close to the true 0.1 std (variance 0.01).
    assert 0.003 < gp.noise < 0.05, gp.noise
    post = gp.fit(X, y)
    Xs = jnp.asarray(np.linspace(-2.5, 2.5, 50, dtype=np.float32)[:, None])
    mean, _ = post.predict(Xs)
    truth = np.sin(2 * np.asarray(Xs)[:, 0])
    assert np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)) < 0.15


def test_lml_is_differentiable_and_jits():
    X, y, _ = _data(n=20, seed=3)

    @jax.jit
    def nll(log_ell):
        return -GP(kernel="matern52", lengthscale=jnp.exp(log_ell)).log_marginal_likelihood(X, y)

    g = jax.grad(nll)(jnp.asarray(0.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 0
