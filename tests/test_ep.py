"""Expectation-propagation tests.

Oracles: exact conjugate posterior (Gaussian sites — EP is exact there),
dense-grid numerical posterior for 2-D probit (EP is famously near-exact for
probit), and closed-form vs quadrature moment-matching agreement."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm

from cortex_tpu.ops import (
    ep_linear_model,
    gauss_hermite_tilted,
    probit_tilted_moments,
)


def _design(n=40, d=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, d)), dtype=jnp.float32), rng


def test_gaussian_sites_recover_exact_ridge_posterior():
    X, rng = _design()
    w_true = np.array([1.0, -0.5, 0.25], dtype=np.float32)
    r = 0.3
    y = jnp.asarray(np.asarray(X) @ w_true + rng.normal(0, np.sqrt(r), size=X.shape[0]),
                    dtype=jnp.float32)

    def gaussian_tilted(mu_cav, var_cav):
        v = 1.0 / (1.0 / var_cav + 1.0 / r)
        return v * (mu_cav / var_cav + y / r), v

    res = ep_linear_model(X, gaussian_tilted, prior_var=2.0, n_iters=5, damping=1.0)

    Xn = np.asarray(X)
    S = np.linalg.inv(np.eye(3) / 2.0 + Xn.T @ Xn / r)
    m = S @ Xn.T @ np.asarray(y) / r
    np.testing.assert_allclose(np.asarray(res.mean), m, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.cov), S, rtol=1e-3, atol=1e-5)
    assert float(res.site_delta) < 1e-5  # converged (Gaussian sites are fixed points)


def _probit_grid_posterior(X, y, prior_var, lim=6.0, n=401):
    """Dense-grid 2-D posterior moments (numerically exact oracle)."""
    g = np.linspace(-lim, lim, n)
    W0, W1 = np.meshgrid(g, g, indexing="ij")
    W = np.stack([W0.ravel(), W1.ravel()], axis=1)  # (n², 2)
    Z = np.asarray(X) @ W.T  # (n_obs, n²)
    from scipy.stats import norm as spnorm

    loglik = spnorm.logcdf(np.asarray(y)[:, None] * Z).sum(axis=0)
    logprior = -0.5 * (W**2).sum(axis=1) / prior_var
    logp = loglik + logprior
    p = np.exp(logp - logp.max())
    p /= p.sum()
    mean = p @ W
    diff = W - mean
    cov = (p[:, None, None] * diff[:, :, None] * diff[:, None, :]).sum(axis=0)
    return mean, cov


def test_probit_matches_grid_oracle():
    rng = np.random.default_rng(1)
    n, d = 30, 2
    X = jnp.asarray(rng.normal(size=(n, d)), dtype=jnp.float32)
    w_true = np.array([1.5, -1.0])
    y = jnp.asarray(np.sign(np.asarray(X) @ w_true + rng.normal(0, 0.5, size=n)),
                    dtype=jnp.float32)

    res = ep_linear_model(X, probit_tilted_moments(y), prior_var=1.0, n_iters=40)
    grid_mean, grid_cov = _probit_grid_posterior(X, y, prior_var=1.0)
    np.testing.assert_allclose(np.asarray(res.mean), grid_mean, atol=0.02)
    np.testing.assert_allclose(np.asarray(res.cov), grid_cov, atol=0.02)


def test_quadrature_matches_closed_form_probit():
    y = jnp.asarray(np.array([1.0, -1.0, 1.0, 1.0, -1.0], dtype=np.float32))
    mu = jnp.asarray(np.array([0.3, -0.8, 2.0, -0.1, 0.0], dtype=np.float32))
    var = jnp.asarray(np.array([0.5, 1.2, 0.2, 2.0, 1.0], dtype=np.float32))

    exact = probit_tilted_moments(y)(mu, var)
    quad = gauss_hermite_tilted(
        lambda z: norm.logcdf(y[:, None] * z), n_points=61
    )(mu, var)
    np.testing.assert_allclose(quad[0], exact[0], atol=2e-3)
    np.testing.assert_allclose(quad[1], exact[1], atol=2e-3)


def test_ep_jits_and_predicts():
    rng = np.random.default_rng(2)
    n, d = 200, 5
    X = jnp.asarray(rng.normal(size=(n, d)), dtype=jnp.float32)
    w_true = rng.normal(size=d)
    y = jnp.asarray(np.sign(np.asarray(X) @ w_true), dtype=jnp.float32)

    fit = jax.jit(
        lambda Xd, yd: ep_linear_model(Xd, probit_tilted_moments(yd), n_iters=25)
    )
    res = fit(X, y)
    preds = jnp.sign(X @ res.mean)
    acc = float(jnp.mean(preds == y))
    assert acc > 0.95
    assert np.all(np.isfinite(np.asarray(res.cov)))
