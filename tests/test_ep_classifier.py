"""EP classifier: separability, calibration against Monte-Carlo predictives,
probit/logistic agreement, and the exact 1-D posterior-predictive oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cortex_tpu.models import EPClassifier


def _blobs(n=120, seed=0, margin=2.0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 2)).astype(np.float32)
    y = np.where(X[:, 0] + 0.5 * X[:, 1] > 0, 1.0, -1.0).astype(np.float32)
    X[:, 0] += y * margin / 2
    return jnp.asarray(X), jnp.asarray(y)


@pytest.mark.parametrize("likelihood", ["probit", "logistic"])
def test_classifier_separates_blobs(likelihood):
    X, y = _blobs()
    post = EPClassifier(likelihood=likelihood).fit(X, y)
    acc = float(jnp.mean(post.predict(X) == y))
    assert acc > 0.93
    proba = post.predict_proba(X)
    assert bool(jnp.all((proba >= 0) & (proba <= 1)))
    # Confident on deep points, uncertain near the boundary.
    deep = X[:, 0] * y > 2.0
    if bool(jnp.any(deep)):
        assert float(jnp.min(jnp.where(y[deep] > 0, proba[deep], 1 - proba[deep]))) > 0.8


def test_probit_predictive_matches_monte_carlo():
    """Φ(μ/√(1+σ²)) must equal the MC average of Φ(x·w) over posterior
    samples — pins the predictive integral, not just the point estimate."""
    X, y = _blobs(n=80, seed=1)
    post = EPClassifier(likelihood="probit").fit(X, y)
    Xs = jnp.asarray(np.random.default_rng(2).normal(size=(20, 2)), jnp.float32)
    p_closed = post.predict_proba(Xs)
    L = np.linalg.cholesky(np.asarray(post.cov) + 1e-9 * np.eye(2))
    ws = np.asarray(post.mean)[None, :] + np.random.default_rng(3).normal(
        size=(40000, 2)
    ) @ L.T
    from scipy.stats import norm as snorm

    p_mc = snorm.cdf(np.asarray(Xs) @ ws.T).mean(axis=1)
    np.testing.assert_allclose(p_closed, p_mc, atol=0.01)


def test_logistic_predictive_matches_monte_carlo():
    X, y = _blobs(n=80, seed=4)
    post = EPClassifier(likelihood="logistic").fit(X, y)
    Xs = jnp.asarray(np.random.default_rng(5).normal(size=(15, 2)), jnp.float32)
    p_quad = post.predict_proba(Xs)
    L = np.linalg.cholesky(np.asarray(post.cov) + 1e-9 * np.eye(2))
    ws = np.asarray(post.mean)[None, :] + np.random.default_rng(6).normal(
        size=(40000, 2)
    ) @ L.T
    p_mc = (1.0 / (1.0 + np.exp(-np.asarray(Xs) @ ws.T))).mean(axis=1)
    np.testing.assert_allclose(p_quad, p_mc, atol=0.01)


def test_probit_and_logistic_agree_qualitatively():
    X, y = _blobs(n=150, seed=7)
    pp = EPClassifier(likelihood="probit").fit(X, y).predict_proba(X)
    pl = EPClassifier(likelihood="logistic").fit(X, y).predict_proba(X)
    # Same decisions almost everywhere; probabilities correlated.
    agree = float(jnp.mean((pp >= 0.5) == (pl >= 0.5)))
    assert agree > 0.97
    assert float(jnp.corrcoef(pp, pl)[0, 1]) > 0.98


def test_unknown_likelihood_raises():
    X, y = _blobs(n=10)
    with pytest.raises(ValueError, match="likelihood"):
        EPClassifier(likelihood="cauchit").fit(X, y)


def test_posterior_matches_1d_grid_oracle():
    """d=1 probit: posterior over the single weight vs dense numerical
    integration of prior × likelihood."""
    rng = np.random.default_rng(8)
    x = rng.normal(size=30).astype(np.float32)
    w_true = 1.3
    y = np.where(rng.uniform(size=30) < _phi(w_true * x), 1.0, -1.0).astype(np.float32)
    post = EPClassifier(likelihood="probit", prior_var=4.0, n_iters=80).fit(
        x[:, None], y
    )
    grid = np.linspace(-6, 6, 4001)
    logp = -0.5 * grid**2 / 4.0
    from scipy.stats import norm as snorm

    for xi, yi in zip(x, y):
        logp += snorm.logcdf(yi * xi * grid)
    p = np.exp(logp - logp.max())
    p /= np.trapezoid(p, grid)
    mean_oracle = np.trapezoid(grid * p, grid)
    var_oracle = np.trapezoid((grid - mean_oracle) ** 2 * p, grid)
    assert abs(float(post.mean[0]) - mean_oracle) < 0.05
    assert abs(float(post.cov[0, 0]) - var_oracle) < 0.05


def _phi(z):
    from scipy.stats import norm as snorm

    return snorm.cdf(z)
