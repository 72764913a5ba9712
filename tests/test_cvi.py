"""CVI (natural-gradient VI): conjugate exactness, grid oracles, ELBO ascent,
and agreement with EP on shared problems.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cortex_tpu.ops import cvi_linear_model, ep_linear_model, probit_tilted_moments


def test_conjugate_sites_reach_exact_ridge_posterior():
    """Gaussian likelihood: the CVI fixed point is the exact posterior —
    dv is constant (−1/2σ²), dm is linear, so the pseudo-sites equal the true
    sites and one global update is conjugate ridge regression."""
    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 3)).astype(np.float32)
    w = np.array([1.0, -0.5, 2.0])
    noise = 0.3
    y = (X @ w + noise * rng.normal(size=40)).astype(np.float32)
    yj = jnp.asarray(y)

    def log_lik(z):
        return -0.5 * (yj[:, None] - z) ** 2 / noise**2

    out = cvi_linear_model(jnp.asarray(X), log_lik, prior_var=4.0, n_iters=60, step_size=0.9)
    Sinv = np.eye(3) / 4.0 + X.T @ X / noise**2
    m_exact = np.linalg.solve(Sinv, X.T @ y / noise**2)
    cov_exact = np.linalg.inv(Sinv)
    np.testing.assert_allclose(out.mean, m_exact, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(out.cov, cov_exact, rtol=1e-2, atol=1e-4)
    assert float(out.delta) < 1e-4


def test_probit_matches_1d_grid_oracle_and_ep():
    rng = np.random.default_rng(1)
    x = rng.normal(size=50).astype(np.float32)
    y = np.where(rng.uniform(size=50) < _phi(1.2 * x), 1.0, -1.0).astype(np.float32)
    yj = jnp.asarray(y)

    def log_lik(z):
        return jax.scipy.stats.norm.logcdf(yj[:, None] * z)

    out = cvi_linear_model(
        jnp.asarray(x[:, None]), log_lik, prior_var=4.0, n_iters=150, step_size=0.5
    )
    # dense grid oracle
    from scipy.stats import norm as snorm

    grid = np.linspace(-6, 6, 4001)
    logp = -0.5 * grid**2 / 4.0
    for xi, yi in zip(x, y):
        logp += snorm.logcdf(yi * xi * grid)
    p = np.exp(logp - logp.max())
    p /= np.trapezoid(p, grid)
    mean_o = np.trapezoid(grid * p, grid)
    var_o = np.trapezoid((grid - mean_o) ** 2 * p, grid)
    assert abs(float(out.mean[0]) - mean_o) < 0.05
    # VI underestimates variance vs the exact posterior but must be close.
    assert abs(float(out.cov[0, 0]) - var_o) < 0.25 * var_o

    ep = ep_linear_model(jnp.asarray(x[:, None]), probit_tilted_moments(yj), prior_var=4.0)
    assert abs(float(out.mean[0]) - float(ep.mean[0])) < 0.05


def test_elbo_ascends():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(60, 2)).astype(np.float32)
    logits = X @ np.array([1.0, -1.0]) + 0.3 * rng.normal(size=60)
    y = np.where(logits > 0, 1.0, -1.0).astype(np.float32)
    yj = jnp.asarray(y)

    def log_lik(z):
        return jax.nn.log_sigmoid(yj[:, None] * z)

    out = cvi_linear_model(jnp.asarray(X), log_lik, n_iters=80, step_size=0.4)
    e = np.asarray(out.elbo_trace)
    # After the first few damped steps the ELBO increases monotonically.
    tail = e[5:]
    assert np.all(np.diff(tail) > -1e-3)
    assert tail[-1] > e[0]


def test_poisson_sites_match_grid_oracle():
    rng = np.random.default_rng(3)
    x = rng.normal(size=60).astype(np.float32) * 0.7
    y = rng.poisson(np.exp(0.8 * x)).astype(np.float32)
    yj = jnp.asarray(y)

    def log_lik(z):
        zc = jnp.clip(z, -30.0, 30.0)
        return yj[:, None] * zc - jnp.exp(zc)

    out = cvi_linear_model(
        jnp.asarray(x[:, None]), log_lik, prior_var=2.0, n_iters=200, step_size=0.3
    )
    grid = np.linspace(-3, 3, 4001)
    logp = -0.5 * grid**2 / 2.0
    for xi, yi in zip(x, y):
        z = xi * grid
        logp += yi * z - np.exp(z)
    p = np.exp(logp - logp.max())
    p /= np.trapezoid(p, grid)
    mean_o = np.trapezoid(grid * p, grid)
    assert abs(float(out.mean[0]) - mean_o) < 0.05


def test_jits_cleanly():
    rng = np.random.default_rng(4)
    X = jnp.asarray(rng.normal(size=(30, 2)), jnp.float32)
    y = jnp.asarray(np.sign(rng.normal(size=30)), jnp.float32)

    @jax.jit
    def run(X):
        return cvi_linear_model(
            X, lambda z: jax.nn.log_sigmoid(y[:, None] * z), n_iters=20
        ).mean

    m = run(X)
    assert m.shape == (2,) and bool(jnp.all(jnp.isfinite(m)))


def _phi(z):
    from scipy.stats import norm as snorm

    return snorm.cdf(z)
