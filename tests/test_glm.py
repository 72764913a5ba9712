"""GLM family: conjugate linear regression (NIG oracles) and Poisson EP
(grid oracle + recovery).  Also pins that BayesianAR delegates to the same
NIG algebra (refactor guard).
"""

import numpy as np
import jax.numpy as jnp

from cortex_tpu.models import (
    BayesianAR,
    BayesianLinearRegression,
    PoissonRegression,
    nig_fit,
)


def test_nig_fit_matches_numpy_oracle_batched():
    rng = np.random.default_rng(0)
    n = 200
    X = rng.normal(size=(3, n, 4)).astype(np.float32)
    w = rng.normal(size=4)
    t = (X @ w + 0.3 * rng.normal(size=(3, n))).astype(np.float32)
    post = nig_fit(jnp.asarray(X), jnp.asarray(t), prior_scale=25.0, a0=2.5, b0=0.5)
    for b in range(3):
        Xb = X[b].astype(np.float64)
        tb = t[b].astype(np.float64)
        prec = np.eye(4) / 25.0 + Xb.T @ Xb
        Vn = np.linalg.inv(prec)
        mn = Vn @ (Xb.T @ tb)
        bn = 0.5 + 0.5 * (tb @ tb - mn @ prec @ mn)
        np.testing.assert_allclose(post.mean[b], mn, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(post.cov_scale[b], Vn, rtol=1e-2, atol=1e-6)
        np.testing.assert_allclose(post.b[b], bn, rtol=1e-2)
    # coefficient recovery + noise recovery
    np.testing.assert_allclose(post.mean, np.tile(w, (3, 1)), atol=0.1)
    np.testing.assert_allclose(post.noise_mean, 0.09, rtol=0.2)


def test_linreg_predictive_matches_student_t_mc():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(60, 3)).astype(np.float32)
    w = np.array([1.0, -2.0, 0.5])
    y = (X @ w + 0.5 * rng.normal(size=60)).astype(np.float32)
    model = BayesianLinearRegression(prior_scale=10.0)
    post = model.fit(jnp.asarray(X), jnp.asarray(y))
    Xs = rng.normal(size=(10, 3)).astype(np.float32)
    mean, scale2, dof = model.predictive(post, jnp.asarray(Xs))
    # MC from the NIG: σ² ~ InvGamma(a,b), w|σ² ~ N(m, σ² V), y* = x·w + ε.
    a, b = float(post.a), float(post.b)
    V = np.asarray(post.cov_scale, np.float64)
    m = np.asarray(post.mean, np.float64)
    n_mc = 200_000
    sig2 = b / rng.gamma(a, size=n_mc)
    L = np.linalg.cholesky(V)
    ws = m[None] + (rng.normal(size=(n_mc, 3)) @ L.T) * np.sqrt(sig2)[:, None]
    ystar = Xs @ ws.T + rng.normal(size=(10, n_mc)) * np.sqrt(sig2)[None, :]
    np.testing.assert_allclose(mean, ystar.mean(axis=1), atol=0.03)
    var_mc = ystar.var(axis=1)
    var_t = np.asarray(scale2) * float(dof) / (float(dof) - 2.0)
    np.testing.assert_allclose(var_t, var_mc, rtol=0.05)


def test_ar_delegates_to_nig_on_lag_design():
    rng = np.random.default_rng(2)
    y = rng.normal(size=200).astype(np.float32)
    post_ar = BayesianAR(p=2, prior_scale=30.0).fit(jnp.asarray(y))
    X = np.stack([y[1:-1], y[:-2]], axis=-1)
    post_direct = nig_fit(jnp.asarray(X), jnp.asarray(y[2:]), prior_scale=30.0)
    np.testing.assert_allclose(post_ar.mean, post_direct.mean, rtol=1e-5)
    np.testing.assert_allclose(post_ar.log_evidence, post_direct.log_evidence, rtol=1e-5)


def test_evidence_favors_true_model_order():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(150, 2)).astype(np.float32)
    y = (X @ np.array([1.0, -1.0]) + 0.3 * rng.normal(size=150)).astype(np.float32)
    ev_full = float(nig_fit(jnp.asarray(X), jnp.asarray(y)).log_evidence)
    ev_sub = float(nig_fit(jnp.asarray(X[:, :1]), jnp.asarray(y)).log_evidence)
    Xpad = np.concatenate([X, rng.normal(size=(150, 3)).astype(np.float32)], axis=1)
    ev_over = float(nig_fit(jnp.asarray(Xpad), jnp.asarray(y)).log_evidence)
    assert ev_full > ev_sub  # missing a real predictor is much worse
    assert ev_full > ev_over  # Occam penalty on spurious predictors


def test_poisson_regression_recovers_rates():
    rng = np.random.default_rng(4)
    X = rng.normal(size=(300, 2)).astype(np.float32) * 0.8
    w = np.array([0.8, -0.5])
    lam = np.exp(X @ w)
    y = rng.poisson(lam).astype(np.float32)
    post = PoissonRegression(prior_var=4.0).fit(jnp.asarray(X), jnp.asarray(y))
    np.testing.assert_allclose(post.mean, w, atol=0.15)
    rates = post.predict_rate(jnp.asarray(X))
    # predictive rates track the truth in aggregate
    assert float(jnp.corrcoef(jnp.log(rates), jnp.asarray(np.log(lam)))[0, 1]) > 0.95


def test_poisson_posterior_matches_1d_grid_oracle():
    rng = np.random.default_rng(5)
    x = rng.normal(size=40).astype(np.float32)
    w_true = 0.7
    y = rng.poisson(np.exp(w_true * x)).astype(np.float32)
    post = PoissonRegression(prior_var=2.0, n_iters=100).fit(
        jnp.asarray(x[:, None]), jnp.asarray(y)
    )
    grid = np.linspace(-3, 3, 4001)
    logp = -0.5 * grid**2 / 2.0
    for xi, yi in zip(x, y):
        z = xi * grid
        logp += yi * z - np.exp(z)
    p = np.exp(logp - logp.max())
    p /= np.trapezoid(p, grid)
    mean_o = np.trapezoid(grid * p, grid)
    var_o = np.trapezoid((grid - mean_o) ** 2 * p, grid)
    assert abs(float(post.mean[0]) - mean_o) < 0.03
    assert abs(float(post.cov[0, 0]) - var_o) < 0.02 * max(1.0, var_o / 0.02)
