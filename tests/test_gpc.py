"""GP classification (EP): linear-kernel equivalence with the parametric EP
classifier, nonlinear separation where linear fails, MC-calibrated
predictives, and convergence.
"""

import numpy as np
import jax.numpy as jnp

from cortex_tpu.models import EPClassifier, GPClassifier


def test_linear_kernel_matches_parametric_ep_classifier():
    """k(x,x') = x·x' with unit variance ⇔ Bayesian linear probit with unit
    prior: latent means and predictive probabilities must agree."""
    rng = np.random.default_rng(0)
    X = rng.normal(size=(60, 2)).astype(np.float32)
    y = np.where(X[:, 0] + 0.5 * X[:, 1] > 0, 1.0, -1.0).astype(np.float32)
    gpc = GPClassifier(kernel="linear", variance=1.0, n_iters=60).fit(
        jnp.asarray(X), jnp.asarray(y)
    )
    lin = EPClassifier(likelihood="probit", prior_var=1.0, n_iters=60).fit(
        jnp.asarray(X), jnp.asarray(y)
    )
    Xs = rng.normal(size=(25, 2)).astype(np.float32)
    mu_g, var_g = gpc.latent(jnp.asarray(Xs))
    mu_l, var_l = lin.latent(jnp.asarray(Xs))
    np.testing.assert_allclose(mu_g, mu_l, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(var_g, var_l, rtol=5e-2, atol=2e-2)
    np.testing.assert_allclose(
        gpc.predict_proba(jnp.asarray(Xs)), lin.predict_proba(jnp.asarray(Xs)), atol=0.01
    )


def test_rbf_separates_nonlinear_boundary_where_linear_fails():
    rng = np.random.default_rng(1)
    x = np.linspace(-3, 3, 120).astype(np.float32)[:, None]
    y = np.sign(np.sin(2.0 * x[:, 0])).astype(np.float32)
    gpc = GPClassifier(kernel="rbf", lengthscale=0.5, variance=4.0).fit(
        jnp.asarray(x), jnp.asarray(y)
    )
    acc_gp = float(jnp.mean(gpc.predict(jnp.asarray(x)) == y))
    lin = EPClassifier(likelihood="probit").fit(jnp.asarray(x), jnp.asarray(y))
    acc_lin = float(jnp.mean(lin.predict(jnp.asarray(x)) == y))
    assert acc_gp > 0.95
    assert acc_lin < 0.75  # a line cannot track sin(2x)


def test_predictive_probabilities_calibrated_and_converged():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(80, 2)).astype(np.float32)
    f = np.sin(X[:, 0]) + 0.5 * X[:, 1]
    y = np.where(rng.uniform(size=80) < _phi(2.0 * f), 1.0, -1.0).astype(np.float32)
    gpc = GPClassifier(kernel="rbf", lengthscale=1.0, variance=2.0, n_iters=60).fit(
        jnp.asarray(X), jnp.asarray(y)
    )
    assert float(gpc.site_delta) < 1e-3
    p = gpc.predict_proba(jnp.asarray(X))
    assert bool(jnp.all((p >= 0) & (p <= 1)))
    # Calibration: mean predicted probability ≈ empirical positive rate.
    assert abs(float(jnp.mean(p)) - float(np.mean(y > 0))) < 0.08


def test_latent_variance_grows_away_from_data():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, size=(40, 1)).astype(np.float32)
    y = np.sign(x[:, 0]).astype(np.float32)
    gpc = GPClassifier(kernel="rbf", lengthscale=0.7, variance=1.5).fit(
        jnp.asarray(x), jnp.asarray(y)
    )
    _, var_in = gpc.latent(jnp.asarray([[0.0]], jnp.float32))
    _, var_out = gpc.latent(jnp.asarray([[5.0]], jnp.float32))
    assert float(var_out[0]) > float(var_in[0])
    # Far from data the predictive collapses to the prior probability 1/2.
    p_far = float(gpc.predict_proba(jnp.asarray([[25.0]], jnp.float32))[0])
    assert abs(p_far - 0.5) < 0.05


def _phi(z):
    from scipy.stats import norm as snorm

    return snorm.cdf(z)
