"""HMC tests.

Oracles: analytic Gaussian moments (correlated 2-D target), the exact
conjugate Beta posterior for a Bernoulli model sampled in logit space, and
acceptance-rate adaptation hitting its target."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cortex_tpu.ops import hmc_sample


def _run_chains(logp, init, n_chains=32, **kw):
    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)
    run = jax.jit(jax.vmap(lambda k: hmc_sample(k, logp, init, **kw)))
    return run(keys)


def test_correlated_gaussian_moments():
    cov = jnp.asarray([[2.0, 1.2], [1.2, 1.0]])
    prec = jnp.linalg.inv(cov)
    mean = jnp.asarray([1.0, -2.0])

    def logp(x):
        d = x - mean
        return -0.5 * d @ prec @ d

    res = _run_chains(logp, jnp.zeros(2), n_samples=500, n_warmup=400)
    draws = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(axis=0), np.asarray(mean), atol=0.08)
    np.testing.assert_allclose(np.cov(draws.T), np.asarray(cov), atol=0.25)
    acc = float(np.mean(np.asarray(res.accept_rate)))
    assert 0.6 < acc <= 1.0, acc


def test_anisotropic_scales_handled_by_mass_adaptation():
    """Variances spread over 4 orders of magnitude: without the adapted
    diagonal mass matrix this mixes pathologically."""
    sd = jnp.asarray([100.0, 1.0, 0.01])

    def logp(x):
        return -0.5 * jnp.sum((x / sd) ** 2)

    res = _run_chains(logp, jnp.ones(3), n_samples=600, n_warmup=600)
    draws = np.asarray(res.samples).reshape(-1, 3)
    ratio = draws.std(axis=0) / np.asarray(sd)
    np.testing.assert_allclose(ratio, 1.0, atol=0.25)


def test_beta_bernoulli_logit_matches_conjugate():
    """p ~ U(0,1), y_i ~ Bernoulli(p), sampled in logit space — posterior
    of p must match the exact Beta(1+h, 1+t) (the reference's coin-toss
    oracle, test/inference_engine_tests.jl:366-376)."""
    rng = np.random.default_rng(0)
    y = (rng.random(50) < 0.7).astype(np.float32)
    h, t = float(y.sum()), float((1 - y).sum())
    yj = jnp.asarray(y)

    def logp(logit):
        # log p(y|p) + log-uniform prior + logit-transform Jacobian.
        lp = jax.nn.log_sigmoid(logit)
        lq = jax.nn.log_sigmoid(-logit)
        return jnp.sum(yj * lp + (1 - yj) * lq) + lp + lq

    res = _run_chains(
        logp, jnp.asarray(0.0), n_chains=64, n_samples=400, n_warmup=400,
        n_leapfrog=16,
    )
    p_draws = 1.0 / (1.0 + np.exp(-np.asarray(res.samples).reshape(-1)))
    a, b = 1 + h, 1 + t
    exact_mean = a / (a + b)
    exact_var = a * b / ((a + b) ** 2 * (a + b + 1))
    assert p_draws.mean() == pytest.approx(exact_mean, abs=0.015)
    assert p_draws.var() == pytest.approx(exact_var, rel=0.3)


def test_pytree_positions():
    def logp(tree):
        return -0.5 * jnp.sum(tree["a"] ** 2) - 0.5 * jnp.sum((tree["b"] - 3.0) ** 2)

    res = hmc_sample(
        jax.random.PRNGKey(1),
        logp,
        {"a": jnp.zeros((2, 2)), "b": jnp.zeros(3)},
        n_samples=400,
        n_warmup=300,
    )
    assert res.samples["a"].shape == (400, 2, 2)
    assert res.samples["b"].shape == (400, 3)
    assert np.asarray(res.samples["b"]).reshape(-1).mean() == pytest.approx(3.0, abs=0.2)
    assert float(res.step_size) > 0
