"""Tests for KL divergences and the extra families (NormalGamma, Wishart,
Poisson).  KLs are validated against Monte-Carlo estimates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cortex_tpu.dists import (
    Bernoulli,
    Beta,
    Categorical,
    Dirichlet,
    Gamma,
    NormalGamma,
    Poisson,
    Wishart,
)


def mc_kl(p_logpdf, q_logpdf, samples):
    return float(np.mean(p_logpdf(samples) - q_logpdf(samples)))


def test_beta_kl_monte_carlo():
    p = Beta(jnp.asarray(3.0), jnp.asarray(2.0))
    q = Beta(jnp.asarray(1.5), jnp.asarray(4.0))
    xs = p.sample(jax.random.PRNGKey(0), (200_000,))
    est = mc_kl(lambda x: np.asarray(p.logpdf(x)), lambda x: np.asarray(q.logpdf(x)), xs)
    assert float(p.kl(q)) == pytest.approx(est, abs=0.02)
    assert float(p.kl(p)) == pytest.approx(0.0, abs=1e-5)


def test_gamma_kl_monte_carlo():
    p = Gamma(jnp.asarray(4.0), jnp.asarray(2.0))
    q = Gamma(jnp.asarray(2.0), jnp.asarray(1.0))
    xs = p.sample(jax.random.PRNGKey(1), (200_000,))
    est = mc_kl(lambda x: np.asarray(p.logpdf(x)), lambda x: np.asarray(q.logpdf(x)), xs)
    assert float(p.kl(q)) == pytest.approx(est, abs=0.02)
    assert float(p.kl(p)) == pytest.approx(0.0, abs=1e-5)


def test_bernoulli_kl_closed_form():
    p = Bernoulli.from_prob(0.8)
    q = Bernoulli.from_prob(0.3)
    expected = 0.8 * np.log(0.8 / 0.3) + 0.2 * np.log(0.2 / 0.7)
    assert float(p.kl(q)) == pytest.approx(expected, rel=1e-4)
    assert float(p.kl(p)) == pytest.approx(0.0, abs=1e-6)


def test_categorical_kl_closed_form():
    p = Categorical.from_probs(jnp.array([0.5, 0.3, 0.2]))
    q = Categorical.from_probs(jnp.array([0.2, 0.5, 0.3]))
    pp, qq = np.array([0.5, 0.3, 0.2]), np.array([0.2, 0.5, 0.3])
    expected = float(np.sum(pp * np.log(pp / qq)))
    assert float(p.kl(q)) == pytest.approx(expected, rel=1e-4)


def test_dirichlet_kl_vs_hmm_helper():
    from cortex_tpu.models.hmm import _dirichlet_kl

    a1 = jnp.array([2.0, 3.0, 4.0])
    a2 = jnp.array([1.0, 1.0, 1.0])
    assert float(Dirichlet(a1).kl(Dirichlet(a2))) == pytest.approx(
        float(_dirichlet_kl(a1, a2)), rel=1e-5
    )


def test_normal_gamma_moments_and_kl():
    p = NormalGamma(
        jnp.asarray(1.0), jnp.asarray(2.0), jnp.asarray(3.0), jnp.asarray(2.0)
    )
    assert float(p.mean_tau) == pytest.approx(1.5)
    assert float(p.kl(p)) == pytest.approx(0.0, abs=1e-5)
    q = NormalGamma(
        jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(1.0), jnp.asarray(1.0)
    )
    assert float(p.kl(q)) > 0.0
    # Samples have the right conditional structure.
    mu, tau = p.sample(jax.random.PRNGKey(2), (100_000,))
    assert float(np.mean(tau)) == pytest.approx(1.5, abs=0.02)
    assert float(np.mean(mu)) == pytest.approx(1.0, abs=0.02)


def test_normal_gamma_product_is_conjugate_posterior():
    """NG(prior) x NG(one-observation likelihood message) behaves like the
    exact conjugate update for one Gaussian observation."""
    m0, b0, a0, beta0 = 0.0, 1.0, 1.5, 1.0
    prior = NormalGamma(
        jnp.asarray(m0), jnp.asarray(beta0), jnp.asarray(a0), jnp.asarray(b0)
    )
    x = 2.0
    # Likelihood N(x | mu, tau^-1) as a NormalGamma message: matching the NG
    # density tau^{a-1/2} e^{-b tau - beta tau (mu-m)^2/2} with
    # tau^{1/2} e^{-tau/2 (x-mu)^2} gives m=x, beta=1, a=1, b=0.
    like = NormalGamma(
        jnp.asarray(x), jnp.asarray(1.0), jnp.asarray(1.0), jnp.asarray(0.0)
    )
    post = prior * like
    # Standard conjugate update for n=1 observation:
    beta_n = beta0 + 1.0
    m_n = (beta0 * m0 + x) / beta_n
    a_n = a0 + 0.5
    b_n = b0 + 0.5 * beta0 * (x - m0) ** 2 / beta_n
    assert float(post.m) == pytest.approx(m_n, rel=1e-6)
    assert float(post.beta) == pytest.approx(beta_n, rel=1e-6)
    assert float(post.a) == pytest.approx(a_n, rel=1e-6)
    assert float(post.b) == pytest.approx(b_n, rel=1e-6)


def test_wishart_moments():
    V = jnp.asarray([[2.0, 0.3], [0.3, 1.0]])
    w = Wishart(jnp.asarray(5.0), V)
    np.testing.assert_allclose(np.asarray(w.mean), 5.0 * np.asarray(V), rtol=1e-6)
    # E[log|X|] against Monte Carlo.
    keys = jax.random.split(jax.random.PRNGKey(3), 20000)
    samples = jax.vmap(w.sample)(keys)
    mc = float(np.mean(np.linalg.slogdet(np.asarray(samples))[1]))
    assert float(w.mean_logdet()) == pytest.approx(mc, abs=0.05)


def test_wishart_product():
    V = jnp.eye(2) * 2.0
    w = Wishart(jnp.asarray(4.0), V)
    prod = w * w
    assert float(prod.n) == pytest.approx(4.0 + 4.0 - 3.0)
    np.testing.assert_allclose(np.asarray(prod.V), np.asarray(V) / 2.0, rtol=1e-5)


def test_poisson():
    p = Poisson.from_rate(3.0)
    assert float(p.mean) == pytest.approx(3.0, rel=1e-5)
    q = Poisson.from_rate(5.0)
    xs = np.asarray(p.sample(jax.random.PRNGKey(4), (200_000,)))
    est = float(np.mean(np.asarray(p.logpmf(xs)) - np.asarray(q.logpmf(xs))))
    assert float(p.kl(q)) == pytest.approx(est, abs=0.02)
    # Product adds log rates.
    assert float((p * q).rate) == pytest.approx(15.0, rel=1e-4)
