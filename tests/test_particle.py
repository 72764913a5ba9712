"""Particle filter tests: parity with the exact Kalman filter on linear
models, resampling correctness, ESS behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cortex_tpu.models import LGSSM
from cortex_tpu.models.particle import particle_filter, systematic_resample


def test_systematic_resample_preserves_weight_proportions():
    key = jax.random.PRNGKey(0)
    log_w = jnp.log(jnp.asarray([0.5, 0.3, 0.15, 0.05]))
    counts = np.zeros(4)
    for i in range(200):
        idx = systematic_resample(jax.random.fold_in(key, i), log_w)
        counts += np.bincount(np.asarray(idx), minlength=4)
    freqs = counts / counts.sum()
    np.testing.assert_allclose(freqs, [0.5, 0.3, 0.15, 0.05], atol=0.02)


def test_particle_filter_matches_kalman_on_linear_model():
    model = LGSSM(A=0.9, Q=0.3, H=1.0, R=0.5)
    key = jax.random.PRNGKey(0)
    _, y = model.sample(key, T=60)

    n = 20_000
    kp, kf = jax.random.split(jax.random.PRNGKey(1))
    init = jnp.sqrt(10.0) * jax.random.normal(kp, (n,))

    def transition(k, x):
        return 0.9 * x + jnp.sqrt(0.3) * jax.random.normal(k, x.shape)

    def log_lik(y_t, x):
        return -0.5 * ((y_t - x) ** 2 / 0.5 + jnp.log(2 * jnp.pi * 0.5))

    result = jax.jit(
        lambda k, data: particle_filter(k, data, transition, log_lik, init)
    )(kf, y)

    exact = model.filter(y, prior=(0.0, 10.0))
    err = np.abs(np.asarray(result.means) - np.asarray(exact.mean))
    assert err.mean() < 0.05
    # Log evidence close to the exact prediction-error value.
    exact_logZ = float(model.log_evidence(y, prior=(0.0, 10.0)))
    assert float(result.log_evidence) == pytest.approx(exact_logZ, abs=1.5)
    # ESS stays reasonable with adaptive resampling.
    assert float(np.asarray(result.ess).min()) > 0.05 * n


def test_particle_filter_tracks_nonlinear_model():
    """Monotone nonlinear observation (exp): the PF handles what the Kalman
    filter cannot represent (a |x| observation would make the posterior
    symmetric-bimodal with mean 0 — correct but untestable via the mean)."""
    rng = np.random.default_rng(0)
    T = 80
    x_true = np.zeros(T)
    for t in range(1, T):
        x_true[t] = 0.95 * x_true[t - 1] + 0.5 * rng.normal()
    y = np.exp(x_true / 2.0) + 0.05 * rng.normal(size=T)

    n = 10_000
    init = 2.0 * jax.random.normal(jax.random.PRNGKey(0), (n,))

    def transition(k, x):
        return 0.95 * x + 0.5 * jax.random.normal(k, x.shape)

    def log_lik(y_t, x):
        return -0.5 * (y_t - jnp.exp(x / 2.0)) ** 2 / 0.0025

    result = particle_filter(
        jax.random.PRNGKey(2), jnp.asarray(y), transition, log_lik, init
    )
    err = np.abs(np.asarray(result.means[10:]) - x_true[10:])
    assert err.mean() < 0.25
