"""Switching LGSSM (IMM) tests.

Oracles: K=1 must reduce to the exact Kalman filter (`models.LGSSM`); a
2-regime model with well-separated noise scales must classify the true
regimes from data; degenerate (identical-regime) models must match K=1."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cortex_tpu.models import LGSSM, SLDS


def _data(T=60, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=T).cumsum(), dtype=jnp.float32)


def test_k1_reduces_to_exact_kalman():
    y = _data()
    slds = SLDS(
        Pi=jnp.ones((1, 1)),
        A=jnp.array([0.9]),
        Q=jnp.array([0.4]),
        H=jnp.array([1.0]),
        R=jnp.array([0.6]),
        prior=(0.0, 2.0),
    )
    ref = LGSSM(A=0.9, Q=0.4, H=1.0, R=0.6)
    got = slds.filter(y)
    exact = ref.filter(y, prior=(jnp.asarray(0.0), jnp.asarray(2.0)))
    np.testing.assert_allclose(got.mean, exact.mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.variance, exact.variance, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        got.loglik, ref.log_evidence(y, prior=(0.0, 2.0)), rtol=1e-4
    )
    np.testing.assert_allclose(got.regime_probs[..., 0], 1.0)


def test_identical_regimes_match_k1():
    """Two regimes with identical parameters: the mixture is degenerate and
    the state beliefs must equal the single-regime filter."""
    y = _data(seed=1)
    single = SLDS(
        Pi=jnp.ones((1, 1)), A=jnp.array([0.8]), Q=jnp.array([0.3]),
        H=jnp.array([1.0]), R=jnp.array([0.5]),
    )
    double = SLDS(
        Pi=jnp.full((2, 2), 0.5), A=jnp.array([0.8, 0.8]), Q=jnp.array([0.3, 0.3]),
        H=jnp.array([1.0, 1.0]), R=jnp.array([0.5, 0.5]),
    )
    a, b = single.filter(y), double.filter(y)
    np.testing.assert_allclose(a.mean, b.mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(a.variance, b.variance, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(a.loglik, b.loglik, rtol=1e-4)


def _two_regime_model():
    return SLDS(
        Pi=jnp.array([[0.97, 0.03], [0.03, 0.97]]),
        A=jnp.array([0.98, 0.98]),
        Q=jnp.array([0.02, 2.0]),  # calm vs volatile
        H=jnp.array([1.0, 1.0]),
        R=jnp.array([0.1, 0.1]),
        prior=(0.0, 1.0),
    )


def test_regime_classification():
    model = _two_regime_model()
    s, x, y = model.sample(jax.random.PRNGKey(0), T=400, batch_shape=(8,))
    beliefs = model.filter(y)
    picked = jnp.argmax(beliefs.regime_probs, axis=-1)
    acc = float(jnp.mean(picked == s))
    assert acc > 0.8, acc
    # ADF evidence beats a mis-specified single-regime model.
    single = LGSSM(A=0.98, Q=0.02, H=1.0, R=0.1)
    assert float(beliefs.loglik.mean()) > float(
        single.log_evidence(y, prior=(0.0, 1.0)).mean()
    )


def test_batched_matches_single_and_jits():
    model = _two_regime_model()
    _, _, y = model.sample(jax.random.PRNGKey(1), T=50, batch_shape=(3, 4))
    beliefs = jax.jit(model.filter)(y)
    assert beliefs.mean.shape == (3, 4, 50)
    assert beliefs.regime_probs.shape == (3, 4, 50, 2)
    assert beliefs.loglik.shape == (3, 4)
    one = model.filter(y[2, 1])
    np.testing.assert_allclose(beliefs.mean[2, 1], one.mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(beliefs.loglik[2, 1], one.loglik, rtol=1e-5)
    probs = np.asarray(beliefs.regime_probs)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-5)


def test_sample_shapes():
    model = _two_regime_model()
    s, x, y = model.sample(jax.random.PRNGKey(2), T=30, batch_shape=(5,))
    assert s.shape == x.shape == y.shape == (5, 30)
    assert s.dtype in (jnp.int32, jnp.int64)
    assert set(np.unique(np.asarray(s))) <= {0, 1}
