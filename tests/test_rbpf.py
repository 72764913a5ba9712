"""Rao-Blackwellized particle filter tests.

Oracles: with K=1 the regime path is deterministic, so the log-evidence
estimate must equal the EXACT Kalman evidence (zero Monte-Carlo variance);
with 2 regimes it must track the truth and agree with the IMM filter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cortex_tpu.models import LGSSM, SLDS, rbpf_filter


def test_k1_log_evidence_is_exact():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=80).cumsum(), dtype=jnp.float32)
    slds = SLDS(
        Pi=jnp.ones((1, 1)), A=jnp.array([0.9]), Q=jnp.array([0.4]),
        H=jnp.array([1.0]), R=jnp.array([0.6]), prior=(0.0, 2.0),
    )
    res = rbpf_filter(jax.random.PRNGKey(0), slds, y, n_particles=16)
    exact = LGSSM(A=0.9, Q=0.4, H=1.0, R=0.6).log_evidence(y, prior=(0.0, 2.0))
    np.testing.assert_allclose(float(res.log_evidence), float(exact), rtol=1e-4)
    # No weight degeneracy is possible with one regime.
    np.testing.assert_allclose(np.asarray(res.ess), 16.0, rtol=1e-4)
    # State beliefs equal the exact Kalman filter.
    kal = LGSSM(A=0.9, Q=0.4, H=1.0, R=0.6).filter(
        y, prior=(jnp.asarray(0.0), jnp.asarray(2.0))
    )
    np.testing.assert_allclose(np.asarray(res.mean), np.asarray(kal.mean),
                               rtol=1e-4, atol=1e-5)


def _two_regime_model():
    return SLDS(
        Pi=jnp.array([[0.97, 0.03], [0.03, 0.97]]),
        A=jnp.array([0.98, 0.98]),
        Q=jnp.array([0.02, 2.0]),
        H=jnp.array([1.0, 1.0]),
        R=jnp.array([0.1, 0.1]),
        prior=(0.0, 1.0),
    )


def test_two_regime_tracking_and_imm_agreement():
    model = _two_regime_model()
    s, _, y = model.sample(jax.random.PRNGKey(3), T=300)
    res = rbpf_filter(jax.random.PRNGKey(4), model, y, n_particles=1024)

    picked = np.argmax(np.asarray(res.regime_probs), axis=-1)
    acc = float(np.mean(picked == np.asarray(s)))
    assert acc > 0.8, acc

    imm = model.filter(y)
    # Same evidence up to Monte-Carlo + ADF approximation error.
    assert abs(float(res.log_evidence) - float(imm.loglik)) < 8.0
    # Regime posteriors broadly agree.
    disagree = np.mean(
        np.abs(np.asarray(res.regime_probs)[:, 1] - np.asarray(imm.regime_probs)[:, 1])
    )
    assert disagree < 0.1, disagree


def test_vmapped_replicas_and_jit():
    model = _two_regime_model()
    _, _, y = model.sample(jax.random.PRNGKey(5), T=60, batch_shape=(4,))
    keys = jax.random.split(jax.random.PRNGKey(6), 4)
    run = jax.jit(jax.vmap(lambda k, d: rbpf_filter(k, model, d, n_particles=256)))
    res = run(keys, y)
    assert res.regime_probs.shape == (4, 60, 2)
    assert res.mean.shape == (4, 60)
    assert res.log_evidence.shape == (4,)
    np.testing.assert_allclose(np.asarray(res.regime_probs).sum(-1), 1.0, rtol=1e-4)
    assert np.all(np.isfinite(np.asarray(res.log_evidence)))
