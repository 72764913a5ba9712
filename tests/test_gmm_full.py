"""Full-covariance VB-GMM tests: monotone free energy, correlated-cluster
recovery (beyond the diagonal model), batching, jit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cortex_tpu.models.gmm_full import GMMFull


def _correlated_clusters(rng, n_per=150):
    """Two clusters with strong, opposite correlations."""
    c1 = np.array([[1.0, 0.9], [0.9, 1.0]])
    c2 = np.array([[1.0, -0.85], [-0.85, 1.0]])
    a = rng.multivariate_normal([-3.0, 0.0], 0.5 * c1, size=n_per)
    b = rng.multivariate_normal([3.0, 0.0], 0.5 * c2, size=n_per)
    x = np.concatenate([a, b]).astype(np.float32)
    rng.shuffle(x)
    return x, (c1, c2)


def test_free_energy_monotone():
    rng = np.random.default_rng(0)
    x, _ = _correlated_clusters(rng)
    gmm = GMMFull(K=2)
    result = gmm.fit(jnp.asarray(x), n_iterations=40, key=jax.random.PRNGKey(1))
    fe = np.asarray(result.free_energy)
    assert np.all(np.isfinite(fe))
    assert np.all(np.diff(fe) <= 1e-2)


def test_recovers_correlation_structure():
    rng = np.random.default_rng(1)
    x, (c1, c2) = _correlated_clusters(rng)
    gmm = GMMFull(K=2)
    result = gmm.fit(jnp.asarray(x), n_iterations=60, key=jax.random.PRNGKey(0))

    means = np.asarray(result.posterior.means)
    covs = np.asarray(result.posterior.expected_covariances)
    # Match components to true clusters by mean.
    left = int(np.argmin(means[:, 0]))
    right = 1 - left
    corr_left = covs[left][0, 1] / np.sqrt(covs[left][0, 0] * covs[left][1, 1])
    corr_right = covs[right][0, 1] / np.sqrt(covs[right][0, 0] * covs[right][1, 1])
    assert corr_left > 0.6  # true 0.9
    assert corr_right < -0.6  # true -0.85
    assert abs(means[left][0] + 3.0) < 0.3
    assert abs(means[right][0] - 3.0) < 0.3


def test_weights_recovered():
    rng = np.random.default_rng(2)
    a = rng.multivariate_normal([-4, 0], np.eye(2) * 0.3, size=300)
    b = rng.multivariate_normal([4, 0], np.eye(2) * 0.3, size=100)
    x = np.concatenate([a, b]).astype(np.float32)
    gmm = GMMFull(K=2)
    result = gmm.fit(jnp.asarray(x), n_iterations=60, key=jax.random.PRNGKey(2))
    w = np.sort(np.asarray(result.posterior.weights))
    np.testing.assert_allclose(w, [0.25, 0.75], atol=0.04)


def test_batched_and_jit():
    rng = np.random.default_rng(3)
    xs = np.stack([_correlated_clusters(rng, n_per=60)[0] for _ in range(3)])
    gmm = GMMFull(K=2)
    fit = jax.jit(
        lambda data: gmm.fit(data, n_iterations=20, key=jax.random.PRNGKey(0))
    )
    result = fit(jnp.asarray(xs))
    assert result.posterior.m.shape == (3, 2, 2)
    assert result.free_energy.shape == (3, 20)
    fe = np.asarray(result.free_energy)
    assert np.all(np.diff(fe, axis=-1) <= 1e-2)
