"""VB-GMM tests: free-energy monotonicity, cluster recovery, batching, jit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cortex_tpu.models.gmm import GMM


def _three_clusters(rng, n_per=100, d=2, spread=0.3):
    centers = np.array([[-3.0, 0.0], [3.0, 0.0], [0.0, 4.0]])[:, :d]
    xs = np.concatenate(
        [c + spread * rng.normal(size=(n_per, d)) for c in centers]
    )
    rng.shuffle(xs)
    return xs.astype(np.float32), centers


def test_free_energy_monotone_decreasing():
    rng = np.random.default_rng(0)
    x, _ = _three_clusters(rng)
    gmm = GMM(K=3)
    result = gmm.fit(jnp.asarray(x), n_iterations=40, key=jax.random.PRNGKey(1))
    fe = np.asarray(result.free_energy)
    assert fe.shape == (40,)
    assert np.all(np.isfinite(fe))
    # Variational free energy decreases monotonically (up to float noise).
    assert np.all(np.diff(fe) <= 1e-2)
    # And has improved overall (converges almost immediately on well-
    # separated data initialized at data points).
    assert fe[-1] < fe[0]


def test_recovers_cluster_means():
    rng = np.random.default_rng(1)
    x, centers = _three_clusters(rng)
    gmm = GMM(K=3)
    result = gmm.fit(jnp.asarray(x), n_iterations=60, key=jax.random.PRNGKey(0))
    means = np.asarray(result.posterior.means)  # (3, 2)
    # Match each true center to the nearest recovered mean.
    for c in centers:
        dists = np.linalg.norm(means - c, axis=-1)
        assert dists.min() < 0.2
    # Responsibilities are normalized and near-hard for separated clusters.
    r = np.asarray(result.responsibilities)
    np.testing.assert_allclose(r.sum(-1), 1.0, rtol=1e-5)
    assert (r.max(-1) > 0.95).mean() > 0.95


def test_recovers_weights_and_precisions():
    rng = np.random.default_rng(2)
    # Unbalanced clusters: 300 vs 100 points, distinct spreads.
    a = np.array([-4.0, 0.0]) + 0.25 * rng.normal(size=(300, 2))
    b = np.array([4.0, 0.0]) + 0.7 * rng.normal(size=(100, 2))
    x = np.concatenate([a, b]).astype(np.float32)
    gmm = GMM(K=2)
    result = gmm.fit(jnp.asarray(x), n_iterations=80, key=jax.random.PRNGKey(3))
    w = np.sort(np.asarray(result.posterior.weights))
    np.testing.assert_allclose(w, [0.25, 0.75], atol=0.03)
    prec = np.asarray(result.posterior.precisions)  # (2, 2)
    means = np.asarray(result.posterior.means)
    tight = int(np.argmin(means[:, 0]))
    assert prec[tight].mean() == pytest.approx(1 / 0.25**2, rel=0.3)
    assert prec[1 - tight].mean() == pytest.approx(1 / 0.7**2, rel=0.3)


def test_replica_batched_fit():
    rng = np.random.default_rng(4)
    xs = np.stack([_three_clusters(rng, n_per=50)[0] for _ in range(4)])
    gmm = GMM(K=3)
    result = gmm.fit(jnp.asarray(xs), n_iterations=30, key=jax.random.PRNGKey(0))
    assert result.posterior.m.shape == (4, 3, 2)
    assert result.free_energy.shape == (4, 30)
    fe = np.asarray(result.free_energy)
    assert np.all(np.diff(fe, axis=-1) <= 1e-2)


def test_fit_jits():
    rng = np.random.default_rng(5)
    x, _ = _three_clusters(rng, n_per=40)
    gmm = GMM(K=3)
    fit = jax.jit(
        lambda data: gmm.fit(data, n_iterations=10, key=jax.random.PRNGKey(0))
        .free_energy[-1]
    )
    out = fit(jnp.asarray(x))
    assert np.isfinite(float(out))
