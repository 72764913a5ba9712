"""Robust Student-t smoothing: Gaussian limit, outlier rejection, weight
semantics, missing-data composition.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cortex_tpu.models import LGSSM
from cortex_tpu.ops import lgssm_smooth_scan, robust_lgssm_smooth


def _chain(T=80, seed=0, q=0.3, r=0.4):
    rng = np.random.default_rng(seed)
    x = np.zeros(T)
    for t in range(1, T):
        x[t] = 0.95 * x[t - 1] + np.sqrt(q) * rng.normal()
    y = x + np.sqrt(r) * rng.normal(size=T)
    return x, y.astype(np.float32), rng


def test_large_nu_recovers_gaussian_smoother():
    _, y, _ = _chain(seed=1)
    robust = robust_lgssm_smooth(
        jnp.asarray(y), A=0.95, Q=0.3, R=0.4, nu=1e7, n_iters=8, prior=(0.0, 5.0)
    )
    gauss = lgssm_smooth_scan(jnp.asarray(y), A=0.95, Q=0.3, R=0.4, prior=(0.0, 5.0))
    np.testing.assert_allclose(robust.mean, gauss.mean, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(robust.variance, gauss.variance, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(robust.weights, 1.0, atol=1e-3)


def test_outliers_rejected_and_scored():
    x, y, rng = _chain(T=120, seed=2)
    corrupt = [20, 55, 90]
    y_bad = y.copy()
    y_bad[corrupt] += np.array([15.0, -20.0, 25.0], np.float32)

    gauss = lgssm_smooth_scan(jnp.asarray(y_bad), A=0.95, Q=0.3, R=0.4, prior=(0.0, 5.0))
    robust = robust_lgssm_smooth(
        jnp.asarray(y_bad), A=0.95, Q=0.3, R=0.4, nu=4.0, prior=(0.0, 5.0)
    )
    rmse_g = float(np.sqrt(np.mean((np.asarray(gauss.mean) - x) ** 2)))
    rmse_r = float(np.sqrt(np.mean((np.asarray(robust.mean) - x) ** 2)))
    assert rmse_r < 0.5 * rmse_g  # outliers must not drag the posterior
    w = np.asarray(robust.weights)
    assert w[corrupt].max() < 0.05  # corrupted steps flagged as outliers
    clean = np.setdiff1d(np.arange(120), corrupt)
    assert np.median(w[clean]) > 0.7  # inliers keep their weight


def test_batched_and_jittable():
    _, y, _ = _chain(T=40, seed=3)
    Y = jnp.asarray(np.stack([y, y + 1.0, y * 2.0]))
    f = jax.jit(
        lambda d: robust_lgssm_smooth(d, A=0.95, Q=0.3, R=0.4, nu=4.0, prior=(0.0, 5.0))
    )
    out = f(Y)
    assert out.mean.shape == (3, 40) and out.weights.shape == (3, 40)
    single = robust_lgssm_smooth(Y[0], A=0.95, Q=0.3, R=0.4, nu=4.0, prior=(0.0, 5.0))
    np.testing.assert_allclose(out.mean[0], single.mean, rtol=1e-5, atol=1e-6)


def test_composes_with_missing_data():
    x, y, _ = _chain(T=60, seed=4)
    y_bad = y.copy()
    y_bad[10] += 18.0  # outlier
    y_bad[30:33] = np.nan  # dropout
    out = robust_lgssm_smooth(
        jnp.asarray(y_bad), A=0.95, Q=0.3, R=0.4, nu=4.0, prior=(0.0, 5.0)
    )
    assert bool(jnp.all(jnp.isfinite(out.mean)))
    w = np.asarray(out.weights)
    assert w[10] < 0.05  # outlier down-weighted
    np.testing.assert_allclose(w[30:33], 1.0)  # missing steps carry no site
    v = np.asarray(out.variance)
    assert v[31] > v[28]  # the gap is more uncertain than observed steps
