"""Bayesian AR(p): conjugate closed-form oracles and companion-form lowering.

Oracle strategy follows the reference's conjugate gold set
(`/root/reference/test/inference_engine_tests.jl:366-376` style): the NIG
posterior has an exact closed form, so every assertion is against hand-rolled
float64 numpy algebra; the latent-AR path is pinned against the scalar LGSSM
smoother at p=1 where the two must coincide exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cortex_tpu.models import (
    LGSSM,
    BayesianAR,
    companion_matrix,
    latent_ar_smooth,
)


def _simulate_ar(coeffs, T, noise=0.3, seed=0, batch=()):
    rng = np.random.default_rng(seed)
    p = len(coeffs)
    y = np.zeros(batch + (T,))
    for t in range(T):
        acc = sum(
            coeffs[k] * y[..., t - 1 - k] for k in range(min(p, t))
        )
        y[..., t] = acc + noise * rng.normal(size=batch)
    return y.astype(np.float32)


def test_companion_matrix_structure():
    A = companion_matrix(jnp.asarray([0.5, -0.2, 0.1]))
    np.testing.assert_allclose(A[0], [0.5, -0.2, 0.1])
    np.testing.assert_allclose(A[1:], np.eye(3)[:2])


def test_posterior_matches_numpy_nig_oracle():
    y = _simulate_ar([0.7, -0.2], T=300, seed=1)
    model = BayesianAR(p=2, prior_scale=50.0, a0=2.5, b0=1.5)
    post = model.fit(jnp.asarray(y))

    # float64 oracle
    p = 2
    X = np.stack([y[p - 1 - k : len(y) - 1 - k] for k in range(p)], axis=-1).astype(np.float64)
    t = y[p:].astype(np.float64)
    V0i = np.eye(p) / 50.0
    prec = V0i + X.T @ X
    Vn = np.linalg.inv(prec)
    mn = Vn @ (X.T @ t)
    an = 2.5 + 0.5 * len(t)
    bn = 1.5 + 0.5 * (t @ t - mn @ prec @ mn)
    np.testing.assert_allclose(post.mean, mn, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(post.cov_scale, Vn, rtol=1e-2, atol=1e-6)
    np.testing.assert_allclose(post.a, an, rtol=1e-6)
    np.testing.assert_allclose(post.b, bn, rtol=1e-2)


def test_log_evidence_matches_sequential_predictive_decomposition():
    """p(y) = Π_t p(y_t | y_<t): the batch evidence must equal the product of
    one-step NIG posterior-predictive densities (Student-t), a strong
    whole-pipeline identity."""
    from scipy.stats import t as student_t

    y = _simulate_ar([0.6], T=40, seed=2)
    model = BayesianAR(p=1, prior_scale=10.0, a0=3.0, b0=2.0)
    post = model.fit(jnp.asarray(y))

    # Sequential float64 oracle over the regressed targets y[1:].
    x = y[:-1].astype(np.float64)
    t_ = y[1:].astype(np.float64)
    V = np.array([[10.0]])
    m = np.zeros(1)
    a, b = 3.0, 2.0
    log_ev = 0.0
    for i in range(len(t_)):
        xi = x[i : i + 1]
        # predictive: Student-t(2a, xi·m, b/a (1 + xi V xiᵀ))
        scale2 = (b / a) * (1.0 + xi @ V @ xi)
        log_ev += student_t.logpdf(t_[i], df=2 * a, loc=xi @ m, scale=np.sqrt(scale2))
        # NIG update
        Vi = np.linalg.inv(np.linalg.inv(V) + np.outer(xi, xi))
        mi = Vi @ (np.linalg.inv(V) @ m + xi * t_[i])
        b = b + 0.5 * (t_[i] ** 2 + m @ np.linalg.inv(V) @ m - mi @ np.linalg.inv(Vi) @ mi)
        a = a + 0.5
        V, m = Vi, mi
    np.testing.assert_allclose(float(post.log_evidence), float(log_ev), rtol=1e-4)


def test_coefficient_recovery_and_batching():
    coeffs = [0.65, -0.3]
    y = _simulate_ar(coeffs, T=4000, seed=3, batch=(5,))
    post = BayesianAR(p=2).fit(jnp.asarray(y))
    assert post.mean.shape == (5, 2)
    np.testing.assert_allclose(post.mean, np.tile(coeffs, (5, 1)), atol=0.06)
    # noise variance recovered
    np.testing.assert_allclose(post.noise_mean, 0.09, rtol=0.2)


def test_predict_horizon_decays_toward_zero_for_stable_ar():
    y = _simulate_ar([0.9], T=500, seed=4)
    model = BayesianAR(p=1)
    preds = model.predict(jnp.asarray(y), horizon=50)
    assert preds.shape == (50,)
    # |w|<1 ⇒ forecast decays geometrically from the last observation
    np.testing.assert_allclose(preds[0], 0.9 * y[-1], atol=0.05)
    assert abs(float(preds[-1])) < abs(float(preds[0]))


def test_latent_ar1_matches_scalar_lgssm():
    rng = np.random.default_rng(5)
    yobs = rng.normal(size=(3, 40)).cumsum(axis=-1).astype(np.float32)
    c, q, r = 0.8, 0.4, 0.7
    marg = latent_ar_smooth(jnp.asarray(yobs), jnp.asarray([c]), q, r, prior_var=10.0)
    ref = LGSSM(A=c, Q=q, H=1.0, R=r).smooth(jnp.asarray(yobs), prior=(0.0, 10.0))
    np.testing.assert_allclose(marg.mean[..., 0], ref.mean, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(marg.cov[..., 0, 0], ref.variance, rtol=1e-3, atol=1e-4)


def test_latent_ar2_tracks_signal():
    coeffs = [1.2, -0.5]  # stable AR(2) with oscillation
    rng = np.random.default_rng(6)
    T = 300
    x = np.zeros(T)
    for t in range(T):
        acc = sum(coeffs[k] * x[t - 1 - k] for k in range(min(2, t)))
        x[t] = acc + 0.3 * rng.normal()
    yobs = (x + 0.8 * rng.normal(size=T)).astype(np.float32)
    marg = latent_ar_smooth(jnp.asarray(yobs), jnp.asarray(coeffs), 0.09, 0.64)
    sm = np.asarray(marg.mean[..., 0])
    assert np.mean((sm - x) ** 2) < np.mean((yobs - x) ** 2) * 0.6
    assert bool(jnp.all(jnp.diagonal(marg.cov, axis1=-2, axis2=-1) > 0))
