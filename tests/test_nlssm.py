"""Nonlinear SSM (EKF/UKF) tests.

Oracles, mirroring the reference's analytic-ground-truth strategy
(`test/inference_engine_tests.jl:379-488` uses Kalman-equivalence for the
linear chain):

- linear limit: EKF and UKF must match the exact Kalman/RTS sweep
  (`cortex_tpu.models.LGSSM`) to float tolerance, including the log-evidence;
- nonlinear observation: filtered means must match a dense-grid (numerically
  exact) Bayes filter;
- structural invariants: smoothing tightens filtering, batching is
  elementwise, the log-evidence is differentiable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cortex_tpu.models import LGSSM, NonlinearSSM
from cortex_tpu.ops import ekf_filter, ekf_smooth, ukf_filter, ukf_smooth


def _linear_nlssm(A=0.9, Q=0.3, H=1.2, R=0.5, m0=0.4, P0=1.3):
    return NonlinearSSM(
        f=lambda x: A * x,
        h=lambda x: H * x,
        Q=jnp.array([[Q]]),
        R=jnp.array([[R]]),
        m0=jnp.array([m0]),
        P0=jnp.array([[P0]]),
    )


def _data(T=40, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(T, 1)).cumsum(axis=0), dtype=jnp.float32)


@pytest.mark.parametrize("method", ["ekf", "ukf"])
def test_linear_limit_matches_kalman(method):
    A, Q, H, R, m0, P0 = 0.9, 0.3, 1.2, 0.5, 0.4, 1.3
    model = _linear_nlssm(A, Q, H, R, m0, P0)
    ref = LGSSM(A=A, Q=Q, H=H, R=R)
    y = _data()

    prior = (jnp.asarray(m0), jnp.asarray(P0))
    exact_f = ref.filter(y[:, 0], prior=prior)
    exact_s = ref.smooth(y[:, 0], prior=prior)

    got_f = model.filter(y, method=method)
    got_s = model.smooth(y, method=method)

    np.testing.assert_allclose(got_f.mean[:, 0], exact_f.mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        got_f.cov[:, 0, 0], exact_f.variance, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(got_s.mean[:, 0], exact_s.mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        got_s.cov[:, 0, 0], exact_s.variance, rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("method", ["ekf", "ukf"])
def test_linear_limit_log_evidence(method):
    A, Q, H, R, m0, P0 = 0.8, 0.4, 1.0, 0.7, 0.0, 1.0
    model = _linear_nlssm(A, Q, H, R, m0, P0)
    ref = LGSSM(A=A, Q=Q, H=H, R=R)
    y = _data(T=30, seed=1)
    exact = ref.log_evidence(y[:, 0], prior=(m0, P0))
    got = model.log_evidence(y, method=method)
    np.testing.assert_allclose(got, exact, rtol=1e-4)


def test_multivariate_linear_ekf_ukf_agree():
    d, m, T = 3, 2, 25
    rng = np.random.default_rng(2)
    A = jnp.asarray(0.5 * rng.normal(size=(d, d)), dtype=jnp.float32)
    H = jnp.asarray(rng.normal(size=(m, d)), dtype=jnp.float32)
    Q = 0.2 * jnp.eye(d)
    R = 0.3 * jnp.eye(m)
    m0 = jnp.zeros(d)
    P0 = jnp.eye(d)
    y = jnp.asarray(rng.normal(size=(T, m)), dtype=jnp.float32)

    f = lambda x: A @ x
    h = lambda x: H @ x
    e = ekf_smooth(f, h, Q, R, y, m0, P0)
    u = ukf_smooth(f, h, Q, R, y, m0, P0)
    np.testing.assert_allclose(e.mean, u.mean, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(e.cov, u.cov, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(e.loglik, u.loglik, rtol=1e-4)


def _grid_filter(y, a, q, h_fn, r, m0, p0, lo=-8.0, hi=8.0, n=1601):
    """Numerically exact 1-D Bayes filter on a dense grid (the oracle)."""
    x = np.linspace(lo, hi, n)
    dx = x[1] - x[0]
    trans = np.exp(-0.5 * (x[None, :] - a * x[:, None]) ** 2 / q)  # [from, to]
    trans /= trans.sum(axis=1, keepdims=True)
    p = np.exp(-0.5 * (x - m0) ** 2 / p0)
    means, varis = [], []
    for t in range(y.shape[0]):
        lik = np.exp(-0.5 * (y[t] - h_fn(x)) ** 2 / r)
        p = p * lik
        p /= p.sum() * dx
        mu = np.sum(x * p) * dx
        means.append(mu)
        varis.append(np.sum((x - mu) ** 2 * p) * dx)
        p = p @ trans  # propagate to t+1
    return np.array(means), np.array(varis)


def test_nonlinear_observation_vs_grid_oracle():
    a, q, r, m0, p0 = 0.9, 0.2, 0.4, 0.0, 0.5
    h_np = lambda x: x + 0.5 * np.sin(x)
    rng = np.random.default_rng(3)
    T = 30
    xs = [rng.normal(m0, np.sqrt(p0))]
    for _ in range(T - 1):
        xs.append(a * xs[-1] + rng.normal(0, np.sqrt(q)))
    y_np = h_np(np.array(xs)) + rng.normal(0, np.sqrt(r), size=T)

    grid_mean, grid_var = _grid_filter(y_np, a, q, h_np, r, m0, p0)

    model = NonlinearSSM(
        f=lambda x: a * x,
        h=lambda x: x + 0.5 * jnp.sin(x),
        Q=jnp.array([[q]]),
        R=jnp.array([[r]]),
        m0=jnp.array([m0]),
        P0=jnp.array([[p0]]),
    )
    y = jnp.asarray(y_np, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)[:, None]
    # Both projections carry an irreducible Gaussian-approximation bias on
    # this non-Gaussian posterior (measured ~0.06 on the means); the UKF is
    # tighter on variances.
    for method in ("ekf", "ukf"):
        beliefs = model.filter(y, method=method)
        np.testing.assert_allclose(beliefs.mean[:, 0], grid_mean, atol=0.08)
        np.testing.assert_allclose(beliefs.cov[:, 0, 0], grid_var, atol=0.04)


def test_smoothing_tightens_filtering():
    model = _linear_nlssm()
    y = _data(T=50, seed=4)
    f = model.filter(y, method="ukf")
    s = model.smooth(y, method="ukf")
    assert np.all(s.cov[:-1, 0, 0] <= f.cov[:-1, 0, 0] + 1e-6)
    np.testing.assert_allclose(s.mean[-1], f.mean[-1], rtol=1e-5)


def test_batched_matches_per_chain():
    model = _linear_nlssm()
    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.normal(size=(3, 4, 20, 1)), dtype=jnp.float32)
    batched = model.smooth(y, method="ukf")
    assert batched.mean.shape == (3, 4, 20, 1)
    assert batched.cov.shape == (3, 4, 20, 1, 1)
    assert batched.loglik.shape == (3, 4)
    single = model.smooth(y[1, 2], method="ukf")
    np.testing.assert_allclose(batched.mean[1, 2], single.mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(batched.loglik[1, 2], single.loglik, rtol=1e-5)


def test_log_evidence_is_differentiable():
    y = _data(T=25, seed=6)

    def nll(log_a):
        a = jnp.exp(log_a)
        beliefs = ukf_filter(
            lambda x: a * x,
            lambda x: x + 0.1 * jnp.tanh(x),
            jnp.array([[0.3]]),
            jnp.array([[0.5]]),
            y,
            jnp.array([0.0]),
            jnp.array([[1.0]]),
        )
        return -beliefs.loglik

    g = jax.grad(nll)(jnp.asarray(-0.2))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_sample_shapes_and_jit():
    model = _linear_nlssm()
    x, y = model.sample(jax.random.PRNGKey(0), T=15, batch_shape=(6,))
    assert x.shape == (6, 15, 1) and y.shape == (6, 15, 1)
    sm = jax.jit(lambda data: model.smooth(data, method="ekf").mean)(y)
    assert sm.shape == (6, 15, 1)
    assert np.all(np.isfinite(np.asarray(sm)))
