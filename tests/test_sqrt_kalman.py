"""Square-root Kalman filter/smoother: parity with the associative-scan path
and robustness where plain covariance recursions lose positive-definiteness.

The reference has no low-precision machinery (opaque Julia payloads,
`/root/reference/src/signal.jl:82-115`); this suite pins the f32-native
robustness layer instead: QR-factored covariance propagation must (a) agree
with the fast path on well-conditioned chains, (b) keep covariances PSD on
ill-conditioned ones, and (c) agree with a float64 numpy oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cortex_tpu.models import MvLGSSM
from cortex_tpu.ops import mv_lgssm_smooth, sqrt_lgssm_filter, sqrt_lgssm_smooth


def _random_system(d=3, m=2, seed=0):
    rng = np.random.default_rng(seed)
    A = 0.9 * np.linalg.qr(rng.normal(size=(d, d)))[0]
    Lq = rng.normal(size=(d, d)) * 0.3
    Q = Lq @ Lq.T + 0.2 * np.eye(d)
    H = rng.normal(size=(m, d))
    Lr = rng.normal(size=(m, m)) * 0.4
    R = Lr @ Lr.T + 0.3 * np.eye(m)
    m0 = rng.normal(size=d)
    P0 = np.eye(d)
    return A, Q, H, R, m0, P0


def _np_kalman_smooth(y, A, Q, H, R, m0, P0):
    """float64 RTS oracle (textbook covariance form)."""
    T = y.shape[0]
    d = A.shape[0]
    fm = np.zeros((T, d))
    fP = np.zeros((T, d, d))
    mean, P = m0.copy(), P0.copy()
    for t in range(T):
        if t > 0:
            mean = A @ mean
            P = A @ P @ A.T + Q
        S = H @ P @ H.T + R
        K = P @ H.T @ np.linalg.inv(S)
        mean = mean + K @ (y[t] - H @ mean)
        P = P - K @ S @ K.T
        fm[t], fP[t] = mean, P
    sm = fm.copy()
    sP = fP.copy()
    for t in range(T - 2, -1, -1):
        Pp = A @ fP[t] @ A.T + Q
        G = fP[t] @ A.T @ np.linalg.inv(Pp)
        sm[t] = fm[t] + G @ (sm[t + 1] - A @ fm[t])
        sP[t] = fP[t] + G @ (sP[t + 1] - Pp) @ G.T
    return sm, sP


def test_sqrt_filter_matches_float64_oracle():
    A, Q, H, R, m0, P0 = _random_system(seed=1)
    rng = np.random.default_rng(2)
    T = 40
    y = rng.normal(size=(T, H.shape[0])).cumsum(axis=0).astype(np.float32)
    beliefs = sqrt_lgssm_filter(jnp.asarray(y), A, Q, H, R, (m0, P0))
    # Oracle filtered means via the dense recursion.
    T_, d = beliefs.mean.shape[-2], A.shape[0]
    mean, P = m0.copy(), P0.copy()
    for t in range(T_):
        if t > 0:
            mean = A @ mean
            P = A @ P @ A.T + Q
        S = H @ P @ H.T + R
        K = P @ H.T @ np.linalg.inv(S)
        mean = mean + K @ (y[t] - H @ mean)
        P = P - K @ S @ K.T
        np.testing.assert_allclose(beliefs.mean[t], mean, rtol=2e-4, atol=2e-4)
        cov = beliefs.chol[t] @ beliefs.chol[t].T
        np.testing.assert_allclose(cov, P, rtol=2e-3, atol=2e-4)


def test_sqrt_smoother_matches_assoc_path():
    A, Q, H, R, m0, P0 = _random_system(seed=3)
    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.normal(size=(5, 30, H.shape[0])), dtype=jnp.float32)
    fast = mv_lgssm_smooth(y, A, Q, H, R, (jnp.asarray(m0), jnp.asarray(P0)))
    robust = sqrt_lgssm_smooth(y, A, Q, H, R, (m0, P0))
    np.testing.assert_allclose(robust.mean, fast.mean, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(robust.cov, fast.cov, rtol=5e-3, atol=2e-3)


def test_sqrt_smoother_matches_float64_oracle():
    A, Q, H, R, m0, P0 = _random_system(d=2, m=1, seed=5)
    rng = np.random.default_rng(6)
    T = 60
    y = rng.normal(size=(T, 1)).astype(np.float32)
    sm, sP = _np_kalman_smooth(y.astype(np.float64), A, Q, H, R, m0, P0)
    out = sqrt_lgssm_smooth(jnp.asarray(y), A, Q, H, R, (m0, P0))
    np.testing.assert_allclose(out.mean, sm, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(out.cov, sP, rtol=5e-3, atol=1e-3)


def test_sqrt_smoother_stays_psd_on_ill_conditioned_chain():
    """Near-noiseless observations of a near-deterministic chain: the classic
    regime where `P − K S Kᵀ` cancellation breaks f32; the array algorithm
    must keep every marginal variance non-negative and finite."""
    d = 4
    A = np.eye(d) * 0.9999
    Q = np.eye(d) * 1e-7
    H = np.eye(d)
    R = np.eye(d) * 1e-7
    m0 = np.zeros(d)
    P0 = np.eye(d) * 1e4  # huge prior → tiny posterior: 11 orders of magnitude
    rng = np.random.default_rng(7)
    y = rng.normal(size=(200, d)).astype(np.float32) * 0.01
    out = sqrt_lgssm_smooth(jnp.asarray(y), A, Q, H, R, (m0, P0))
    var = jnp.diagonal(out.cov, axis1=-2, axis2=-1)
    assert bool(jnp.all(jnp.isfinite(out.mean)))
    assert bool(jnp.all(var >= 0.0)), "square-root path produced negative variance"
    # Posterior variance must collapse to ~R-scale, not explode or go negative.
    assert float(var.max()) < 1e-4


def test_mv_lgssm_smooth_method_dispatch():
    A, Q, H, R, m0, P0 = _random_system(d=2, m=2, seed=8)
    model = MvLGSSM.from_arrays(A, Q, H, R, m0, P0)
    rng = np.random.default_rng(9)
    y = jnp.asarray(rng.normal(size=(3, 12, 2)), dtype=jnp.float32)
    fast = model.smooth(y)
    robust = model.smooth(y, method="sqrt")
    np.testing.assert_allclose(robust.mean, fast.mean, rtol=2e-3, atol=2e-3)
    with pytest.raises(ValueError):
        model.smooth(y, method="bogus")


def test_sqrt_filter_jits_and_vmaps():
    A, Q, H, R, m0, P0 = _random_system(d=2, m=1, seed=10)
    rng = np.random.default_rng(11)
    y = jnp.asarray(rng.normal(size=(4, 16, 1)), dtype=jnp.float32)
    f = jax.jit(lambda data: sqrt_lgssm_filter(data, A, Q, H, R, (m0, P0)))
    out = f(y)
    assert out.mean.shape == (4, 16, 2)
    assert out.chol.shape == (4, 16, 2, 2)
    single = sqrt_lgssm_filter(y[0], A, Q, H, R, (m0, P0))
    np.testing.assert_allclose(out.mean[0], single.mean, rtol=1e-5, atol=1e-5)
