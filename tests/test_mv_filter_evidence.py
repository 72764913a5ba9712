"""MvLGSSM filter + log evidence: float64 oracles, scalar cross-checks,
missing-data marginalization, and gradient flow for system identification.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cortex_tpu.models import LGSSM, MvLGSSM
from cortex_tpu.ops import mv_lgssm_log_evidence


def _system(d=3, m=2, seed=0):
    rng = np.random.default_rng(seed)
    A = 0.85 * np.linalg.qr(rng.normal(size=(d, d)))[0]
    Q = 0.3 * np.eye(d)
    H = rng.normal(size=(m, d))
    R = 0.5 * np.eye(m)
    return A, Q, H, R, np.zeros(d), np.eye(d)


def _np_filter_ll(y, mask, A, Q, H, R, m0, P0):
    mean, P = m0.copy(), P0.copy()
    ll = 0.0
    means, covs = [], []
    for t in range(y.shape[0]):
        if t > 0:
            mean = A @ mean
            P = A @ P @ A.T + Q
        if mask[t]:
            S = H @ P @ H.T + R
            innov = y[t] - H @ mean
            ll += -0.5 * (
                innov @ np.linalg.solve(S, innov)
                + np.linalg.slogdet(2 * np.pi * S)[1]
            )
            K = P @ H.T @ np.linalg.inv(S)
            mean = mean + K @ innov
            P = P - K @ S @ K.T
        means.append(mean.copy())
        covs.append(P.copy())
    return np.array(means), np.array(covs), ll


def test_filter_and_evidence_match_float64_oracle():
    A, Q, H, R, m0, P0 = _system(seed=1)
    rng = np.random.default_rng(2)
    T = 35
    y = rng.normal(size=(T, 2)).astype(np.float32)
    model = MvLGSSM.from_arrays(A, Q, H, R, m0, P0)
    out = model.filter(jnp.asarray(y))
    le = model.log_evidence(jnp.asarray(y))
    means, covs, ll = _np_filter_ll(
        y.astype(np.float64), np.ones(T, bool), A, Q, H, R, m0, P0
    )
    np.testing.assert_allclose(out.mean, means, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(out.cov, covs, rtol=5e-3, atol=2e-3)
    np.testing.assert_allclose(float(le), ll, rtol=1e-4)


def test_evidence_reduces_to_scalar_lgssm():
    """(d=1, m=1): the vector path must agree with the scalar model exactly."""
    rng = np.random.default_rng(3)
    y = rng.normal(size=(4, 25)).cumsum(axis=-1).astype(np.float32)
    a, q, h, r = 0.9, 0.4, 1.1, 0.6
    scalar = LGSSM(A=a, Q=q, H=h, R=r).log_evidence(jnp.asarray(y), prior=(0.0, 1.0))
    vec = MvLGSSM.from_arrays([[a]], [[q]], [[h]], [[r]], [0.0], [[1.0]]).log_evidence(
        jnp.asarray(y[..., None])
    )
    np.testing.assert_allclose(vec, scalar, rtol=1e-4)


def test_evidence_marginalizes_missing_steps():
    A, Q, H, R, m0, P0 = _system(d=2, m=2, seed=4)
    rng = np.random.default_rng(5)
    T = 30
    y = rng.normal(size=(T, 2)).astype(np.float32)
    mask = np.ones(T, bool)
    mask[[2, 3, 17]] = False
    ymask = y.copy()
    ymask[~mask] = np.nan
    model = MvLGSSM.from_arrays(A, Q, H, R, m0, P0)
    le = float(model.log_evidence(jnp.asarray(ymask)))
    _, _, ll = _np_filter_ll(y.astype(np.float64), mask, A, Q, H, R, m0, P0)
    np.testing.assert_allclose(le, ll, rtol=1e-4)
    # filter stays finite through the gap
    out = model.filter(jnp.asarray(ymask))
    assert bool(jnp.all(jnp.isfinite(out.mean)))


def test_evidence_gradient_drives_system_identification():
    """One gradient step on -log p(y | A·scale) must point toward the truth —
    the vector analogue of fit_lgssm_ml's objective."""
    A, Q, H, R, m0, P0 = _system(d=2, m=2, seed=6)
    model = MvLGSSM.from_arrays(A, Q, H, R, m0, P0)
    key = jax.random.PRNGKey(0)
    _, y = model.sample(key, T=200, batch_shape=(8,))

    def nll(scale):
        return -jnp.mean(
            mv_lgssm_log_evidence(
                y,
                scale * jnp.asarray(A, jnp.float32),
                jnp.asarray(Q, jnp.float32),
                jnp.asarray(H, jnp.float32),
                jnp.asarray(R, jnp.float32),
                (jnp.zeros(2), jnp.eye(2)),
            )
        )

    g_low = float(jax.grad(nll)(jnp.float32(0.6)))
    g_high = float(jax.grad(nll)(jnp.float32(1.4)))
    assert g_low < 0 < g_high  # minimum bracketed at the true scale 1.0
    assert float(nll(1.0)) < float(nll(0.6)) and float(nll(1.0)) < float(nll(1.4))
