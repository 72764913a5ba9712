"""LGSSM smoother tests: scan vs associative vs NumPy RTS oracle vs the
dynamic reactive engine (four-way parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cortex_tpu.models import LGSSM
from cortex_tpu.ops import lgssm_smooth_assoc, lgssm_smooth_scan


def numpy_rts(y, A=1.0, Q=1.0, H=1.0, R=1.0, prior=None):
    """Dense reference RTS smoother (float64)."""
    y = np.asarray(y, dtype=np.float64)
    T = y.shape[-1]
    fm = np.zeros(T)
    fv = np.zeros(T)
    if prior is None:
        fm[0], fv[0] = y[0] / H, R / (H * H)
    else:
        m0, P0 = prior
        S = H * P0 * H + R
        K = P0 * H / S
        fm[0] = m0 + K * (y[0] - H * m0)
        fv[0] = P0 - K * H * P0
    for t in range(1, T):
        pm, pv = A * fm[t - 1], A * A * fv[t - 1] + Q
        S = H * pv * H + R
        K = pv * H / S
        fm[t] = pm + K * (y[t] - H * pm)
        fv[t] = pv - K * H * pv
    sm = np.zeros(T)
    sv = np.zeros(T)
    sm[-1], sv[-1] = fm[-1], fv[-1]
    for t in range(T - 2, -1, -1):
        pv = A * A * fv[t] + Q
        G = fv[t] * A / pv
        sm[t] = fm[t] + G * (sm[t + 1] - A * fm[t])
        sv[t] = fv[t] + G * G * (sv[t + 1] - pv)
    return sm, sv


@pytest.mark.parametrize("method", ["scan", "assoc", "matmul"])
@pytest.mark.parametrize(
    "params", [dict(), dict(A=0.9, Q=0.5, H=2.0, R=0.3)]
)
def test_smoother_matches_numpy_rts(method, params):
    rng = np.random.default_rng(0)
    T = 60
    y = np.cumsum(rng.normal(size=T)) + rng.normal(size=T)

    model = LGSSM(**params)
    result = model.smooth(jnp.asarray(y), method=method)
    sm, sv = numpy_rts(y, **params)
    np.testing.assert_allclose(np.asarray(result.mean), sm, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(result.variance), sv, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("method", ["scan", "assoc", "matmul"])
def test_smoother_with_prior_matches_numpy_rts(method):
    rng = np.random.default_rng(3)
    T = 40
    y = np.cumsum(rng.normal(size=T))
    model = LGSSM(A=1.0, Q=0.7, H=1.0, R=2.0)
    result = model.smooth(jnp.asarray(y), prior=(1.5, 4.0), method=method)
    sm, sv = numpy_rts(y, A=1.0, Q=0.7, H=1.0, R=2.0, prior=(1.5, 4.0))
    np.testing.assert_allclose(np.asarray(result.mean), sm, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(result.variance), sv, rtol=2e-4, atol=2e-4)


def test_matmul_agrees_batched_with_precomputed_operator():
    from cortex_tpu.ops import lgssm_smooth_matmul, lgssm_smoother_operator

    rng = np.random.default_rng(9)
    y = jnp.asarray(rng.normal(size=(16, 40)).cumsum(axis=-1), jnp.float32)
    A, Q, H, R = 0.95, 0.8, 1.2, 0.5
    ref = lgssm_smooth_scan(y, A, Q, H, R)
    op = lgssm_smoother_operator(40, A, Q, H, R)
    out = jax.jit(lambda d: lgssm_smooth_matmul(d, operator=op))(y)
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(ref.mean), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out.variance), np.asarray(ref.variance), rtol=2e-5, atol=2e-6
    )


def test_scan_and_assoc_agree_batched():
    rng = np.random.default_rng(1)
    y = rng.normal(size=(32, 50)).cumsum(axis=-1)
    a = lgssm_smooth_scan(jnp.asarray(y), A=0.95, Q=0.4, H=1.0, R=1.2)
    b = lgssm_smooth_assoc(jnp.asarray(y), A=0.95, Q=0.4, H=1.0, R=1.2)
    np.testing.assert_allclose(np.asarray(a.mean), np.asarray(b.mean), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(a.variance), np.asarray(b.variance), rtol=1e-3, atol=1e-3
    )


def test_smoother_matches_dynamic_engine():
    """Four-way parity: the compiled scan path reproduces the dynamic
    reactive engine's BP marginals (the reference-faithful path)."""
    from tests.test_inference_engine import make_ssm_model

    rng = np.random.default_rng(42)
    n = 30
    dataset = rng.normal(size=n).cumsum()

    engine, x, y, likelihood, transition = make_ssm_model(n)
    for i in range(n):
        engine.get_message_to_factor(y[i], likelihood[i]).set_value(float(dataset[i]))
    engine.update_marginals(x)
    dyn = [engine.get_variable_marginal(xi).get_value() for xi in x]

    compiled = lgssm_smooth_scan(jnp.asarray(dataset), A=1.0, Q=1.0, H=1.0, R=1.0)
    np.testing.assert_allclose(
        np.asarray(compiled.mean), [d.mean for d in dyn], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(compiled.variance), [d.variance for d in dyn], rtol=1e-4, atol=1e-5
    )


def test_filter_is_forward_only():
    rng = np.random.default_rng(2)
    y = rng.normal(size=30).cumsum()
    model = LGSSM()
    filt = model.filter(jnp.asarray(y))
    # Last filtered state equals last smoothed state.
    smoothed = model.smooth(jnp.asarray(y))
    assert float(filt.mean[-1]) == pytest.approx(float(smoothed.mean[-1]), rel=1e-5)
    assert float(filt.variance[-1]) == pytest.approx(
        float(smoothed.variance[-1]), rel=1e-5
    )
    # Earlier filtered states differ from smoothed (no future info).
    assert not np.allclose(np.asarray(filt.mean[:-1]), np.asarray(smoothed.mean[:-1]))


def test_log_evidence_matches_numpy():
    rng = np.random.default_rng(5)
    y = rng.normal(size=20)
    model = LGSSM(A=0.8, Q=0.5, H=1.0, R=1.0)
    le = float(model.log_evidence(jnp.asarray(y), prior=(0.0, 1.0)))

    # Dense prediction-error decomposition in numpy.
    m, v = 0.0, 1.0
    total = 0.0
    for t in range(20):
        s = v + 1.0
        total += -0.5 * (np.log(2 * np.pi * s) + (y[t] - m) ** 2 / s)
        k = v / s
        mf = m + k * (y[t] - m)
        vf = v - k * v
        m, v = 0.8 * mf, 0.64 * vf + 0.5
    assert le == pytest.approx(total, rel=1e-4)


def test_sample_shapes_and_statistics():
    model = LGSSM(A=1.0, Q=0.1, H=1.0, R=0.1)
    x, y = model.sample(jax.random.PRNGKey(0), T=50, batch_shape=(64,))
    assert x.shape == (64, 50)
    assert y.shape == (64, 50)
    resid = np.asarray(y - x)
    assert abs(resid.mean()) < 0.01
    assert resid.var() == pytest.approx(0.1, abs=0.02)


def test_smoother_jits_and_vmaps():
    model = LGSSM()
    f = jax.jit(lambda y: model.smooth(y).mean)
    y = jnp.ones((4, 16))
    out = f(y)
    assert out.shape == (4, 16)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)
