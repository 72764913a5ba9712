"""Differentiable-inference tests: gradients through the smoother, ML system
identification."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cortex_tpu.models import LGSSM
from cortex_tpu.models.fit import LGSSMParams, fit_lgssm_ml


def test_log_evidence_is_differentiable():
    """jax.grad flows through the filtering scan."""
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=30).cumsum())

    def nll(q):
        return -LGSSM(A=1.0, Q=q, H=1.0, R=1.0).log_evidence(y)

    g = jax.grad(nll)(0.5)
    assert np.isfinite(float(g))
    # The gradient points towards higher likelihood: numerically verify.
    eps = 1e-3
    fd = (nll(0.5 + eps) - nll(0.5 - eps)) / (2 * eps)
    assert float(g) == pytest.approx(float(fd), rel=2e-2)


def test_fit_recovers_parameters():
    true = LGSSM(A=0.8, Q=0.3, H=1.0, R=0.5)
    _, y = true.sample(jax.random.PRNGKey(0), T=200, batch_shape=(64,))

    params, losses = fit_lgssm_ml(y, n_steps=400, learning_rate=0.05)
    assert float(losses[-1]) < float(losses[0])
    assert float(params.A) == pytest.approx(0.8, abs=0.08)
    assert float(params.Q) == pytest.approx(0.3, abs=0.1)
    assert float(params.R) == pytest.approx(0.5, abs=0.1)


def test_fit_jits_end_to_end():
    true = LGSSM(A=0.9, Q=0.2, H=1.0, R=0.2)
    _, y = true.sample(jax.random.PRNGKey(1), T=100, batch_shape=(16,))
    fitted = jax.jit(lambda data: fit_lgssm_ml(data, n_steps=50)[0])(y)
    assert np.isfinite(float(fitted.A))


def test_hgf_log_likelihood_and_fit():
    from cortex_tpu.models import HGF
    from cortex_tpu.models.fit import fit_hgf_ml

    # Data with genuine volatility structure: quiet then loud blocks.
    rng = np.random.default_rng(0)
    scales = np.repeat([0.05, 0.8, 0.05, 0.8], 100)
    u = jnp.asarray(np.cumsum(scales * rng.normal(size=400)).astype(np.float32))

    # log_likelihood is finite and differentiable w.r.t. omega.
    base = HGF(omega=-2.0)
    ll = float(base.log_likelihood(u))
    assert np.isfinite(ll)

    (omega, theta), losses = fit_hgf_ml(u, n_steps=150)
    assert float(losses[-1]) < float(losses[0])
    assert np.isfinite(float(omega)) and float(theta) > 0
    # The fitted model predicts better than a badly mis-specified one.
    fitted = HGF(omega=float(omega), theta=float(theta))
    bad = HGF(omega=6.0, theta=1e-4)
    assert float(fitted.log_likelihood(u)) > float(bad.log_likelihood(u))


def test_em_recovers_parameters_and_is_monotone():
    from cortex_tpu.models.fit import fit_lgssm_em

    true = LGSSM(A=0.8, Q=0.3, H=1.0, R=0.5)
    _, y = true.sample(jax.random.PRNGKey(2), T=200, batch_shape=(64,))

    init = LGSSMParams(jnp.asarray(0.2), jnp.log(jnp.asarray(1.5)), jnp.log(jnp.asarray(1.5)))
    params, lls = fit_lgssm_em(y, n_iters=60, init=init)

    # Monotone log evidence (closed-form M-step), up to float tolerance.
    lls = np.asarray(lls, dtype=np.float64)
    assert np.all(np.diff(lls) > -1e-3 * np.abs(lls[:-1]))
    assert float(params.A) == pytest.approx(0.8, abs=0.08)
    assert float(params.Q) == pytest.approx(0.3, abs=0.1)
    assert float(params.R) == pytest.approx(0.5, abs=0.1)


def test_em_and_adam_agree():
    """Both optimizers maximize the same exact log evidence -> same optimum."""
    from cortex_tpu.models.fit import fit_lgssm_em

    true = LGSSM(A=0.9, Q=0.4, H=1.0, R=0.3)
    _, y = true.sample(jax.random.PRNGKey(3), T=150, batch_shape=(32,))
    em, _ = fit_lgssm_em(y, n_iters=120)
    ml, _ = fit_lgssm_ml(y, n_steps=600, learning_rate=0.03)
    assert float(em.A) == pytest.approx(float(ml.A), abs=0.05)
    assert float(em.Q) == pytest.approx(float(ml.Q), abs=0.08)
    assert float(em.R) == pytest.approx(float(ml.R), abs=0.08)


def test_em_jits_end_to_end():
    from cortex_tpu.models.fit import fit_lgssm_em

    true = LGSSM(A=0.9, Q=0.2, H=1.0, R=0.2)
    _, y = true.sample(jax.random.PRNGKey(4), T=100, batch_shape=(8,))
    fitted = jax.jit(lambda data: fit_lgssm_em(data, n_iters=20)[0])(y)
    assert np.isfinite(float(fitted.A)) and float(fitted.Q) > 0


def test_fit_mv_lgssm_ml_recovers_noise_scales():
    """Vector system identification: with known H and true A as init, the
    evidence gradient must recover the process/observation noise scales."""
    import numpy as np

    from cortex_tpu.models import MvLGSSM, MvLGSSMParams, fit_mv_lgssm_ml

    d = 2
    A_true = np.array([[0.9, 0.1], [0.0, 0.8]], np.float32)
    Q_true = 0.3 * np.eye(d, dtype=np.float32)
    R_true = 0.6 * np.eye(d, dtype=np.float32)
    model = MvLGSSM.from_arrays(A_true, Q_true, np.eye(d), R_true, np.zeros(d), np.eye(d))
    _, y = model.sample(jax.random.PRNGKey(0), T=300, batch_shape=(16,))

    init = MvLGSSMParams(
        A=jnp.asarray(A_true),
        q_chol=jnp.zeros((d, d), jnp.float32),  # Q init = I (wrong scale)
        r_chol=jnp.zeros((d, d), jnp.float32),  # R init = I (wrong scale)
    )
    params, losses = fit_mv_lgssm_ml(y, H=np.eye(d), d=d, n_steps=250, init=init)
    assert float(losses[-1]) < float(losses[0])
    np.testing.assert_allclose(np.diag(np.asarray(params.Q)), 0.3, atol=0.12)
    np.testing.assert_allclose(np.diag(np.asarray(params.R)), 0.6, atol=0.12)


def test_fit_mv_lgssm_ml_improves_over_default_init():
    import numpy as np

    from cortex_tpu.models import MvLGSSM, fit_mv_lgssm_ml
    from cortex_tpu.ops import mv_lgssm_log_evidence

    d = 2
    A_true = np.array([[0.7, 0.2], [-0.1, 0.6]], np.float32)
    model = MvLGSSM.from_arrays(
        A_true, 0.2 * np.eye(d), np.eye(d), 0.4 * np.eye(d), np.zeros(d), np.eye(d)
    )
    _, y = model.sample(jax.random.PRNGKey(1), T=200, batch_shape=(8,))
    params, losses = fit_mv_lgssm_ml(y, H=np.eye(d), d=d, n_steps=200)
    # Fitted A close to truth (identifiable with H = I).
    np.testing.assert_allclose(np.asarray(params.A), A_true, atol=0.15)
    prior = (jnp.zeros(d), 10.0 * jnp.eye(d))
    le_fit = float(
        jnp.mean(mv_lgssm_log_evidence(y, params.A, params.Q, jnp.eye(d), params.R, prior))
    )
    le_true = float(
        jnp.mean(
            mv_lgssm_log_evidence(
                y, jnp.asarray(A_true), 0.2 * jnp.eye(d), jnp.eye(d), 0.4 * jnp.eye(d), prior
            )
        )
    )
    assert le_fit > le_true - 2.0  # within sampling noise of the truth
