"""PPCA / Factor Analysis: Tipping-Bishop closed-form oracle + EM convergence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cortex_tpu.models.ppca import (
    FactorAnalysis,
    PPCA,
    ppca_closed_form,
)


def _synth(n=500, d=12, q=3, sigma=0.5, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(d, q)) * np.array([3.0, 2.0, 1.0])
    Z = rng.normal(size=(n, q))
    Y = Z @ W.T + rng.normal(scale=sigma, size=(n, d)) + 5.0
    return Y.astype(np.float32), W, sigma


def _numpy_ml_loglik(Y, q):
    """Independent float64 oracle: exact ML marginal log-likelihood."""
    Y = np.asarray(Y, np.float64)
    n, d = Y.shape
    Yc = Y - Y.mean(axis=0)
    S = Yc.T @ Yc / n
    evals = np.linalg.eigvalsh(S)
    lam_q = evals[-q:]
    sigma2 = evals[: d - q].mean()
    # ML log-likelihood: -n/2 [ d ln 2π + Σ_top ln λ_j + (d-q) ln σ² + d ]
    return -0.5 * n * (
        d * np.log(2 * np.pi)
        + np.log(lam_q).sum()
        + (d - q) * np.log(sigma2)
        + d
    ), sigma2


def test_closed_form_matches_numpy_oracle():
    Y, _, _ = _synth()
    res = ppca_closed_form(jnp.asarray(Y), 3)
    want_ll, want_s2 = _numpy_ml_loglik(Y, 3)
    assert float(res.sigma2) == pytest.approx(want_s2, rel=1e-4)
    assert float(res.log_likelihood) == pytest.approx(want_ll, rel=1e-5)


def test_em_converges_to_ml_solution():
    Y, _, _ = _synth()
    # EM crawls near the optimum — give it room (cheap: q-space iterations).
    res = jax.jit(lambda y: PPCA(3).fit_em(y, n_iters=1500))(jnp.asarray(Y))
    want_ll, want_s2 = _numpy_ml_loglik(Y, 3)
    lls = np.asarray(res.log_likelihood, np.float64)
    # Monotone (up to float32 noise) and converged to the exact ML optimum.
    assert np.all(np.diff(lls) > -0.5)
    assert lls[-1] == pytest.approx(want_ll, rel=1e-4)
    assert float(res.sigma2) == pytest.approx(want_s2, rel=5e-3)


def test_em_subspace_matches_closed_form():
    Y, _, _ = _synth(seed=1)
    em = PPCA(3).fit_em(jnp.asarray(Y), n_iters=400)
    cf = ppca_closed_form(jnp.asarray(Y), 3)
    # W is identified up to rotation: compare the projector W(WᵀW)⁻¹Wᵀ.
    def projector(W):
        W = np.asarray(W, np.float64)
        return W @ np.linalg.solve(W.T @ W, W.T)

    np.testing.assert_allclose(
        projector(em.W), projector(cf.W), atol=5e-3
    )


def test_transform_reconstructs():
    Y, _, sigma = _synth(seed=2)
    model = PPCA(3)
    res = model.fit_em(jnp.asarray(Y), n_iters=200)
    Z, cov = model.transform(jnp.asarray(Y), res)
    assert Z.shape == (Y.shape[0], 3)
    assert cov.shape == (3, 3)
    recon = np.asarray(Z @ res.W.T + res.mu)
    # Reconstruction error on the order of the noise floor.
    rmse = np.sqrt(np.mean((recon - Y) ** 2))
    assert rmse < 2.5 * sigma


def test_factor_analysis_recovers_heteroscedastic_noise():
    rng = np.random.default_rng(3)
    n, d, q = 2000, 10, 2
    W = rng.normal(size=(d, q)) * 2.0
    psi_true = np.linspace(0.1, 2.0, d)
    Y = (
        rng.normal(size=(n, q)) @ W.T
        + rng.normal(size=(n, d)) * np.sqrt(psi_true)
    ).astype(np.float32)

    res = jax.jit(lambda y: FactorAnalysis(q).fit_em(y, n_iters=300))(
        jnp.asarray(Y)
    )
    lls = np.asarray(res.log_likelihood, np.float64)
    assert np.all(np.diff(lls) > -0.5)  # monotone up to float32 noise
    got_psi = np.asarray(res.psi)
    # Heteroscedastic noise profile recovered (correlation, not exact match —
    # loadings absorb some variance at finite n).
    assert np.corrcoef(got_psi, psi_true)[0, 1] > 0.9
    # FA log-likelihood beats the isotropic PPCA fit on heteroscedastic data.
    ppca_res = PPCA(q).fit_em(jnp.asarray(Y), n_iters=300)
    assert lls[-1] > float(ppca_res.log_likelihood[-1])
