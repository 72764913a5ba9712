"""State-space GP: exact parity with the dense-Cholesky GP.

A Matérn GP on sorted 1-D inputs IS a linear SDE (Hartikainen & Särkkä
2010) — posterior moments and log marginal likelihood from the Kalman
path must equal the dense GP up to float tolerance, including on
irregular grids.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cortex_tpu.models.gp import GP
from cortex_tpu.models.gp_ssm import GPSSM, fit_gpssm_ml, matern_state_space


def _data(n=64, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0.0, 10.0, size=n)).astype(np.float32)
    y = (np.sin(t) + 0.3 * rng.normal(size=n)).astype(np.float32)
    return jnp.asarray(t), jnp.asarray(y)


@pytest.mark.parametrize("kernel", ["matern32", "matern52"])
def test_matches_dense_gp(kernel):
    t, y = _data()
    hyp = dict(lengthscale=1.3, variance=1.7, noise=0.2)
    ssm = GPSSM(kernel=kernel, **hyp).posterior(t, y)
    dense = GP(kernel=kernel, **hyp).fit(t[:, None], y, jitter=0.0)
    mean_d, var_d = dense.predict(t[:, None])
    np.testing.assert_allclose(
        np.asarray(ssm.mean), np.asarray(mean_d), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ssm.variance), np.asarray(var_d), rtol=2e-3, atol=1e-4
    )
    assert float(ssm.log_marginal_likelihood) == pytest.approx(
        float(dense.lml), rel=1e-4
    )


def test_matern12_matches_dense_ou_kernel():
    t, y = _data(n=48, seed=1)
    ell, var, noise = 0.8, 2.0, 0.3
    ssm = GPSSM(kernel="matern12", lengthscale=ell, variance=var, noise=noise)
    got = ssm.posterior(t, y)

    # Dense float64 oracle with the OU kernel k = σ² exp(-|Δ|/ℓ).
    td = np.asarray(t, np.float64)
    K = var * np.exp(-np.abs(td[:, None] - td[None, :]) / ell)
    C = K + noise * np.eye(len(td))
    alpha = np.linalg.solve(C, np.asarray(y, np.float64))
    mean = K @ alpha
    var_post = np.diag(K) - np.einsum("ij,jk,ik->i", K, np.linalg.inv(C), K)
    sign, logdet = np.linalg.slogdet(C)
    lml = -0.5 * (y @ alpha + logdet + len(td) * np.log(2 * np.pi))

    np.testing.assert_allclose(np.asarray(got.mean), mean, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got.variance), var_post, rtol=2e-3, atol=1e-4
    )
    assert float(got.log_marginal_likelihood) == pytest.approx(float(lml), rel=1e-4)


def test_discretization_is_stationarity_consistent():
    """A P_inf prior pushed through one step stays P_inf: Q = P∞ − A P∞ Aᵀ."""
    dts = jnp.asarray(np.linspace(0.05, 2.0, 16), jnp.float32)
    for kernel in ["matern12", "matern32", "matern52"]:
        A, Q, H, P_inf = matern_state_space(kernel, 0.7, 1.3, dts)
        prop = A @ P_inf[None] @ jnp.swapaxes(A, -1, -2) + Q
        np.testing.assert_allclose(
            np.asarray(prop),
            np.broadcast_to(np.asarray(P_inf), prop.shape),
            rtol=1e-5,
            atol=1e-6,
        )
        # Q must be PSD (filter stability).
        eigs = np.linalg.eigvalsh(np.asarray(Q, np.float64))
        assert eigs.min() > -1e-5


def test_fit_recovers_hyperparameters():
    rng = np.random.default_rng(3)
    n = 400
    t = np.sort(rng.uniform(0, 40, n)).astype(np.float32)
    # Sample from the exact Matérn-3/2 SSM prior.
    import scipy.linalg

    ell_true, var_true, noise_true = 2.0, 1.5, 0.1
    A, Q, H, P_inf = matern_state_space("matern32", ell_true, var_true, jnp.diff(jnp.asarray(t)))
    x = rng.multivariate_normal(np.zeros(2), np.asarray(P_inf, np.float64))
    f = [x[0]]
    for i in range(n - 1):
        Qi = np.asarray(Q[i], np.float64) + 1e-9 * np.eye(2)  # f32 PSD slack
        x = np.asarray(A[i], np.float64) @ x + rng.multivariate_normal(
            np.zeros(2), Qi
        )
        f.append(x[0])
    y = np.asarray(f) + rng.normal(scale=np.sqrt(noise_true), size=n)

    model, losses = fit_gpssm_ml(
        jnp.asarray(t), jnp.asarray(y, jnp.float32), kernel="matern32", n_iters=300
    )
    assert float(losses[-1]) < float(losses[0])
    assert model.lengthscale == pytest.approx(ell_true, rel=0.5)
    assert model.noise == pytest.approx(noise_true, rel=0.6)


def test_jit_and_grad_through_posterior():
    t, y = _data(n=32, seed=4)

    def nll(log_ell):
        m = GPSSM(kernel="matern52", lengthscale=jnp.exp(log_ell), variance=1.0, noise=0.1)
        return -m.log_marginal_likelihood(t, y)

    g = jax.jit(jax.grad(nll))(jnp.asarray(0.0))
    assert np.isfinite(float(g))
