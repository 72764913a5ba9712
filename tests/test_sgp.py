"""Sparse variational GP (SGPR): bound tightness, exact-GP recovery, fitting.

Oracle structure mirrors the exact-GP suite: closed-form properties of the
Titsias collapsed bound pin correctness — the ELBO must never exceed the
exact log marginal likelihood and must *equal* it when the inducing set is
the full training set.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cortex_tpu.models import GP, SGPR, fit_sgpr_ml


def _toy_data(n=120, seed=0, noise=0.1):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(-3, 3, size=(n, 1)), axis=0)
    f = np.sin(2.0 * X[:, 0]) + 0.5 * X[:, 0]
    y = f + noise * rng.normal(size=n)
    return jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32), f


def test_sgpr_recovers_exact_gp_when_inducing_equals_training():
    X, y, _ = _toy_data(n=60)
    hyp = dict(kernel="rbf", lengthscale=0.8, variance=1.2, noise=0.05)
    exact = GP(**hyp).fit(X, y)
    sparse = SGPR(**hyp).fit(X, y, Z=X, jitter=1e-5)
    assert abs(float(sparse.elbo) - float(exact.lml)) < 0.05 * abs(float(exact.lml)) + 0.5
    Xs = jnp.linspace(-3, 3, 50)[:, None]
    me, ve = exact.predict(Xs)
    ms, vs = sparse.predict(Xs)
    np.testing.assert_allclose(ms, me, atol=2e-2)
    np.testing.assert_allclose(vs, ve, atol=2e-2)


def test_sgpr_elbo_lower_bounds_exact_lml():
    X, y, _ = _toy_data(n=100, seed=1)
    hyp = dict(kernel="rbf", lengthscale=0.7, variance=1.0, noise=0.1)
    exact = GP(**hyp).fit(X, y)
    for m, seed in [(5, 2), (15, 3), (40, 4)]:
        idx = np.random.default_rng(seed).choice(X.shape[0], m, replace=False)
        sparse = SGPR(**hyp).fit(X, y, Z=X[idx])
        assert float(sparse.elbo) <= float(exact.lml) + 1e-2


def test_sgpr_elbo_tightens_with_more_inducing_points():
    X, y, _ = _toy_data(n=100, seed=5)
    hyp = dict(kernel="rbf", lengthscale=0.7, variance=1.0, noise=0.1)
    rng = np.random.default_rng(6)
    elbos = []
    for m in (4, 16, 64):
        idx = rng.choice(X.shape[0], m, replace=False)
        elbos.append(float(SGPR(**hyp).fit(X, y, Z=X[idx]).elbo))
    assert elbos[0] < elbos[1] < elbos[2]


def test_sgpr_predictions_close_to_exact_with_few_inducing():
    X, y, _ = _toy_data(n=200, seed=7)
    hyp = dict(kernel="rbf", lengthscale=0.8, variance=1.0, noise=0.05)
    exact = GP(**hyp).fit(X, y)
    Z = jnp.linspace(-3, 3, 25)[:, None]
    sparse = SGPR(**hyp).fit(X, y, Z=Z)
    Xs = jnp.linspace(-2.8, 2.8, 60)[:, None]
    me, _ = exact.predict(Xs)
    ms, vs = sparse.predict(Xs)
    assert float(jnp.max(jnp.abs(ms - me))) < 0.1
    assert bool(jnp.all(vs > 0))


def test_sgpr_elbo_is_differentiable_wrt_inducing_and_hypers():
    X, y, _ = _toy_data(n=50, seed=8)
    Z = X[::5]

    def loss(log_ls, Z):
        return -SGPR(kernel="rbf", lengthscale=jnp.exp(log_ls)).elbo(X, y, Z)

    g_ls, g_Z = jax.grad(loss, argnums=(0, 1))(jnp.float32(0.0), Z)
    assert np.isfinite(float(g_ls)) and abs(float(g_ls)) > 0
    assert bool(jnp.all(jnp.isfinite(g_Z))) and float(jnp.max(jnp.abs(g_Z))) > 0


def test_fit_sgpr_ml_improves_elbo_and_predicts():
    X, y, f = _toy_data(n=150, seed=9, noise=0.1)
    model, Z, losses = fit_sgpr_ml(X, y, n_inducing=20, n_steps=150)
    assert float(losses[-1]) < float(losses[0])
    post = model.fit(X, y, Z)
    mean, _ = post.predict(X)
    rmse = float(jnp.sqrt(jnp.mean((mean - jnp.asarray(f, jnp.float32)) ** 2)))
    assert rmse < 0.15
