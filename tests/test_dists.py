"""Distribution-algebra tests: products, moments, normalizers, batching.

Parity oracle: the closed-form conjugate algebra of the reference's
``TestDistributions`` (``test/runtests.jl:17-101``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cortex_tpu.dists import (
    Bernoulli,
    Beta,
    Categorical,
    Dirichlet,
    Gamma,
    Gaussian,
    MvGaussian,
    from_mean_precision,
    from_mean_variance,
    mv_from_mean_cov,
    mv_from_mean_precision,
)


def test_gaussian_product_matches_reference_algebra():
    # Mirrors product(NormalMeanVariance, NormalMeanVariance),
    # test/runtests.jl:40-46.
    left = from_mean_variance(1.0, 2.0)
    right = from_mean_variance(3.0, 4.0)
    prod = left * right
    xi = 1.0 / 2.0 + 3.0 / 4.0
    w = 1.0 / 2.0 + 1.0 / 4.0
    assert float(prod.mean) == pytest.approx(xi / w)
    assert float(prod.variance) == pytest.approx(1.0 / w)


def test_gaussian_mean_precision_roundtrip():
    g = from_mean_precision(2.5, 4.0)
    assert float(g.mean) == pytest.approx(2.5)
    assert float(g.precision) == pytest.approx(4.0)
    assert float(g.variance) == pytest.approx(0.25)


def test_gaussian_quotient_inverts_product():
    a = from_mean_variance(1.0, 2.0)
    b = from_mean_variance(-0.5, 0.7)
    q = (a * b) / b
    assert float(q.mean) == pytest.approx(float(a.mean))
    assert float(q.variance) == pytest.approx(float(a.variance))


def test_gaussian_batched_product():
    means = jnp.arange(8.0)
    gs = from_mean_variance(means, jnp.ones(8))
    prior = from_mean_variance(jnp.zeros(8), jnp.ones(8))
    post = gs * prior
    np.testing.assert_allclose(np.asarray(post.mean), np.asarray(means) / 2.0)
    np.testing.assert_allclose(np.asarray(post.variance), 0.5)


def test_gaussian_logpdf_entropy_kl():
    g = from_mean_variance(0.0, 1.0)
    assert float(g.logpdf(0.0)) == pytest.approx(-0.9189385, rel=1e-5)
    assert float(g.entropy()) == pytest.approx(1.4189385, rel=1e-5)
    assert float(g.kl(g)) == pytest.approx(0.0, abs=1e-7)
    h = from_mean_variance(1.0, 2.0)
    assert float(g.kl(h)) > 0.0


def test_gaussian_jit_and_vmap():
    @jax.jit
    def posterior(mu_obs):
        prior = from_mean_precision(0.0, 1.0)
        like = from_mean_precision(mu_obs, 2.0)
        return (prior * like).mean

    assert float(posterior(3.0)) == pytest.approx(2.0)
    batched = jax.vmap(posterior)(jnp.array([3.0, -3.0]))
    np.testing.assert_allclose(np.asarray(batched), [2.0, -2.0])


def test_mv_gaussian_product_and_moments():
    m1, P1 = jnp.array([1.0, 0.0]), jnp.eye(2) * 2.0
    m2, P2 = jnp.array([0.0, 1.0]), jnp.eye(2) * 3.0
    a = mv_from_mean_precision(m1, P1)
    b = mv_from_mean_precision(m2, P2)
    prod = a * b
    expected_W = P1 + P2
    expected_mean = np.linalg.solve(expected_W, P1 @ m1 + P2 @ m2)
    np.testing.assert_allclose(np.asarray(prod.mean), expected_mean, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(prod.precision), np.asarray(expected_W))
    np.testing.assert_allclose(
        np.asarray(prod.cov), np.linalg.inv(expected_W), rtol=1e-6
    )


def test_mv_gaussian_from_cov_logpdf_matches_scipy_formula():
    mean = jnp.array([0.5, -0.5])
    cov = jnp.array([[2.0, 0.3], [0.3, 1.0]])
    d = mv_from_mean_cov(mean, cov)
    x = jnp.array([0.0, 0.0])
    diff = np.asarray(x - mean)
    npcov = np.asarray(cov)
    expected = -0.5 * (
        diff @ np.linalg.inv(npcov) @ diff
        + 2 * np.log(2 * np.pi)
        + np.log(np.linalg.det(npcov))
    )
    assert float(d.logpdf(x)) == pytest.approx(float(expected), rel=1e-5)


def test_beta_product_matches_reference_algebra():
    # Beta product: a1+a2-1, b1+b2-1 (test/inference_engine_tests.jl:274-293).
    p = Beta(jnp.asarray(2.0), jnp.asarray(3.0)) * Beta(
        jnp.asarray(4.0), jnp.asarray(5.0)
    )
    assert float(p.a) == pytest.approx(5.0)
    assert float(p.b) == pytest.approx(7.0)
    assert float(p.mean) == pytest.approx(5.0 / 12.0)


def test_gamma_product_matches_reference_algebra():
    # Reference: Gamma(shape,scale) product = (s1+s2-1, scale1*scale2/(scale1+scale2))
    # (test/runtests.jl:86-88); in rate form that's rate addition.
    left = Gamma.from_shape_scale(2.0, 3.0)
    right = Gamma.from_shape_scale(4.0, 6.0)
    prod = left * right
    assert float(prod.shape) == pytest.approx(5.0)
    assert float(prod.scale) == pytest.approx((3.0 * 6.0) / (3.0 + 6.0))
    assert float(prod.mean) == pytest.approx(5.0 * 2.0)
    assert float(prod.variance) == pytest.approx(5.0 * 4.0)


def test_gamma_mean_log():
    g = Gamma(jnp.asarray(3.0), jnp.asarray(2.0))
    from scipy.special import digamma as sp_digamma

    assert float(g.mean_log()) == pytest.approx(sp_digamma(3.0) - np.log(2.0), rel=1e-3)


def test_bernoulli_product_and_moments():
    a = Bernoulli.from_prob(0.7)
    b = Bernoulli.from_prob(0.6)
    prod = a * b
    expected = (0.7 * 0.6) / (0.7 * 0.6 + 0.3 * 0.4)
    assert float(prod.prob) == pytest.approx(expected, rel=1e-5)
    assert float(a.mean) == pytest.approx(0.7, rel=1e-6)
    assert float(a.variance) == pytest.approx(0.21, rel=1e-6)


def test_categorical_product_and_normalization():
    a = Categorical.from_probs(jnp.array([0.5, 0.3, 0.2]))
    b = Categorical.from_probs(jnp.array([0.2, 0.3, 0.5]))
    prod = a * b
    expected = np.array([0.5 * 0.2, 0.3 * 0.3, 0.2 * 0.5])
    expected /= expected.sum()
    np.testing.assert_allclose(np.asarray(prod.probs), expected, rtol=1e-4)
    assert float(prod.entropy()) > 0.0


def test_dirichlet_product_and_mean_log():
    a = Dirichlet(jnp.array([2.0, 3.0, 4.0]))
    b = Dirichlet(jnp.array([1.0, 1.0, 1.0]))
    prod = a * b
    np.testing.assert_allclose(np.asarray(prod.alpha), [2.0, 3.0, 4.0])
    np.testing.assert_allclose(np.asarray(a.mean), [2 / 9, 3 / 9, 4 / 9], rtol=1e-6)
    assert prod.mean_log().shape == (3,)


def test_sampling_moments():
    key = jax.random.PRNGKey(0)
    g = from_mean_variance(2.0, 4.0)
    xs = g.sample(key, (20000,))
    assert float(jnp.mean(xs)) == pytest.approx(2.0, abs=0.1)
    assert float(jnp.var(xs)) == pytest.approx(4.0, abs=0.2)

    gam = Gamma(jnp.asarray(3.0), jnp.asarray(2.0))
    xs = gam.sample(key, (20000,))
    assert float(jnp.mean(xs)) == pytest.approx(1.5, abs=0.05)


def test_pytree_registration():
    g = from_mean_variance(jnp.ones(4), jnp.ones(4))
    leaves = jax.tree_util.tree_leaves(g)
    assert len(leaves) == 2
    mapped = jax.tree_util.tree_map(lambda x: x * 2, g)
    assert isinstance(mapped, Gaussian)

    mv = mv_from_mean_precision(jnp.zeros(3), jnp.eye(3))
    assert len(jax.tree_util.tree_leaves(mv)) == 2


# ---------------------------------------------------------------------------
# SPD elimination helpers (dists/gaussian.py) — the no-custom-call linear
# algebra underlying MvGaussian/EKF/UKF/GMM-full hot paths (r4).


def test_spd_solve_logdet_matches_numpy():
    import numpy as np

    from cortex_tpu.dists.gaussian import _spd_solve_logdet

    rng = np.random.default_rng(0)
    for d, batch in ((2, (7,)), (5, (3, 4)), (16, ())):
        A = rng.normal(size=batch + (d, d))
        M = A @ np.swapaxes(A, -1, -2) + 2.0 * np.eye(d)
        B = rng.normal(size=batch + (d, 3))
        sol, logdet = _spd_solve_logdet(
            jnp.asarray(M, jnp.float32), jnp.asarray(B, jnp.float32)
        )
        np.testing.assert_allclose(
            np.asarray(sol), np.linalg.solve(M, B), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(logdet), np.linalg.slogdet(M)[1], rtol=2e-5
        )


def test_spd_solve_logdet_large_d_fallback():
    import numpy as np

    from cortex_tpu.dists.gaussian import _spd_solve_logdet

    rng = np.random.default_rng(1)
    d = 40  # > 32: LAPACK fallback branch
    A = rng.normal(size=(d, d))
    M = A @ A.T + d * np.eye(d)
    B = rng.normal(size=(d, 2))
    sol, logdet = _spd_solve_logdet(jnp.asarray(M), jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(sol), np.linalg.solve(M, B), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(logdet), np.linalg.slogdet(M)[1], rtol=1e-5)


def test_spd_cholesky_matches_numpy():
    import numpy as np

    from cortex_tpu.dists.gaussian import _spd_cholesky

    rng = np.random.default_rng(2)
    for d, batch in ((1, ()), (3, (6,)), (8, (2, 5))):
        A = rng.normal(size=batch + (d, d))
        M = A @ np.swapaxes(A, -1, -2) + 1.5 * np.eye(d)
        L = np.asarray(_spd_cholesky(jnp.asarray(M, jnp.float32)))
        np.testing.assert_allclose(
            L, np.linalg.cholesky(M), rtol=2e-4, atol=2e-4
        )
        # strictly lower-triangular structure
        assert np.allclose(L, np.tril(L))


def test_reduce_product_matches_pairwise_fold():
    """reduce_product (one stacked reduction) must equal the pairwise *
    fold for every family that defines it — the compiled executor swaps
    one for the other on high-arity products."""
    import numpy as np
    from functools import reduce

    from cortex_tpu.dists import (
        Bernoulli,
        Beta,
        Categorical,
        Dirichlet,
        Gamma,
        Gaussian,
        MvGaussian,
    )

    rng = np.random.default_rng(0)
    k, R = 7, 5

    def check(cls, stacked, fields):
        rows = [
            cls(**{f: getattr(stacked, f)[i] for f in fields})
            for i in range(k)
        ]
        folded = reduce(lambda a, b: a * b, rows)
        reduced = cls.reduce_product(stacked, axis=0)
        for f in fields:
            np.testing.assert_allclose(
                np.asarray(getattr(reduced, f)),
                np.asarray(getattr(folded, f)),
                rtol=1e-6, atol=1e-6,
            )

    check(
        Gaussian,
        Gaussian(
            jnp.asarray(rng.normal(size=(k, R)), jnp.float32),
            jnp.asarray(rng.random((k, R)) + 0.1, jnp.float32),
        ),
        ("xi", "w"),
    )
    check(
        Gamma,
        Gamma(
            jnp.asarray(rng.random((k, R)) + 1.0, jnp.float32),
            jnp.asarray(rng.random((k, R)) + 0.1, jnp.float32),
        ),
        ("shape", "rate"),
    )
    check(
        Beta,
        Beta(
            jnp.asarray(rng.random((k, R)) + 1.0, jnp.float32),
            jnp.asarray(rng.random((k, R)) + 1.0, jnp.float32),
        ),
        ("a", "b"),
    )
    check(
        Bernoulli,
        Bernoulli(jnp.asarray(rng.normal(size=(k, R)), jnp.float32)),
        ("logit",),
    )
    check(
        Categorical,
        Categorical(jnp.asarray(rng.normal(size=(k, R, 3)), jnp.float32)),
        ("logits",),
    )
    check(
        Dirichlet,
        Dirichlet(jnp.asarray(rng.random((k, R, 3)) + 1.0, jnp.float32)),
        ("alpha",),
    )
    check(
        MvGaussian,
        MvGaussian(
            jnp.asarray(rng.normal(size=(k, R, 2)), jnp.float32),
            jnp.asarray(
                np.tile(np.eye(2), (k, R, 1, 1))
                + 0.1 * rng.random((k, R, 2, 2)),
                jnp.float32,
            ),
        ),
        ("xi", "W"),
    )
