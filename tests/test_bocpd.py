"""BOCPD: float64 numpy oracle parity + changepoint localization.

Oracle: an independent, direct numpy implementation of Adams & MacKay (2007)
with NO truncation (run-length support grows with t), in float64.  With
``r_max > T`` the JAX filter is exact, so posteriors must agree to float32
precision.
"""

import numpy as np
import pytest
from scipy.stats import t as student_t

import jax.numpy as jnp

from cortex_tpu.models.bocpd import BOCPD, BernoulliBeta, GaussianNIG


def _oracle_gaussian(y, hazard, mu0, kappa0, alpha0, beta0):
    """Untruncated float64 BOCPD with NIG/Student-t predictives."""
    T = len(y)
    logw = np.array([0.0])  # p(r_0 = 0) = 1
    n = np.array([0.0])
    s = np.array([0.0])
    q = np.array([0.0])
    out = np.full((T, T + 1), -np.inf)
    log_Z = 0.0
    for t_idx in range(T):
        kappa = kappa0 + n
        mu = (kappa0 * mu0 + s) / kappa
        alpha = alpha0 + 0.5 * n
        beta = (
            beta0
            + 0.5 * (q - 2 * s * mu + n * mu**2)
            + 0.5 * kappa0 * (mu - mu0) ** 2
        )
        nu = 2.0 * alpha
        scale = np.sqrt(beta * (kappa + 1.0) / (alpha * kappa))
        pred = student_t.logpdf(y[t_idx], df=nu, loc=mu, scale=scale)
        joint = logw + pred
        grow = joint + np.log1p(-hazard)
        change = np.logaddexp.reduce(joint + np.log(hazard))
        new = np.concatenate([[change], grow])
        step_Z = np.logaddexp.reduce(new)
        logw = new - step_Z
        log_Z += step_Z
        out[t_idx, : len(logw)] = logw
        n = np.concatenate([[0.0], n + 1.0])
        s = np.concatenate([[0.0], s + y[t_idx]])
        q = np.concatenate([[0.0], q + y[t_idx] ** 2])
    return out, log_Z


def test_gaussian_bocpd_matches_untruncated_oracle():
    rng = np.random.default_rng(0)
    T = 60
    y = np.concatenate(
        [rng.normal(0.0, 1.0, size=30), rng.normal(4.0, 0.5, size=30)]
    )
    hazard = 0.02
    prior = dict(mu0=0.0, kappa0=1.0, alpha0=1.5, beta0=1.0)

    model = BOCPD(obs_model=GaussianNIG(**prior), hazard=hazard, r_max=T + 2)
    got = model.filter(jnp.asarray(y, jnp.float32))
    want, want_Z = _oracle_gaussian(y, hazard, **prior)

    got_lw = np.asarray(got.run_length_logprobs, np.float64)
    for t_idx in range(T):
        w = want[t_idx, : t_idx + 2]
        g = got_lw[t_idx, : t_idx + 2]
        keep = w > -25  # compare non-negligible mass only
        np.testing.assert_allclose(g[keep], w[keep], rtol=2e-3, atol=2e-3)
    assert float(got.log_evidence) == pytest.approx(want_Z, rel=1e-4)


def test_gaussian_bocpd_localizes_changepoint():
    rng = np.random.default_rng(1)
    y = np.concatenate(
        [rng.normal(0.0, 1.0, size=50), rng.normal(6.0, 1.0, size=50)]
    )
    model = BOCPD(hazard=0.01, r_max=128)
    res = model.filter(jnp.asarray(y, jnp.float32))
    cp = np.asarray(res.changepoint_prob)
    # Changepoint probability spikes at/right after t=50 and nowhere else.
    assert cp[50:53].max() > 0.5
    # quiet regions: transient single-step blips happen, but nothing
    # approaches the true-change spike
    assert cp[10:48].max() < 0.45
    assert cp[60:].max() < 0.2
    # p(r_t = 0) alone is identically the hazard under constant hazard.
    p_r0 = np.exp(np.asarray(res.run_length_logprobs)[5:, 0])
    np.testing.assert_allclose(p_r0, 0.01, rtol=1e-4)
    # MAP run length resets at the changepoint, then grows again.
    mrl = np.asarray(res.map_run_length)
    assert mrl[49] > 40
    assert mrl[52] < 5
    assert mrl[99] == pytest.approx(99 - 50, abs=3)


def test_bocpd_batches_over_replicas():
    rng = np.random.default_rng(2)
    a = np.concatenate([rng.normal(0, 1, 40), rng.normal(5, 1, 24)])
    b = rng.normal(0, 1, 64)  # no change
    y = jnp.asarray(np.stack([a, b]), jnp.float32)
    res = BOCPD(hazard=0.02, r_max=80).filter(y)
    assert res.run_length_logprobs.shape == (2, 64, 80)
    cp = np.asarray(res.changepoint_prob)
    assert cp[0, 40:43].max() > 0.5
    assert cp[1, 20:].max() < 0.2
    # Per-replica results equal the unbatched runs (no cross-talk).
    solo = BOCPD(hazard=0.02, r_max=80).filter(y[0])
    np.testing.assert_allclose(
        np.asarray(solo.changepoint_prob), cp[0], rtol=1e-5, atol=1e-6
    )


def test_bernoulli_bocpd_detects_rate_shift():
    rng = np.random.default_rng(3)
    y = np.concatenate(
        [rng.binomial(1, 0.1, size=80), rng.binomial(1, 0.9, size=80)]
    ).astype(np.float32)
    model = BOCPD(obs_model=BernoulliBeta(), hazard=0.01, r_max=200)
    res = model.filter(jnp.asarray(y))
    mrl = np.asarray(res.map_run_length)
    assert mrl[79] > 80 * 0.7
    assert mrl[90] < 15
    # Truncated vs exact: r_max larger than T means exactness; a smaller
    # truncation must still conserve probability mass (normalized).
    small = BOCPD(obs_model=BernoulliBeta(), hazard=0.01, r_max=32).filter(
        jnp.asarray(y)
    )
    total = np.exp(np.asarray(small.run_length_logprobs, np.float64)).sum(-1)
    np.testing.assert_allclose(total, 1.0, rtol=1e-4)


def test_bocpd_is_jittable_and_donatable():
    import jax

    y = jnp.asarray(np.random.default_rng(4).normal(size=(3, 32)), jnp.float32)
    model = BOCPD(hazard=0.05, r_max=40)
    jitted = jax.jit(model.filter)
    res = jitted(y)
    ref = model.filter(y)
    np.testing.assert_allclose(
        np.asarray(res.changepoint_prob), np.asarray(ref.changepoint_prob), rtol=1e-6
    )
