"""Tests for failure detection (diag) and compiled-path tracing."""

import numpy as np
import pytest

import jax.numpy as jnp

from cortex_tpu.diag import ConvergenceMonitor, DivergenceError, check_finite


def test_check_finite_passes_clean_tree():
    check_finite({"a": jnp.ones(3), "b": (jnp.zeros(2), jnp.asarray(1.0))})


def test_check_finite_names_bad_leaves():
    tree = {"good": jnp.ones(3), "bad": jnp.asarray([1.0, np.nan, np.inf])}
    with pytest.raises(DivergenceError, match="bad"):
        check_finite(tree, where="posterior")


def test_convergence_monitor_detects_convergence():
    m = ConvergenceMonitor(rtol=1e-3)
    fes = [100.0, 50.0, 40.0, 39.99, 39.9899]
    flags = [m.update(np.asarray(fe)) for fe in fes]
    assert not flags[1] and not flags[2]
    assert flags[4]  # relative change below tolerance
    assert not m.diverged


def test_convergence_monitor_detects_divergence():
    m = ConvergenceMonitor(patience=2)
    for fe in [10.0, 11.0, 12.0, 13.0]:
        m.update(np.asarray(fe))
    assert m.diverged
    with pytest.raises(DivergenceError):
        m.raise_if_diverged()


def test_convergence_monitor_vectorized_over_replicas():
    m = ConvergenceMonitor(patience=2)
    m.update(np.array([10.0, 10.0]))
    m.update(np.array([9.0, 11.0]))
    m.update(np.array([8.5, 12.0]))
    d = m.diverged
    assert not d[0] and d[1]


def test_convergence_monitor_nan_is_divergence():
    m = ConvergenceMonitor()
    m.update(np.asarray([np.nan]))
    assert m.diverged.all()


def test_trace_run_interpreter_mode():
    from cortex_tpu.compile.tracing import trace_run
    from tests.test_compile import (
        BetaBernoulliBatched,
        make_beta_bernoulli_graph,
    )
    from cortex_tpu.compile import CompiledInference

    engine, p, o, f = make_beta_bernoulli_graph(10)
    compiled = CompiledInference(engine, [p], BetaBernoulliBatched())
    inputs = {
        ("message_to_factor", o[i], f[i]): jnp.asarray(1.0) for i in range(10)
    }
    sweep = trace_run(compiled, inputs, snapshot_values=True)
    assert sweep.total_ns > 0
    assert len(sweep.groups) == sum(len(ph) for ph in compiled.schedule.phases)
    assert all(g.wall_ns > 0 for g in sweep.groups)
    assert sweep.groups[0].key[0] == "MessageToVariable"
    assert sweep.groups[0].outputs is not None
    # The traced marginal matches the jitted path.
    posterior = sweep.marginals[p]
    assert float(posterior.a) == pytest.approx(11.0)
    text = repr(sweep)
    assert "MessageToVariable" in text and "phase" in text


def test_rhat_mixed_vs_stuck_chains():
    import jax
    from cortex_tpu.diag import rhat

    rng = np.random.default_rng(0)
    mixed = jnp.asarray(rng.normal(size=(4, 500)))
    r = float(rhat(mixed))
    assert 0.99 < r < 1.02, r
    # Chains centered at different values: R-hat must flag it.
    stuck = mixed + jnp.arange(4.0)[:, None]
    assert float(rhat(stuck)) > 1.5
    # Vector quantities broadcast.
    vec = jnp.asarray(rng.normal(size=(4, 300, 3)))
    assert rhat(vec).shape == (3,)


def test_ess_iid_and_ar1():
    from cortex_tpu.diag import ess

    rng = np.random.default_rng(1)
    m, n = 4, 2000
    iid = jnp.asarray(rng.normal(size=(m, n)))
    e = float(ess(iid))
    assert 0.7 * m * n < e <= 1.3 * m * n, e

    phi = 0.9
    z = np.zeros((m, n))
    eps = rng.normal(size=(m, n))
    for t in range(1, n):
        z[:, t] = phi * z[:, t - 1] + eps[:, t]
    expected = m * n * (1 - phi) / (1 + phi)
    e_ar = float(ess(jnp.asarray(z)))
    assert 0.5 * expected < e_ar < 2.0 * expected, (e_ar, expected)
    assert e_ar < 0.2 * m * n  # strongly autocorrelated ⇒ far below M·N


def test_ess_rhat_on_hmc_output():
    import jax
    from cortex_tpu.diag import ess, rhat
    from cortex_tpu.ops import hmc_sample

    def logp(x):
        return -0.5 * jnp.sum(x**2)

    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    res = jax.vmap(
        lambda k: hmc_sample(k, logp, jnp.zeros(2), n_samples=300, n_warmup=200)
    )(keys)
    draws0 = res.samples[..., 0]  # (4, 300)
    assert float(rhat(draws0)) < 1.05
    assert float(ess(draws0)) > 200.0
