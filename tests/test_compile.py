"""Static-compiler tests: schedule extraction, batched execution, parity with
the dynamic engine and closed forms."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cortex_tpu import (
    BipartiteFactorGraph,
    Connection,
    Factor,
    InferenceEngine,
    Variable,
)
from cortex_tpu.compile import (
    BatchedProcessor,
    CompiledInference,
    extract_schedule,
)
from cortex_tpu.dists import Beta, Gaussian, from_mean_variance


def make_beta_bernoulli_graph(n):
    g = BipartiteFactorGraph()
    p = g.add_variable(Variable(name="p"))
    o, f = [], []
    for i in range(n):
        oi = g.add_variable(Variable(name="o", index=(i,)))
        fi = g.add_factor(Factor(functional_form="bernoulli"))
        o.append(oi)
        f.append(fi)
        g.add_edge(p, fi, Connection(label="out"))
        g.add_edge(oi, fi, Connection(label="out"))
    engine = InferenceEngine(model_engine=g)
    return engine, p, o, f


class BetaBernoulliBatched(BatchedProcessor):
    def compute_message_to_variable(self, engine, variants, dep_values):
        y = dep_values[0]  # stacked observations, (G, ...) float 0/1
        return Beta(1.0 + y, 2.0 - y)


# -- schedule extraction ----------------------------------------------------


def test_schedule_extraction_small_star():
    engine, p, o, f = make_beta_bernoulli_graph(4)
    sched = extract_schedule(engine, [p])
    # Sources: the 4 observation messages o_i -> f_i.
    assert len(sched.sources) == 4
    assert len(sched.initials) == 0
    # Steps: 4 messages + 1 marginal (degree 4 <= 5, no segment tree).
    assert sched.num_steps == 5
    # Two phases: all messages batch in phase 0, marginal in phase 1.
    assert len(sched.phases) == 2
    assert len(sched.phases[0]) == 1
    assert sched.phases[0][0].key == ("MessageToVariable", "bernoulli", 1)
    assert len(sched.phases[0][0].steps) == 4
    assert sched.phases[1][0].key[0] == "IndividualMarginal"


def test_schedule_extraction_segment_tree_depth():
    engine, p, o, f = make_beta_bernoulli_graph(64)
    sched = extract_schedule(engine, [p])
    # 64 messages in phase 0, then log2(64)=6 tree levels collapse into
    # product phases, then the marginal: phases = O(log n), not O(n).
    assert len(sched.phases) <= 8
    assert sched.phases[0][0].key == ("MessageToVariable", "bernoulli", 1)
    assert len(sched.phases[0][0].steps) == 64


def test_schedule_cycle_detection():
    from cortex_tpu import create_inference_signal, variants as V

    g = BipartiteFactorGraph()
    v = g.add_variable(Variable(name="v"))
    engine = InferenceEngine(model_engine=g, resolve_dependencies=False)
    a = create_inference_signal()
    b = create_inference_signal()
    a.set_variant(V.IndividualMarginal(v))
    b.set_variant(V.IndividualMarginal(v))
    a.add_dependency(b, intermediate=True)
    b.add_dependency(a, intermediate=True)
    engine.get_variable(v).marginal.add_dependency(a, intermediate=True)
    with pytest.raises(ValueError, match="cycle"):
        extract_schedule(engine, [v])


def test_schedule_skips_never_computable_signals():
    """A strong cycle behind non-intermediate edges is unreachable for the
    dynamic engine (its signals never pend); the compiler skips it instead of
    erroring — matching dynamic semantics."""
    from cortex_tpu import create_inference_signal, variants as V

    g = BipartiteFactorGraph()
    v = g.add_variable(Variable(name="v"))
    engine = InferenceEngine(model_engine=g, resolve_dependencies=False)
    a = create_inference_signal()
    b = create_inference_signal()
    a.set_variant(V.IndividualMarginal(v))
    b.set_variant(V.IndividualMarginal(v))
    a.add_dependency(b)
    b.add_dependency(a)
    engine.get_variable(v).marginal.add_dependency(a)
    with pytest.warns(UserWarning, match="silently never run"):
        sched = extract_schedule(engine, [v])
    assert sched.num_steps == 0
    assert len(sched.skipped) >= 2  # a and the marginal itself


def test_schedule_warns_on_weak_deadlocked_target():
    """A requested VMP marginal in a weak-deadlocked cycle (mutually
    uncomputed weak reads) lands in ``skipped``; the compiler must emit an
    engine warning by default instead of freezing it silently."""
    from cortex_tpu import create_inference_signal, variants as V

    g = BipartiteFactorGraph()
    v = g.add_variable(Variable(name="v"))
    w = g.add_variable(Variable(name="w"))
    engine = InferenceEngine(model_engine=g, resolve_dependencies=False)
    mv = engine.get_variable(v).marginal
    mw = engine.get_variable(w).marginal
    # Mutually-uncomputed weak cycle: neither can ever run its first update.
    mv.add_dependency(mw, weak=True, intermediate=True)
    mw.add_dependency(mv, weak=True, intermediate=True)
    with pytest.warns(UserWarning, match="silently never run"):
        sched = extract_schedule(engine, [v, w])
    assert {id(s) for s in sched.skipped} == {id(mv), id(mw)}
    warns = engine.get_warnings()
    assert any("silently never run" in wn.description for wn in warns)
    assert sorted(warns[-1].context) == sorted([v, w])


# -- batched execution ------------------------------------------------------


@pytest.mark.parametrize("n", [5, 100])
def test_compiled_beta_bernoulli_matches_closed_form(n):
    rng = np.random.default_rng(0)
    data = (rng.random(n) < 0.7).astype(np.float32)

    engine, p, o, f = make_beta_bernoulli_graph(n)
    compiled = CompiledInference(engine, [p], BetaBernoulliBatched())

    inputs = {
        ("message_to_factor", o[i], f[i]): jnp.asarray(data[i]) for i in range(n)
    }
    marginals = compiled(inputs)
    posterior = marginals[p]
    assert isinstance(posterior, Beta)
    assert float(posterior.a) == pytest.approx(1.0 + data.sum())
    assert float(posterior.b) == pytest.approx(1.0 + n - data.sum())


def test_compiled_beta_bernoulli_replica_batched():
    """One compiled program, 128 independent replicas along a batch axis."""
    n, R = 20, 128
    rng = np.random.default_rng(1)
    data = (rng.random((n, R)) < 0.3).astype(np.float32)

    engine, p, o, f = make_beta_bernoulli_graph(n)
    compiled = CompiledInference(engine, [p], BetaBernoulliBatched())
    inputs = {
        ("message_to_factor", o[i], f[i]): jnp.asarray(data[i]) for i in range(n)
    }
    posterior = compiled(inputs)[p]
    assert posterior.a.shape == (R,)
    np.testing.assert_allclose(
        np.asarray(posterior.a), 1.0 + data.sum(axis=0), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(posterior.b), 1.0 + n - data.sum(axis=0), rtol=1e-6
    )


def test_compiled_run_is_jittable():
    n, R = 10, 16
    engine, p, o, f = make_beta_bernoulli_graph(n)
    compiled = CompiledInference(engine, [p], BetaBernoulliBatched())
    source_signals = compiled.schedule.sources

    @jax.jit
    def run(stacked_inputs):
        inputs = {s: stacked_inputs[i] for i, s in enumerate(source_signals)}
        marginals, _ = compiled.run(inputs)
        return marginals[p].a, marginals[p].b

    rng = np.random.default_rng(2)
    data = (rng.random((n, R)) < 0.5).astype(np.float32)
    a, b = run(jnp.asarray(data))
    np.testing.assert_allclose(np.asarray(a), 1.0 + data.sum(axis=0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b), 1.0 + n - data.sum(axis=0), rtol=1e-6)


# -- LGSSM chain through the generic compiler -------------------------------


# Promoted into the package (cortex_tpu/models/lgssm_graph.py) so bench.py
# doesn't depend on the test tree; re-exported here for sibling tests.
from cortex_tpu.models import LGSSMChainBatched, make_chain_graph  # noqa: E402,F401


def test_compiled_chain_matches_scan_smoother():
    from cortex_tpu.ops import lgssm_smooth_scan

    n = 16
    rng = np.random.default_rng(3)
    data = rng.normal(size=n).cumsum().astype(np.float32)

    engine, x, y, likelihood = make_chain_graph(n)
    compiled = CompiledInference(engine, x, LGSSMChainBatched())
    inputs = {
        ("message_to_factor", y[i], likelihood[i]): jnp.asarray(data[i])
        for i in range(n)
    }
    marginals = compiled(inputs)

    oracle = lgssm_smooth_scan(jnp.asarray(data), A=1.0, Q=1.0, H=1.0, R=1.0)
    means = np.array([float(marginals[xi].mean) for xi in x])
    variances = np.array([float(marginals[xi].variance) for xi in x])
    np.testing.assert_allclose(means, np.asarray(oracle.mean), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        variances, np.asarray(oracle.variance), rtol=1e-4, atol=1e-5
    )


# -- weak-edge (VMP) iteration ---------------------------------------------


def test_compiled_vmp_weak_cycle_iterates():
    """Two coupled Gaussians with weak mutual dependencies: the compiled
    iterate() converges to the fixed point, reading stale values through weak
    edges exactly like the dynamic engine."""
    from cortex_tpu import MeanFieldResolver

    g = BipartiteFactorGraph()
    a = g.add_variable(Variable(name="a"))
    b = g.add_variable(Variable(name="b"))
    f = g.add_factor(Factor(functional_form="couple"))
    g.add_edge(a, f, Connection(label="out"))
    g.add_edge(b, f, Connection(label="in"))
    engine = InferenceEngine(model_engine=g, dependency_resolver=MeanFieldResolver())

    # Initial marginals (computed at compile time -> iteration state).
    engine.get_variable_marginal(a).set_value(from_mean_variance(0.0, 1.0))
    engine.get_variable_marginal(b).set_value(from_mean_variance(4.0, 1.0))

    class Couple(BatchedProcessor):
        # Each message pulls towards the other's (stale) mean, halving
        # towards 2.0: a damped averaging fixed point at mean 2.
        def compute_message_to_variable(self, engine, variants, dep_values):
            other = dep_values[0]
            return from_mean_variance(
                (other.mean + 2.0) / 2.0, jnp.ones_like(other.mean)
            )

        def compute_individual_marginal(self, engine, variants, dep_values):
            return dep_values[0]

    compiled = CompiledInference(engine, [a, b], Couple())
    assert len(compiled.schedule.initials) == 2
    marginals, state = compiled.iterate({}, n_iterations=30)
    assert float(marginals[a].mean) == pytest.approx(2.0, abs=1e-4)
    assert float(marginals[b].mean) == pytest.approx(2.0, abs=1e-4)
