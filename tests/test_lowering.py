"""Chain-lowering tests: the generic compiler rerolls unrolled chain
schedules into lax.scan segments with values identical to the plain phased
executor and to the dynamic engine (fuzzed over random chain topologies)."""

import random as pyrandom

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cortex_tpu import (
    BipartiteFactorGraph,
    Connection,
    Factor,
    InferenceEngine,
    InferenceRequestProcessor,
    Variable,
)
from cortex_tpu.compile import BatchedProcessor, CompiledInference
from cortex_tpu.dists import from_mean_variance

from test_compile import LGSSMChainBatched, make_chain_graph


def test_chain_schedule_is_lowered_to_one_scan():
    n = 32
    engine, x, y, likelihood = make_chain_graph(n)
    compiled = CompiledInference(engine, x, LGSSMChainBatched())
    assert compiled.plan is not None
    scans = compiled.plan.scan_segments
    # Forward and backward recursions merge into ONE scan of length n-2.
    assert len(scans) == 1
    assert scans[0].length == n - 2
    # Two classes (product, transition message), two sequences each.
    assert sorted(len(c.seqs) for c in scans[0].classes) == [2, 2]
    # The phase count collapses from O(n) to O(1).
    n_phases = sum(1 for kind, _ in compiled.plan.segments if kind == "phase")
    assert n_phases <= 5


def test_lowered_chain_matches_unlowered_and_oracle():
    from cortex_tpu.ops import lgssm_smooth_scan

    n = 24
    rng = np.random.default_rng(5)
    data = rng.normal(size=n).cumsum().astype(np.float32)

    def run(lower):
        engine, x, y, likelihood = make_chain_graph(n)
        compiled = CompiledInference(engine, x, LGSSMChainBatched(), lower=lower)
        inputs = {
            ("message_to_factor", y[i], likelihood[i]): jnp.asarray(data[i])
            for i in range(n)
        }
        marginals = compiled(inputs)
        return (
            np.array([float(marginals[xi].mean) for xi in x]),
            np.array([float(marginals[xi].variance) for xi in x]),
        )

    m1, v1 = run(lower=True)
    m0, v0 = run(lower=False)
    np.testing.assert_allclose(m1, m0, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(v1, v0, rtol=1e-6, atol=1e-7)
    oracle = lgssm_smooth_scan(jnp.asarray(data), A=1.0, Q=1.0, H=1.0, R=1.0)
    np.testing.assert_allclose(m1, np.asarray(oracle.mean), rtol=1e-4, atol=1e-5)


def test_lowered_chain_replica_batched_and_jitted():
    n, R = 20, 64
    engine, x, y, likelihood = make_chain_graph(n)
    compiled = CompiledInference(engine, x, LGSSMChainBatched())
    assert compiled.plan is not None and compiled.plan.scan_segments
    sources = compiled.schedule.sources

    @jax.jit
    def run(stacked):
        inputs = {s: stacked[i] for i, s in enumerate(sources)}
        marginals, _ = compiled.run(inputs)
        return marginals[x[n // 2]].mean

    rng = np.random.default_rng(7)
    data = rng.normal(size=(len(sources), R)).astype(np.float32)
    out = run(jnp.asarray(data))
    assert out.shape == (R,)
    assert np.all(np.isfinite(np.asarray(out)))


# -- fuzz: random chain topologies, dynamic vs lowered ------------------------


def random_chain_model(rng: pyrandom.Random, n: int):
    """A latent chain with a random number of observation leaves per latent
    (0-3): degree variation exercises boundary classes, segment splits, and
    the marginal-arity mix.  Tree topology keeps sum-product exact."""
    g = BipartiteFactorGraph()
    latents = [g.add_variable(Variable(name="x", index=(i,))) for i in range(n)]
    for i in range(n - 1):
        f = g.add_factor(Factor(functional_form="link"))
        g.add_edge(latents[i], f, Connection(label="out"))
        g.add_edge(latents[i + 1], f, Connection(label="in"))
    observed = []
    for i in range(n):
        # End latents need >= 1 observation or no message can ever originate
        # there (the dynamic engine deadlocks identically on such graphs).
        low = 1 if i in (0, n - 1) else 0
        for _ in range(rng.randint(low, 3)):
            o = g.add_variable(Variable(name="y", index=(len(observed),)))
            f = g.add_factor(Factor(functional_form="obs"))
            g.add_edge(latents[i], f, Connection(label="out"))
            g.add_edge(o, f, Connection(label="out"))
            observed.append((o, f))
    return g, latents, observed


class DynamicRules(InferenceRequestProcessor):
    def compute_message_to_variable(self, engine, variant, signal, deps):
        form = engine.get_factor(variant.factor_id).functional_form
        v = deps[0].get_value()
        if form == "obs":
            return from_mean_variance(jnp.asarray(v), jnp.asarray(1.0))
        return from_mean_variance(v.mean, v.variance + 1.0)

    def _product(self, engine, variant, signal, deps):
        out = deps[0].get_value()
        for d in deps[1:]:
            out = out * d.get_value()
        return out

    compute_individual_marginal = _product
    compute_product_of_messages = _product
    compute_message_to_factor = _product


class BatchedRules(BatchedProcessor):
    def compute_message_to_variable(self, engine, variants, dep_values):
        form = engine.get_factor(variants[0].factor_id).functional_form
        v = dep_values[0]
        if form == "obs":
            return from_mean_variance(v, jnp.ones_like(v))
        return from_mean_variance(v.mean, v.variance + 1.0)


@pytest.mark.parametrize("seed", range(6))
def test_random_chain_dynamic_vs_lowered(seed):
    rng = pyrandom.Random(1000 + seed)
    n = rng.randint(6, 24)
    data_rng = np.random.default_rng(seed)

    g1, latents1, observed1 = random_chain_model(pyrandom.Random(1000 + seed), n)
    engine1 = InferenceEngine(
        model_engine=g1, inference_request_processor=DynamicRules()
    )
    data = data_rng.normal(size=len(observed1)).astype(np.float32)
    for (o, f), yv in zip(observed1, data):
        engine1.get_message_to_factor(o, f).set_value(float(yv))
    engine1.update_marginals(latents1)
    dyn = [engine1.get_variable_marginal(z).get_value() for z in latents1]

    g2, latents2, observed2 = random_chain_model(pyrandom.Random(1000 + seed), n)
    engine2 = InferenceEngine(model_engine=g2)
    compiled = CompiledInference(engine2, latents2, BatchedRules())
    inputs = {
        ("message_to_factor", o, f): jnp.asarray(yv)
        for (o, f), yv in zip(observed2, data)
    }
    marginals = compiled(inputs)

    for want, z2 in zip(dyn, latents2):
        got = marginals[z2]
        assert float(got.mean) == pytest.approx(float(want.mean), rel=1e-5, abs=1e-6)
        assert float(got.variance) == pytest.approx(
            float(want.variance), rel=1e-5, abs=1e-6
        )


def test_uniform_chain_gets_scan_segments():
    """A clean chain (every latent observed once) must actually trigger the
    lowering — guards against the miner silently regressing to fallback."""
    g = BipartiteFactorGraph()
    n = 16
    latents = [g.add_variable(Variable(name="x", index=(i,))) for i in range(n)]
    for i in range(n - 1):
        f = g.add_factor(Factor(functional_form="link"))
        g.add_edge(latents[i], f, Connection(label="out"))
        g.add_edge(latents[i + 1], f, Connection(label="in"))
    observed = []
    for i in range(n):
        o = g.add_variable(Variable(name="y", index=(i,)))
        f = g.add_factor(Factor(functional_form="obs"))
        g.add_edge(latents[i], f, Connection(label="out"))
        g.add_edge(o, f, Connection(label="out"))
        observed.append((o, f))
    engine = InferenceEngine(model_engine=g)
    compiled = CompiledInference(engine, latents, BatchedRules())
    assert compiled.plan is not None
    assert len(compiled.plan.scan_segments) >= 1


def test_fixed_point_dataflow_mode_matches_iterate():
    """fixed_point(mode='dataflow') must equal repeated dataflow sweeps."""
    from test_compiled_vmp import MeanFieldSSMBatched, make_model
    from cortex_tpu.compile import dep_role_key

    rng = np.random.default_rng(3)
    n = 12
    observations = [float(v) for v in np.cumsum(rng.normal(size=n) * 0.1)]
    engine, x, y, ssnoise, obsnoise = make_model(n, observations)
    compiled = CompiledInference(
        engine, [ssnoise, obsnoise] + x, MeanFieldSSMBatched(), refine_key=dep_role_key
    )
    m_fp, _ = compiled.fixed_point({}, n_iterations=20, mode="dataflow")

    engine2, x2, y2, ssnoise2, obsnoise2 = make_model(n, observations)
    compiled2 = CompiledInference(
        engine2,
        [ssnoise2, obsnoise2] + x2,
        MeanFieldSSMBatched(),
        refine_key=dep_role_key,
    )
    m_it, _ = compiled2.iterate({}, n_iterations=20)
    assert float(m_fp[ssnoise].mean) == pytest.approx(
        float(m_it[ssnoise2].mean), rel=1e-5
    )
    assert float(m_fp[x[4]].mean) == pytest.approx(
        float(m_it[x2[4]].mean), rel=1e-5, abs=1e-6
    )


def test_fixed_point_on_chain_lowered_schedule():
    """fixed_point must work when the plan elides scan-interior signals:
    the warm start uses the fully-emitting plan (lower_schedule(emit_all=True))
    so the carry can snapshot every scheduled signal.  Regression: KeyError
    in the carry snapshot on chain-lowered schedules (both modes)."""
    from test_compile import LGSSMChainBatched, make_chain_graph

    from cortex_tpu.ops import lgssm_smooth_scan

    n = 16
    rng = np.random.default_rng(7)
    data = rng.normal(size=n).cumsum().astype(np.float32)

    for mode in ("steady_state", "dataflow"):
        engine, x, y, likelihood = make_chain_graph(n)
        compiled = CompiledInference(engine, x, LGSSMChainBatched())
        assert compiled.plan is not None and compiled.plan.scan_segments
        inputs = {
            ("message_to_factor", y[i], likelihood[i]): jnp.asarray(data[i])
            for i in range(n)
        }
        # A BP chain is a DAG: already exact after the dataflow warm start,
        # and extra sweeps must be a fixed point (no drift).
        marginals, _ = compiled.fixed_point(inputs, n_iterations=4, mode=mode)
        oracle = lgssm_smooth_scan(jnp.asarray(data), A=1.0, Q=1.0, H=1.0, R=1.0)
        means = np.array([float(marginals[xi].mean) for xi in x])
        np.testing.assert_allclose(
            means, np.asarray(oracle.mean), rtol=1e-4, atol=1e-5
        )
