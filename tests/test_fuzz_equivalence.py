"""Fuzz equivalence: random factor graphs, dynamic engine vs compiled path.

Generates random bipartite factor graphs (mixed degrees exercising the
degree-1 shortcut, direct wiring, and segment trees), runs sum-product with
Gaussian "noisy-copy" rules on BOTH execution paths, and requires identical
marginals.  This pins the schedule extraction + batched execution against
the reference-faithful dynamic semantics across topologies no hand-written
test enumerates.
"""

import random as pyrandom

import numpy as np
import pytest

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
from cortex_tpu.dists import Gaussian, from_mean_variance


def random_tree_model(rng: pyrandom.Random, n_latent: int):
    """A random tree of latent variables, each with 1-6 observed leaves.

    Tree topology keeps sum-product exact so both paths must agree exactly.
    Factors are 'link' (latent-latent) and 'obs' (latent-observation).
    """
    g = BipartiteFactorGraph()
    latents = [g.add_variable(Variable(name="z", index=(i,))) for i in range(n_latent)]
    observed = []
    for i in range(1, n_latent):
        parent = latents[rng.randrange(i)]
        f = g.add_factor(Factor(functional_form="link"))
        g.add_edge(parent, f, Connection(label="out"))
        g.add_edge(latents[i], f, Connection(label="in"))
    for i in range(n_latent):
        for _ in range(rng.randint(1, 6)):
            o = g.add_variable(Variable(name="y", index=(len(observed),)))
            f = g.add_factor(Factor(functional_form="obs"))
            g.add_edge(latents[i], f, Connection(label="out"))
            g.add_edge(o, f, Connection(label="out"))
            observed.append((o, f))
    return g, latents, observed


class DynamicRules(InferenceRequestProcessor):
    """Scalar sum-product: 'obs' lifts a float to N(y, 1); 'link' adds unit
    noise variance; products are information-form additions."""

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


@pytest.mark.parametrize("seed", range(8))
def test_random_tree_dynamic_vs_compiled(seed):
    rng = pyrandom.Random(seed)
    n_latent = rng.randint(2, 9)
    data_rng = np.random.default_rng(seed)

    # Dynamic path.
    g1, latents1, observed1 = random_tree_model(pyrandom.Random(seed), n_latent)
    engine1 = InferenceEngine(
        model_engine=g1, inference_request_processor=DynamicRules()
    )
    data = data_rng.normal(size=len(observed1)).astype(np.float32)
    for (o, f), y in zip(observed1, data):
        engine1.get_message_to_factor(o, f).set_value(float(y))
    engine1.update_marginals(latents1)
    dyn = [engine1.get_variable_marginal(z).get_value() for z in latents1]

    # Compiled path (fresh graph, same seed => identical topology).
    g2, latents2, observed2 = random_tree_model(pyrandom.Random(seed), n_latent)
    engine2 = InferenceEngine(model_engine=g2)
    compiled = CompiledInference(engine2, latents2, BatchedRules())
    inputs = {
        ("message_to_factor", o, f): jnp.asarray(y)
        for (o, f), y in zip(observed2, data)
    }
    marginals = compiled(inputs)

    for z1, z2 in zip(latents1, latents2):
        got = marginals[z2]
        want = dyn[latents1.index(z1)]
        assert float(got.mean) == pytest.approx(float(want.mean), rel=1e-5, abs=1e-6)
        assert float(got.variance) == pytest.approx(
            float(want.variance), rel=1e-5, abs=1e-6
        )


def test_fixed_point_matches_iterate():
    """The fori_loop fixed-point driver computes the same result as the
    unrolled steady-state iterate (structured VMP model)."""
    import jax
    from tests.test_compiled_vmp import MeanFieldSSMBatched, make_model
    from cortex_tpu.compile import dep_role_key

    rng = np.random.default_rng(11)
    n = 20
    observations = [float(v) for v in np.cumsum(rng.normal(size=n) * 0.1)]
    engine, x, y, ssnoise, obsnoise = make_model(n, observations)
    compiled = CompiledInference(
        engine, [ssnoise, obsnoise] + x, MeanFieldSSMBatched(), refine_key=dep_role_key
    )

    m_loop, _ = compiled.fixed_point({}, n_iterations=30)

    engine2, x2, y2, ssnoise2, obsnoise2 = make_model(n, observations)
    compiled2 = CompiledInference(
        engine2,
        [ssnoise2, obsnoise2] + x2,
        MeanFieldSSMBatched(),
        refine_key=dep_role_key,
    )
    m_unroll, _ = compiled2.iterate({}, n_iterations=30, steady_state=True)

    assert float(m_loop[ssnoise].mean) == pytest.approx(
        float(m_unroll[ssnoise2].mean), rel=1e-5
    )
    assert float(m_loop[x[3]].mean) == pytest.approx(
        float(m_unroll[x2[3]].mean), rel=1e-5, abs=1e-6
    )


def test_fixed_point_jits():
    import jax
    from tests.test_compiled_vmp import MeanFieldSSMBatched, make_model
    from cortex_tpu.compile import dep_role_key

    rng = np.random.default_rng(12)
    n = 10
    observations = [float(v) for v in np.cumsum(rng.normal(size=n) * 0.1)]
    engine, x, y, ssnoise, obsnoise = make_model(n, observations)
    compiled = CompiledInference(
        engine, [ssnoise, obsnoise] + x, MeanFieldSSMBatched(), refine_key=dep_role_key
    )

    @jax.jit
    def run():
        marginals, _ = compiled.fixed_point({}, n_iterations=50)
        return marginals[ssnoise].mean

    out = float(run())
    assert np.isfinite(out) and out > 1.0
