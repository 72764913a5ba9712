"""The reference's structured VMP SSM through the COMPILED path.

The gold model of ``test/inference_engine_tests.jl:807-1147``: pairwise joint
marginals (2×2 Gaussians) over transition clusters, mean-field likelihoods,
Gamma precision posteriors — executed as a static batched program with
role-refined groups.  Joint-marginal updates run as ONE batched 2×2
information-form assembly per sweep.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cortex_tpu import (
    BipartiteFactorGraph,
    Connection,
    Factor,
    InferenceEngine,
    StructuredResolver,
    Variable,
)
from cortex_tpu.compile import BatchedProcessor, CompiledInference, dep_role_key
from cortex_tpu.dists import Gamma, MvGaussian, from_mean_precision


class StructuredSSMBatched(BatchedProcessor):
    """Batched structured-VMP rules (cf. the dynamic
    ``SSMStructuredProcessor``, ``test/inference_engine_tests.jl:917-1035``)."""

    def dispatch(self, engine, group, dep_values):
        kind = group.key[0]
        if kind in ("IndividualMarginal", "MessageToFactor", "ProductOfMessages"):
            return self.compute_individual_marginal(engine, None, dep_values)
        if kind == "JointMarginal":
            # deps: (msg_to_factor x_i, msg_to_factor x_{i+1}, q(ssnoise)).
            msg1, msg2, q_ss = dep_values
            xi1, w1 = msg1.xi, msg1.w
            xi2, w2 = msg2.xi, msg2.w
            w_bar = q_ss.mean
            # Information-form 2x2 joint: W = [[w1+wb, -wb], [-wb, w2+wb]].
            W = jnp.stack(
                [
                    jnp.stack([w1 + w_bar, -w_bar], axis=-1),
                    jnp.stack([-w_bar, w2 + w_bar], axis=-1),
                ],
                axis=-2,
            )
            xi = jnp.stack([xi1, xi2], axis=-1)
            return MvGaussian(xi, W)
        assert kind == "MessageToVariable"
        own_role, dep_roles = group.key[3]
        form = engine.get_factor(group.steps[0].variant.factor_id).functional_form

        if form == "likelihood":
            if dep_roles == ("y", "obsnoise"):
                y, q_obs = dep_values
                return from_mean_precision(y, q_obs.mean)
            if dep_roles == ("y", "x"):
                y, q_x = dep_values
                rate = 0.5 * (q_x.variance + (y - q_x.mean) ** 2)
                return Gamma(jnp.full_like(rate, 1.5), rate)
            raise RuntimeError(f"likelihood roles {dep_roles}")
        if form == "transition":
            if own_role == "ssnoise":
                # Message to ssnoise from the joint marginal.
                (jm,) = dep_values
                cov = jm.cov
                m = jm.mean
                rate = 0.5 * (
                    cov[..., 0, 0]
                    - cov[..., 0, 1]
                    - cov[..., 1, 0]
                    + cov[..., 1, 1]
                    + (m[..., 0] - m[..., 1]) ** 2
                )
                return Gamma(jnp.full_like(rate, 1.5), rate)
            # Message to x: from the other x's inbound message + q(ssnoise):
            # N(mean(msg), 1/(var(msg) + 1/E[tau])).
            msg, q_ss = dep_values
            prec = 1.0 / (msg.variance + 1.0 / q_ss.mean)
            return from_mean_precision(msg.mean, prec)
        raise RuntimeError(f"Unknown group: {group.key}")


def make_model(n, observations):
    g = BipartiteFactorGraph()
    ssnoise = g.add_variable(Variable(name="ssnoise"))
    obsnoise = g.add_variable(Variable(name="obsnoise"))
    x = [g.add_variable(Variable(name="x", index=(i,))) for i in range(n)]
    y = [g.add_variable(Variable(name="y", index=(i,))) for i in range(n)]
    likelihood = [g.add_factor(Factor(functional_form="likelihood")) for _ in range(n)]
    transition = [
        g.add_factor(Factor(functional_form="transition")) for _ in range(n - 1)
    ]
    for i in range(n):
        g.add_edge(y[i], likelihood[i], Connection(label="out"))
        g.add_edge(x[i], likelihood[i], Connection(label="out"))
        g.add_edge(obsnoise, likelihood[i], Connection(label="out"))
    for i in range(n - 1):
        g.add_edge(x[i], transition[i], Connection(label="out"))
        g.add_edge(x[i + 1], transition[i], Connection(label="in"))
        g.add_edge(ssnoise, transition[i], Connection(label="out"))

    resolver = StructuredResolver(
        mean_field_predicate=lambda e, fid: e.get_factor(fid).get_functional_form()
        == "likelihood"
    )
    engine = InferenceEngine(model_engine=g, dependency_resolver=resolver)

    engine.get_variable_marginal(ssnoise).set_value(
        Gamma(jnp.asarray(1.0), jnp.asarray(1.0))
    )
    engine.get_variable_marginal(obsnoise).set_value(
        Gamma(jnp.asarray(1.0), jnp.asarray(1.0))
    )
    for i in range(n):
        engine.get_variable_marginal(x[i]).set_value(from_mean_precision(0.0, 1.0))
        engine.get_variable_marginal(y[i]).set_value(jnp.asarray(observations[i]))
    return engine, x, y, ssnoise, obsnoise


def test_compiled_structured_vmp_recovers_precisions():
    rng = np.random.default_rng(7)
    n = 100
    ssnoise_real = obsnoise_real = 100.0
    walk = [0.0]
    for _ in range(1, n):
        walk.append(walk[-1] + rng.normal() / np.sqrt(ssnoise_real))
    observations = [float(w + rng.normal() / np.sqrt(obsnoise_real)) for w in walk]

    engine, x, y, ssnoise, obsnoise = make_model(n, observations)
    compiled = CompiledInference(
        engine,
        [ssnoise, obsnoise] + x,
        StructuredSSMBatched(),
        refine_key=dep_role_key,
    )

    # All n-1 joint marginals are scheduled, and in the steady-state (Jacobi)
    # sweep they collapse into ONE batched group.
    joint_steps = [
        st
        for ph in compiled.schedule.phases
        for gr in ph
        if gr.key[0] == "JointMarginal"
        for st in gr.steps
    ]
    assert len(joint_steps) == n - 1
    jacobi_joint_groups = [
        gr for gr in compiled.jacobi_phases()[0] if gr.key[0] == "JointMarginal"
    ]
    assert len(jacobi_joint_groups) == 1
    assert len(jacobi_joint_groups[0].steps) == n - 1

    marginals, _ = compiled.iterate({}, n_iterations=80, steady_state=True)
    q_ss = marginals[ssnoise]
    q_obs = marginals[obsnoise]
    # Structured VMP resolves the process/observation split far better than
    # mean field (reference gate: >90 with its data/schedule).
    assert float(q_ss.mean) > 60.0
    assert float(q_obs.mean) > 60.0
    errs = [abs(float(marginals[x[i]].mean) - walk[i]) for i in range(n)]
    assert np.mean(errs) < 0.1


def test_compiled_structured_matches_dynamic_fixed_point():
    from tests.test_inference_engine import make_structured_ssm_model, mean as dmean

    rng = np.random.default_rng(3)
    n = 25
    observations = [float(v) for v in np.cumsum(rng.normal(size=n) * 0.12)]

    engine_d, x_d, y_d, obsnoise_d, ssnoise_d = make_structured_ssm_model(n)
    for i in range(n):
        engine_d.get_variable_marginal(y_d[i]).set_value(observations[i])
    for _ in range(120):
        engine_d.update_marginals([ssnoise_d, obsnoise_d] + x_d)
    dyn_ss = dmean(engine_d.get_variable_marginal(ssnoise_d).get_value())
    dyn_obs = dmean(engine_d.get_variable_marginal(obsnoise_d).get_value())

    engine_c, x_c, y_c, ssnoise_c, obsnoise_c = make_model(n, observations)
    compiled = CompiledInference(
        engine_c,
        [ssnoise_c, obsnoise_c] + x_c,
        StructuredSSMBatched(),
        refine_key=dep_role_key,
    )
    # One dynamic update_marginals call runs several internal sweeps; iterate
    # the synchronous compiled program longer to reach the same fixed point.
    marginals, _ = compiled.iterate({}, n_iterations=300)
    # ssnoise converges to an identical fixed point on both paths.
    assert float(marginals[ssnoise_c].mean) == pytest.approx(dyn_ss, rel=1e-2)
    # On this dataset (tiny per-step increments) the observation-noise
    # precision legitimately diverges on BOTH paths (process noise explains
    # everything): check both are far beyond the prior scale.
    assert float(marginals[obsnoise_c].mean) > 1e4
    assert dyn_obs > 1e4
