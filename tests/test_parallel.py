"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cortex_tpu.models import LGSSM
from cortex_tpu.ops import lgssm_smooth_scan
from cortex_tpu.parallel import (
    lgssm_smooth_time_sharded,
    make_mesh,
    replica_sharding,
    shard_replicas,
)


def test_make_mesh_default():
    mesh = make_mesh()
    assert mesh.shape["replica"] == 8


def test_make_mesh_two_axes():
    mesh = make_mesh([("replica", 2), ("time", -1)])
    assert mesh.shape["replica"] == 2
    assert mesh.shape["time"] == 4


def test_make_mesh_errors():
    with pytest.raises(ValueError):
        make_mesh([("a", -1), ("b", -1)])
    with pytest.raises(ValueError):
        make_mesh([("a", 16)])


def test_replica_sharded_smoothing_matches_single_device():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(64, 32)).cumsum(axis=-1))

    model = LGSSM(A=0.95, Q=0.5, H=1.0, R=1.0)
    expected = model.smooth(y)

    mesh = make_mesh()
    y_sharded = shard_replicas(y, mesh)
    assert y_sharded.sharding.spec == P("replica")

    smooth = jax.jit(model.smooth, out_shardings=replica_sharding(mesh))
    result = smooth(y_sharded)
    np.testing.assert_allclose(
        np.asarray(result.mean), np.asarray(expected.mean), rtol=1e-5, atol=1e-5
    )
    # The output stays sharded over replicas.
    assert result.mean.sharding.spec == P("replica")


def test_replica_sharded_free_energy_psum():
    """Cross-replica reduction (log evidence sum) over the mesh."""
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=(32, 16)))
    model = LGSSM()
    mesh = make_mesh()
    y_sharded = shard_replicas(y, mesh)

    total = jax.jit(lambda data: model.log_evidence(data).sum())(y_sharded)
    expected = model.log_evidence(y).sum()
    assert float(total) == pytest.approx(float(expected), rel=1e-5)


@pytest.mark.parametrize("use_prior", [False, True])
def test_time_sharded_smoothing_matches_single_device(use_prior):
    rng = np.random.default_rng(2)
    batch, T = 4, 64
    y = jnp.asarray(rng.normal(size=(batch, T)).cumsum(axis=-1))
    prior = (0.5, 2.0) if use_prior else None

    mesh = make_mesh([("time", 8)])
    result = lgssm_smooth_time_sharded(
        y, A=0.9, Q=0.3, H=1.0, R=1.5, mesh=mesh, prior=prior
    )
    expected = lgssm_smooth_scan(y, A=0.9, Q=0.3, H=1.0, R=1.5, prior=prior)
    np.testing.assert_allclose(
        np.asarray(result.mean), np.asarray(expected.mean), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(result.variance),
        np.asarray(expected.variance),
        rtol=1e-3,
        atol=1e-3,
    )


def test_time_sharded_rejects_ragged_split():
    mesh = make_mesh([("time", 8)])
    with pytest.raises(ValueError):
        lgssm_smooth_time_sharded(jnp.ones((2, 60)), mesh=mesh)


def test_replica_and_time_mesh_combined():
    """2x4 mesh: replicas over one axis, time over the other."""
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(size=(8, 32)).cumsum(axis=-1))
    mesh = make_mesh([("replica", 2), ("time", 4)])

    y_sharded = jax.device_put(y, NamedSharding(mesh, P("replica", "time")))
    result = lgssm_smooth_time_sharded(y_sharded, mesh=mesh)
    expected = lgssm_smooth_scan(y)
    np.testing.assert_allclose(
        np.asarray(result.mean), np.asarray(expected.mean), rtol=1e-3, atol=1e-3
    )


def test_compiled_generic_path_with_sharded_replicas():
    """The generic CompiledInference program runs with replica-sharded
    inputs: jit propagates the sharding through every phase group."""
    from tests.test_compile import BetaBernoulliBatched, make_beta_bernoulli_graph
    from cortex_tpu.compile import CompiledInference

    n, R = 12, 64
    engine, p, o, f = make_beta_bernoulli_graph(n)
    compiled = CompiledInference(engine, [p], BetaBernoulliBatched())
    sources = compiled.schedule.sources

    rng = np.random.default_rng(0)
    data = (rng.random((n, R)) < 0.4).astype(np.float32)

    mesh = make_mesh()
    stacked = jax.device_put(
        jnp.asarray(data), NamedSharding(mesh, P(None, "replica"))
    )

    @jax.jit
    def sweep(arr):
        inputs = {s: arr[i] for i, s in enumerate(sources)}
        marginals, _ = compiled.run(inputs)
        return marginals[p].a, marginals[p].b

    a, b = sweep(stacked)
    np.testing.assert_allclose(np.asarray(a), 1.0 + data.sum(0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b), 1.0 + n - data.sum(0), rtol=1e-6)


def test_global_sum_and_all_converged():
    from cortex_tpu.parallel import all_converged, global_sum

    mesh = make_mesh()
    x = shard_replicas(jnp.arange(64.0), mesh)
    total = global_sum(x, mesh)
    assert float(total) == pytest.approx(float(jnp.arange(64.0).sum()))

    deltas = shard_replicas(jnp.full(64, 1e-8), mesh)
    assert bool(all_converged(deltas, 1e-6, mesh))
    deltas = shard_replicas(jnp.full(64, 1e-8).at[13].set(0.5), mesh)
    assert not bool(all_converged(deltas, 1e-6, mesh))


def test_mv_time_sharded_smoothing_matches_single_device():
    from cortex_tpu.ops.chains_mv import mv_lgssm_smooth
    from cortex_tpu.parallel import mv_lgssm_smooth_time_sharded

    rng = np.random.default_rng(7)
    d, m, B, T = 2, 1, 3, 40
    A = 0.9 * np.eye(d)
    Q = 0.3 * np.eye(d)
    H = rng.normal(size=(m, d))
    R = 0.4 * np.eye(m)
    m0 = np.zeros(d)
    P0 = 2.0 * np.eye(d)
    y = rng.normal(size=(B, T, m)).astype(np.float32)

    mesh = make_mesh([("time", 8)])
    result = mv_lgssm_smooth_time_sharded(
        jnp.asarray(y), jnp.asarray(A, dtype=jnp.float32),
        jnp.asarray(Q, dtype=jnp.float32), jnp.asarray(H, dtype=jnp.float32),
        jnp.asarray(R, dtype=jnp.float32),
        (jnp.asarray(m0, dtype=jnp.float32), jnp.asarray(P0, dtype=jnp.float32)),
        mesh=mesh,
    )
    expected = mv_lgssm_smooth(
        jnp.asarray(y), jnp.asarray(A, dtype=jnp.float32),
        jnp.asarray(Q, dtype=jnp.float32), jnp.asarray(H, dtype=jnp.float32),
        jnp.asarray(R, dtype=jnp.float32),
        (jnp.asarray(m0, dtype=jnp.float32), jnp.asarray(P0, dtype=jnp.float32)),
    )
    np.testing.assert_allclose(
        np.asarray(result.mean), np.asarray(expected.mean), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(result.cov), np.asarray(expected.cov), rtol=2e-3, atol=2e-3
    )


def test_replica_sharded_slds_matches_single_device():
    """The IMM filter's regimes x replicas math is pure SPMD: sharding the
    replica axis must be bit-compatible with the single-device run."""
    from cortex_tpu.models import SLDS

    model = SLDS(
        Pi=jnp.array([[0.95, 0.05], [0.05, 0.95]]),
        A=jnp.array([0.98, 0.98]), Q=jnp.array([0.02, 2.0]),
        H=jnp.array([1.0, 1.0]), R=jnp.array([0.1, 0.1]), prior=(0.0, 1.0),
    )
    _, _, y = model.sample(jax.random.PRNGKey(0), T=40, batch_shape=(64,))
    expected = model.filter(y)

    mesh = make_mesh()
    y_sharded = shard_replicas(jnp.asarray(y), mesh)
    got = jax.jit(model.filter)(y_sharded)
    np.testing.assert_allclose(got.mean, expected.mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        got.regime_probs, expected.regime_probs, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(got.loglik, expected.loglik, rtol=1e-5)


def test_replica_sharded_gabp_matches_single_device():
    from cortex_tpu.ops import gabp_grid_solve

    h, w = 8, 8
    rng = np.random.default_rng(1)
    lam = jnp.asarray(np.full((h, w), 4.0, np.float32))
    eta = jnp.asarray(rng.normal(size=(64, h, w)).astype(np.float32))
    expected = gabp_grid_solve(lam, eta, -0.8, n_iters=60)

    mesh = make_mesh()
    eta_sharded = jax.device_put(eta, NamedSharding(mesh, P("replica", None, None)))
    got = jax.jit(lambda e: gabp_grid_solve(lam, e, -0.8, n_iters=60))(eta_sharded)
    np.testing.assert_allclose(got.mean, expected.mean, rtol=1e-5, atol=1e-6)


def test_vmapped_sharded_hmc_chains():
    """Chains shard over the replica mesh axis — 8 devices, one chain each."""
    from cortex_tpu.ops import hmc_sample

    def logp(x):
        return -0.5 * jnp.sum(x**2)

    keys = jax.random.split(jax.random.PRNGKey(2), 8)
    mesh = make_mesh()
    keys = jax.device_put(keys, NamedSharding(mesh, P("replica", None)))
    run = jax.jit(
        jax.vmap(lambda k: hmc_sample(k, logp, jnp.zeros(3), n_samples=100, n_warmup=100))
    )
    res = run(keys)
    assert res.samples.shape == (8, 100, 3)
    draws = np.asarray(res.samples).reshape(-1, 3)
    np.testing.assert_allclose(draws.mean(axis=0), 0.0, atol=0.15)
    np.testing.assert_allclose(draws.std(axis=0), 1.0, atol=0.15)


@pytest.mark.parametrize("use_prior,n_micro", [(False, None), (True, 2)])
def test_pipelined_smoothing_matches_single_device(use_prior, n_micro):
    from cortex_tpu.parallel import lgssm_smooth_pipelined

    rng = np.random.default_rng(3)
    batch, T = 16, 64
    y = jnp.asarray(
        rng.normal(size=(batch, T)).cumsum(axis=-1), dtype=jnp.float32
    )
    prior = (0.5, 2.0) if use_prior else None

    mesh = make_mesh([("time", 8)])
    result = lgssm_smooth_pipelined(
        y, A=0.9, Q=0.3, H=1.2, R=1.5, mesh=mesh, prior=prior, n_micro=n_micro
    )
    expected = lgssm_smooth_scan(y, A=0.9, Q=0.3, H=1.2, R=1.5, prior=prior)
    np.testing.assert_allclose(
        np.asarray(result.mean), np.asarray(expected.mean), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(result.variance),
        np.asarray(expected.variance),
        rtol=1e-4,
        atol=1e-4,
    )


def test_pipelined_smoothing_handles_missing_observations():
    from cortex_tpu.parallel import lgssm_smooth_pipelined

    rng = np.random.default_rng(4)
    y = rng.normal(size=(8, 32)).cumsum(axis=-1).astype(np.float32)
    y[0, 5:9] = np.nan
    y[3, 0] = np.nan
    y = jnp.asarray(y)

    mesh = make_mesh([("time", 8)])
    result = lgssm_smooth_pipelined(y, A=0.95, Q=0.4, H=1.0, R=1.0, mesh=mesh)
    expected = lgssm_smooth_scan(y, A=0.95, Q=0.4, H=1.0, R=1.0)
    np.testing.assert_allclose(
        np.asarray(result.mean), np.asarray(expected.mean), rtol=1e-4, atol=1e-4
    )


def test_pipelined_smoothing_input_validation():
    from cortex_tpu.parallel import lgssm_smooth_pipelined

    mesh = make_mesh([("time", 8)])
    with pytest.raises(ValueError):  # ragged time split
        lgssm_smooth_pipelined(jnp.ones((8, 60)), mesh=mesh)
    with pytest.raises(ValueError):  # ragged microbatch split
        lgssm_smooth_pipelined(jnp.ones((6, 64)), mesh=mesh)
    with pytest.raises(ValueError):  # needs (batch, T)
        lgssm_smooth_pipelined(jnp.ones(64), mesh=mesh)


def test_mv_time_sharded_component_missing_matches_single_device():
    """missing='component' on the time-sharded mv smoother: per-component
    NaNs (incl. a gap spanning a device boundary and a partial step on
    device 0's first step) must match the single-chip component path."""
    from cortex_tpu.ops.chains_mv import mv_lgssm_smooth
    from cortex_tpu.parallel import mv_lgssm_smooth_time_sharded

    rng = np.random.default_rng(17)
    d = m = 2
    B, T = 3, 40
    A = np.array([[0.9, 0.1], [0.0, 0.85]])
    Q = 0.3 * np.eye(d)
    H = np.array([[1.0, 0.2], [0.0, 1.0]])
    R = np.array([[0.4, 0.1], [0.1, 0.5]])
    m0, P0 = np.zeros(d), 1.5 * np.eye(d)
    y = rng.normal(size=(B, T, m)).cumsum(1).astype(np.float32)
    y[0, 0, 1] = np.nan        # partial on the global FIRST step
    y[1, 4:6] = np.nan         # whole steps inside device 0's block
    y[2, 9:11, 0] = np.nan     # partial run spanning the 5-step boundary
    y[:, 23, 0] = np.nan       # partial step on a later device

    args = tuple(
        jnp.asarray(a, jnp.float32) for a in (A, Q, H, R)
    )
    prior = (jnp.asarray(m0, jnp.float32), jnp.asarray(P0, jnp.float32))
    mesh = make_mesh([("time", 8)])
    result = mv_lgssm_smooth_time_sharded(
        jnp.asarray(y), *args, prior, mesh=mesh, missing="component"
    )
    expected = mv_lgssm_smooth(
        jnp.asarray(y), *args, prior, component_missing=True
    )
    np.testing.assert_allclose(
        np.asarray(result.mean), np.asarray(expected.mean),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(result.cov), np.asarray(expected.cov),
        rtol=5e-3, atol=2e-3,
    )
    with pytest.raises(ValueError, match="missing"):
        mv_lgssm_smooth_time_sharded(
            jnp.asarray(y), *args, prior, mesh=mesh, missing="bogus"
        )
