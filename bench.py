"""Benchmark: message-update throughput on a 10k-replica LGSSM smoothing sweep.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.md): message updates/sec/chip on a 10k-replica,
T=100 LGSSM Belief-Propagation smoothing sweep.  One sweep computes, per
replica, (T-1) forward messages + (T-1) backward messages + T marginals =
3T-2 signal updates — the same accounting as the reference's dynamic engine
executions for one `update_marginals!` pass over the chain.

Methodology (v2 — honest device time on the remote-tunnel TPU): per-call
``block_until_ready`` on this tunnel acks enqueue in ~80us regardless of the
work submitted, and a value fetch costs a ~24ms RPC — both useless as op
timers.  So each path is timed as K smoothing sweeps serialized inside ONE
jitted ``fori_loop`` (each iteration's input is perturbed by the previous
iteration's reduced output, forcing serial execution and defeating the
remote execution cache), fetching one scalar at the end; device time per
sweep = total/K with the RPC constant amortized to <1%.  Inputs are salted
with wall-clock time so repeated bench runs can never hit a cached result.

Roofline: a matched-traffic probe (read the (R,T) input once, write two
(R,T) outputs — exactly the smoother's HBM footprint) timed identically is
the denominator; ``pct_roofline`` = probe_time / path_time.

Paths measured:
- ``matmul``  — MXU lowering: the smoother is affine in y (ops/chains.py
  ``lgssm_smooth_matmul``), one (R,T)x(T,T) matmul at Precision.HIGHEST.
- ``scan``    — two batched ``lax.scan`` passes (ops/chains.py).
- ``pallas``  — fused VMEM-resident kernel (ops/pallas_kernels.py).
- ``generic`` — the actual factor-graph path: ``CompiledInference`` over the
  T=100 chain graph with chain lowering (compile/lowering.py), replica-
  batched; proves the framework's generic compiler reaches hand-written
  performance (VERDICT r1 item 1).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is the reference *architecture* — a dynamic per-signal reactive
engine (our reference-faithful Python implementation, measured on the same
machine, same model family) — giving the speedup of the compiled TPU dataflow
path over per-edge dynamic message passing.
"""

import json
import sys
import time

import numpy as np

T = 100


def _serial_sweep_time(fn, y0, K):
    """Device seconds per fn(y)-sweep: K serialized sweeps in one call."""
    import jax
    from jax import lax

    @jax.jit
    def g(s):
        def body(i, acc):
            out = fn(y0 + (s + acc * 1e-30))
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(x.sum() for x in leaves) * 1e-30

        return lax.fori_loop(0, K, body, jax.numpy.float32(0.0))

    salt = float(time.time_ns() % 100_000) / 1000.0
    float(g(salt))  # compile + warm
    t0 = time.perf_counter()
    float(g(salt + 0.5))
    return (time.perf_counter() - t0) / K


def _make_data(R):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(int(time.time_ns()) % (2**31))
    y0 = jnp.cumsum(jax.random.normal(key, (R, T), jnp.float32), -1)
    return jax.block_until_ready(y0)


def bench_paths(R, K):
    """Sweep seconds per path at R replicas (+ matched-traffic probe)."""
    import jax.numpy as jnp

    from cortex_tpu.models import LGSSM
    from cortex_tpu.ops import lgssm_smooth_matmul, lgssm_smoother_operator
    from cortex_tpu.ops.pallas_kernels import lgssm_smooth_pallas

    model = LGSSM(A=1.0, Q=1.0, H=1.0, R=1.0)
    op = lgssm_smoother_operator(T)
    y0 = _make_data(R)
    paths = {
        "matmul": lambda y: lgssm_smooth_matmul(y, operator=op),
        "scan": lambda y: model.smooth(y, method="scan"),
        "pallas": lambda y: lgssm_smooth_pallas(y, tile=2048),
        "probe": lambda y: (y * 1.000001, y + 0.5),
    }
    return {name: _serial_sweep_time(fn, y0, K) for name, fn in paths.items()}


def bench_generic_compiled(R, K):
    """The factor-graph path: CompiledInference over the T=100 chain graph
    (chain lowering rerolls the schedule into one lax.scan), replica-batched."""
    import jax.numpy as jnp

    sys.path.insert(0, "tests")
    from test_compile import LGSSMChainBatched, make_chain_graph

    from cortex_tpu.compile import CompiledInference

    engine, x, y, likelihood = make_chain_graph(T)
    compiled = CompiledInference(engine, x, LGSSMChainBatched())
    sources = compiled.schedule.sources
    y0 = _make_data(R)

    def fn(data):
        # data: (R, T); feed column t to source signal t (source order is
        # the chain's observation order by construction of make_chain_graph).
        inputs = {s: data[:, i] for i, s in enumerate(sources)}
        marginals, _ = compiled.run(inputs)
        return [marginals[xi].mean for xi in x] + [
            marginals[xi].variance for xi in x
        ]

    lowered = bool(compiled.plan is not None and compiled.plan.scan_segments)
    return _serial_sweep_time(fn, y0, K), lowered


def bench_dynamic_engine(T=100, sweeps=3):
    """Reference-architecture baseline: dynamic reactive engine on one chain."""
    sys.path.insert(0, "tests")
    from test_inference_engine import make_ssm_model

    times = []
    for _ in range(sweeps):
        engine, x, y, likelihood, transition = make_ssm_model(T)
        rng = np.random.default_rng(1)
        data = rng.normal(size=T).cumsum()
        for i in range(T):
            engine.get_message_to_factor(y[i], likelihood[i]).set_value(
                float(data[i])
            )
        t0 = time.perf_counter()
        engine.update_marginals(x)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    updates_per_sweep = 3 * T - 2
    return updates_per_sweep / dt


def main():
    replicas = 10_000
    primary = bench_paths(replicas, K=400)
    scale = bench_paths(100_000, K=100)
    generic_dt, generic_lowered = bench_generic_compiled(replicas, K=200)

    probe = primary.pop("probe")
    probe_100k = scale.pop("probe")
    best = min(primary, key=primary.get)
    dt = primary[best]
    updates_per_sweep = replicas * (3 * T - 2)
    updates_per_s = updates_per_sweep / dt
    baseline_updates_per_s = bench_dynamic_engine(T)

    bytes_per_sweep = 3 * replicas * T * 4  # read y once, write mean+var
    result = {
        "metric": "lgssm_10k_replica_message_updates_per_sec_per_chip",
        "value": round(updates_per_s, 1),
        "unit": "msg_updates/s",
        "vs_baseline": round(updates_per_s / baseline_updates_per_s, 2),
        "detail": {
            "replicas": replicas,
            "T": T,
            "best_path": best,
            "sweeps_per_sec": round(1.0 / dt, 2),
            "sweep_device_us": {k: round(v * 1e6, 1) for k, v in primary.items()},
            "sweep_device_us_100k_replicas": {
                k: round(v * 1e6, 1) for k, v in scale.items()
            },
            "msg_updates_per_s_100k_replicas": round(
                100_000 * (3 * T - 2) / min(scale.values()), 1
            ),
            "roofline": {
                "bytes_per_sweep": bytes_per_sweep,
                "matched_traffic_probe_us": round(probe * 1e6, 1),
                "probe_GBps": round(bytes_per_sweep / probe / 1e9, 1),
                "pct_roofline_best": round(100.0 * probe / dt, 1),
                "probe_us_100k": round(probe_100k * 1e6, 1),
                "pct_roofline_best_100k": round(
                    100.0 * probe_100k / min(scale.values()), 1
                ),
            },
            "generic_path": {
                "sweep_device_us": round(generic_dt * 1e6, 1),
                "chain_lowered_to_scan": generic_lowered,
                "ratio_vs_best_handwritten": round(generic_dt / dt, 2),
            },
            "methodology": "K serialized sweeps per jit call (fori_loop, "
            "output-fed), time-salted inputs, scalar fetch; amortizes the "
            "~80us enqueue-ack and ~24ms fetch RPC of the remote TPU tunnel",
            "baseline": "dynamic per-signal reactive engine (reference architecture), msg_updates/s",
            "baseline_value": round(baseline_updates_per_s, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
