"""Generic-compiler throughput: a 100-observation Beta-Bernoulli star with
10k replicas through CompiledInference, fully jitted.

Measures how close the *generic* schedule executor (gather/stack phases over
an arbitrary factor graph) gets to the hand-written model-zoo paths: the
whole sweep — 100-message batched rule, log-depth segment-tree product
phases, marginal — compiles into one XLA program over (n_obs, replicas)
arrays.

Usage: python benchmarks/compiled_bench.py [n_obs] [replicas]
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cortex_tpu import (
        BipartiteFactorGraph,
        Connection,
        Factor,
        InferenceEngine,
        Variable,
    )
    from cortex_tpu.compile import BatchedProcessor, CompiledInference
    from cortex_tpu.dists import Beta

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    g = BipartiteFactorGraph()
    p = g.add_variable(Variable(name="p"))
    for i in range(n):
        o = g.add_variable(Variable(name="o", index=(i,)))
        f = g.add_factor(Factor(functional_form="bernoulli"))
        g.add_edge(p, f, Connection(label="out"))
        g.add_edge(o, f, Connection(label="out"))
    engine = InferenceEngine(model_engine=g)

    class Rules(BatchedProcessor):
        def compute_message_to_variable(self, engine, variants, dep_values):
            y = dep_values[0]
            return Beta(1.0 + y, 2.0 - y)

    compiled = CompiledInference(engine, [p], Rules())
    sources = compiled.schedule.sources

    @jax.jit
    def sweep(stacked):
        inputs = {s: stacked[i] for i, s in enumerate(sources)}
        marginals, _ = compiled.run(inputs)
        return marginals[p].a, marginals[p].b

    rng = np.random.default_rng(0)
    data = jnp.asarray((rng.random((n, R)) < 0.5).astype(np.float32))
    jax.block_until_ready(sweep(data))

    # Distinct buffers defeat remote execution caching.
    datasets = [data * (1.0 + 1e-6 * i) for i in range(10)]
    jax.block_until_ready(datasets)
    ts = []
    for d in datasets:
        t0 = time.perf_counter()
        jax.block_until_ready(sweep(d))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))

    n_steps = compiled.schedule.num_steps
    print(
        json.dumps(
            {
                "metric": "compiled_star_graph_sweep",
                "n_obs": n,
                "replicas": R,
                "schedule_steps": n_steps,
                "phases": len(compiled.schedule.phases),
                "sweep_wall_us": round(dt * 1e6, 1),
                "signal_updates_per_s": round(n_steps * R / dt, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
