"""Signal-core microbenchmarks — parity with the reference's benchmark suite
(``/root/reference/benchmark/src/signal_benchmarks.jl``): signal creation,
set_value, get_value, is_pending at n ∈ {10, 100, 1000}, and the dense
all-to-all network (build n²-dependency graph; set all values + pending
check).  Runs both the Python and the native C++ signal cores.

Usage: python benchmarks/signal_bench.py
"""

import time

from cortex_tpu import Signal
from cortex_tpu.native import NativeSignalEngine


def timeit(fn, repeat=5):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def suite(create, sizes=(10, 100, 1000), dense_sizes=(10, 100)):
    """The benchmark suite as ``{name: closure}`` — consumed both by
    :func:`bench_core` (timings) and by ``benchmarks/judge.py`` (regression
    judging with time + allocation measurements)."""
    cases = {}
    for n in sizes:
        cases[f"create_n{n}"] = lambda n=n: [create() for _ in range(n)]

        sigs = [create() for _ in range(n)]
        cases[f"set_value_no_listeners_n{n}"] = lambda sigs=sigs: [
            s.set_value(1) for s in sigs
        ]
        cases[f"get_value_n{n}"] = lambda sigs=sigs: [s.get_value() for s in sigs]
        cases[f"is_computed_n{n}"] = lambda sigs=sigs: [
            s.is_computed() for s in sigs
        ]
        cases[f"is_pending_n{n}"] = lambda sigs=sigs: [
            s.is_pending() for s in sigs
        ]

    # Dense all-to-all network (reference :71-103): n sources fan out to n
    # sinks; set all values, check all pendings.
    for n in dense_sizes:
        def build(n=n):
            sources = [create() for _ in range(n)]
            sinks = [create() for _ in range(n)]
            for snk in sinks:
                for src in sources:
                    snk.add_dependency(src)
            return sources, sinks

        cases[f"dense_build_n{n}"] = build

        def build_bulk(n=n):
            sources = [create() for _ in range(n)]
            sinks = [create() for _ in range(n)]
            for snk in sinks:
                snk.add_dependencies(sources)
            return sources, sinks

        cases[f"dense_build_bulk_n{n}"] = build_bulk
        sources, sinks = build()

        def update(sources=sources, sinks=sinks):
            for s in sources:
                s.set_value(1)
            return sum(1 for s in sinks if s.is_pending())

        cases[f"dense_update_n{n}"] = update
    return cases


def bench_core(create):
    return {name: timeit(fn) for name, fn in suite(create).items()}


def main():
    ns = NativeSignalEngine()
    py = bench_core(Signal)
    nat = bench_core(ns.create_signal)
    rows = []
    for key in py:
        speedup = py[key] / nat[key] if nat[key] > 0 else float("inf")
        rows.append((key, py[key] * 1e6, nat[key] * 1e6, speedup))
    width = max(len(k) for k, *_ in rows)
    print(f"{'benchmark':<{width}}  {'python(us)':>12} {'native(us)':>12} {'speedup':>8}")
    for key, p, n, s in rows:
        print(f"{key:<{width}}  {p:>12.1f} {n:>12.1f} {s:>7.1f}x")


if __name__ == "__main__":
    main()
