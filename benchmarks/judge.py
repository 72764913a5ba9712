"""Benchmark regression judge — the PkgBenchmark ``judge`` analogue.

The reference compares a target commit's benchmark suite against a baseline
branch with a 10% time / 5% memory tolerance and writes a markdown report
(``/root/reference/scripts/bench.jl:23-33``, ``Makefile`` benchmark targets).
This gives the same workflow for the signal-core suite:

    python benchmarks/judge.py run --tag before          # save a baseline
    ... make changes ...
    python benchmarks/judge.py run --tag after
    python benchmarks/judge.py judge after before        # report + exit code

Measurements: best-of-N wall time per benchmark plus Python-side peak
allocations (``tracemalloc``) — the allocation axis of the reference's
``memory`` judging.  Reports land in ``benchmarks/results/`` as markdown;
``judge`` exits 1 when any benchmark regresses beyond tolerance, so it can
gate CI exactly like the reference's ``judge`` target.
"""

from __future__ import annotations

import argparse
import gc
import json
import pathlib
import subprocess
import sys
import time
import tracemalloc

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

RESULTS_DIR = pathlib.Path(__file__).resolve().parent / "results"
TIME_TOL = 0.10  # reference: judge(...; time_tolerance = 0.1)
MEM_TOL = 0.05  # reference: judge(...; memory_tolerance = 0.05)


def _best_time(fn, repeat: int) -> float:
    """Best-of-``repeat`` per-call time with a calibrated inner loop (~1 ms
    per sample) — the BenchmarkTools-style sampling the reference's judge
    relies on; single µs-scale calls are noise-dominated otherwise."""
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    inner = max(1, min(20_000, int(3e-3 / max(dt, 1e-9))))
    best = float("inf")
    gc.collect()
    gc.disable()  # GC pauses otherwise dominate µs-scale samples
    try:
        for _ in range(repeat):
            t0 = time.perf_counter()
            for _ in range(inner):
                fn()
            best = min(best, (time.perf_counter() - t0) / inner)
            gc.enable()
            gc.collect()
            gc.disable()
    finally:
        gc.enable()
    return best


def _alloc_bytes(fn) -> int:
    """Min-of-3 peak traced allocation — min because stray GC-retained
    garbage inflates individual samples, never deflates them."""
    peaks = []
    for _ in range(3):
        gc.collect()
        tracemalloc.start()
        try:
            fn()
            _, peak = tracemalloc.get_traced_memory()
        finally:
            tracemalloc.stop()
        peaks.append(int(peak))
    return min(peaks)


def measure_suite(repeat: int = 9) -> dict:
    """Run the signal-core suite on both cores; returns
    ``{core: {benchmark: {time_s, alloc_bytes}}}``."""
    from signal_bench import suite

    from cortex_tpu import Signal
    from cortex_tpu.native import NativeSignalEngine

    out = {}
    for core, create in (
        ("python", Signal),
        ("native", NativeSignalEngine().create_signal),
    ):
        cases = suite(create)
        out[core] = {
            name: {
                "time_s": _best_time(fn, repeat=repeat),
                "alloc_bytes": _alloc_bytes(fn),
            }
            for name, fn in cases.items()
        }
    return out


def run(tag: str, repeat: int = 5) -> pathlib.Path:
    """Measure the suite and persist results under ``benchmarks/results/``."""
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            cwd=pathlib.Path(__file__).resolve().parent,
        ).stdout.strip()
    except OSError:
        rev = "unknown"
    payload = {
        "meta": {"tag": tag, "git_rev": rev, "unix_time": time.time()},
        "results": measure_suite(repeat=repeat),
    }
    RESULTS_DIR.mkdir(exist_ok=True)
    path = RESULTS_DIR / f"{tag}.json"
    path.write_text(json.dumps(payload, indent=1))
    return path


def classify(
    target: dict, baseline: dict, time_tol: float = TIME_TOL, mem_tol: float = MEM_TOL
) -> list:
    """Compare two ``{core: {bench: {time_s, alloc_bytes}}}`` result dicts.

    Returns rows ``(id, time_ratio, mem_ratio, verdict)`` where the verdict
    is ``regression`` / ``improvement`` / ``invariant`` using the reference's
    tolerance semantics (a benchmark regresses if either axis worsens beyond
    its tolerance; improves if either improves beyond tolerance without the
    other regressing)."""
    rows = []
    for core in sorted(set(target) & set(baseline)):
        for name in sorted(set(target[core]) & set(baseline[core])):
            t, b = target[core][name], baseline[core][name]
            tr = t["time_s"] / b["time_s"] if b["time_s"] > 0 else float("inf")
            base_alloc = b.get("alloc_bytes", 0)
            t_alloc = t.get("alloc_bytes", 0)
            if base_alloc > 0:
                mr = t_alloc / base_alloc
            else:
                # Zero baseline: any new allocation is an infinite-ratio
                # regression (mirrors the time axis), none stays invariant.
                mr = 1.0 if t_alloc == 0 else float("inf")
            worse = tr > 1.0 + time_tol or mr > 1.0 + mem_tol
            better = tr < 1.0 - time_tol or mr < 1.0 - mem_tol
            verdict = (
                "regression" if worse else "improvement" if better else "invariant"
            )
            rows.append((f"{core}/{name}", tr, mr, verdict))
    return rows


def render_markdown(
    rows: list,
    target_meta: dict,
    baseline_meta: dict,
    time_tol: float = TIME_TOL,
    mem_tol: float = MEM_TOL,
) -> str:
    """PkgBenchmark-style judgement report."""
    lines = [
        "# Benchmark judgement",
        "",
        f"Target: `{target_meta.get('tag', '?')}` @ {target_meta.get('git_rev', '?')}  ",
        f"Baseline: `{baseline_meta.get('tag', '?')}` @ {baseline_meta.get('git_rev', '?')}  ",
        f"Tolerances: time {time_tol:.0%}, memory {mem_tol:.0%}",
        "",
        "| ID | time ratio | memory ratio | verdict |",
        "|---|---|---|---|",
    ]
    for bid, tr, mr, verdict in rows:
        mark = {"regression": ":x:", "improvement": ":white_check_mark:", "invariant": ""}[verdict]
        lines.append(f"| `{bid}` | {tr:.2f} | {mr:.2f} | {verdict} {mark} |")
    n_reg = sum(1 for r in rows if r[3] == "regression")
    n_imp = sum(1 for r in rows if r[3] == "improvement")
    lines += ["", f"**{n_reg} regressions, {n_imp} improvements, {len(rows)} total.**", ""]
    return "\n".join(lines)


def judge(
    target_path: pathlib.Path,
    baseline_path: pathlib.Path,
    time_tol: float = TIME_TOL,
    mem_tol: float = MEM_TOL,
) -> int:
    """Judge two saved runs; writes the markdown report and returns the
    number of regressions (the CLI exit code)."""
    target = json.loads(pathlib.Path(target_path).read_text())
    baseline = json.loads(pathlib.Path(baseline_path).read_text())
    rows = classify(target["results"], baseline["results"], time_tol, mem_tol)
    report = render_markdown(
        rows, target.get("meta", {}), baseline.get("meta", {}), time_tol, mem_tol
    )
    RESULTS_DIR.mkdir(exist_ok=True)
    out = RESULTS_DIR / (
        f"judge_{target.get('meta', {}).get('tag', 'target')}"
        f"_vs_{baseline.get('meta', {}).get('tag', 'baseline')}.md"
    )
    out.write_text(report)
    print(report)
    print(f"report: {out}")
    return sum(1 for r in rows if r[3] == "regression")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pr = sub.add_parser("run", help="measure the suite and save results")
    pr.add_argument("--tag", default="current")
    pr.add_argument("--repeat", type=int, default=9)
    pj = sub.add_parser("judge", help="compare two saved runs")
    pj.add_argument("target", help="tag or path of the candidate run")
    pj.add_argument("baseline", help="tag or path of the baseline run")
    pj.add_argument("--time-tol", type=float, default=TIME_TOL)
    pj.add_argument("--mem-tol", type=float, default=MEM_TOL)
    args = p.parse_args(argv)

    if args.cmd == "run":
        path = run(args.tag, repeat=args.repeat)
        print(f"saved: {path}")
        return 0
    resolve = lambda s: pathlib.Path(s) if s.endswith(".json") else RESULTS_DIR / f"{s}.json"
    return judge(resolve(args.target), resolve(args.baseline), args.time_tol, args.mem_tol)


if __name__ == "__main__":
    raise SystemExit(main())
