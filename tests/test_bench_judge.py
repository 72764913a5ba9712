"""Benchmark regression judge tests (the PkgBenchmark `judge` analogue,
reference `scripts/bench.jl:23-33`): tolerance classification, markdown
report, and an end-to-end run→judge round trip."""

import importlib.util
import json
import pathlib
import sys

import pytest

_JUDGE_PATH = pathlib.Path(__file__).resolve().parents[1] / "benchmarks" / "judge.py"
spec = importlib.util.spec_from_file_location("bench_judge", _JUDGE_PATH)
bench_judge = importlib.util.module_from_spec(spec)
sys.modules["bench_judge"] = bench_judge
spec.loader.exec_module(bench_judge)


def _results(time_s, alloc=1000):
    return {"python": {"bench_a": {"time_s": time_s, "alloc_bytes": alloc}}}


def test_classify_verdicts():
    base = _results(1.0)
    assert bench_judge.classify(_results(1.05), base)[0][3] == "invariant"
    assert bench_judge.classify(_results(1.25), base)[0][3] == "regression"
    assert bench_judge.classify(_results(0.5), base)[0][3] == "improvement"
    # Memory axis: 5% tolerance, independent of time.
    assert bench_judge.classify(_results(1.0, alloc=1100), base)[0][3] == "regression"
    assert bench_judge.classify(_results(1.0, alloc=900), base)[0][3] == "improvement"
    # A time improvement that regresses memory is a regression (worse wins).
    assert bench_judge.classify(_results(0.5, alloc=1100), base)[0][3] == "regression"


def test_markdown_report_counts():
    rows = [
        ("python/a", 1.3, 1.0, "regression"),
        ("python/b", 0.7, 1.0, "improvement"),
        ("native/a", 1.0, 1.0, "invariant"),
    ]
    md = bench_judge.render_markdown(rows, {"tag": "t", "git_rev": "abc"}, {"tag": "b"})
    assert "1 regressions, 1 improvements, 3 total" in md
    assert "| `python/a` | 1.30 | 1.00 | regression" in md


def test_run_and_judge_round_trip(tmp_path, monkeypatch):
    monkeypatch.setattr(bench_judge, "RESULTS_DIR", tmp_path)
    # Tiny synthetic runs (the real measure_suite is exercised separately).
    for tag, t in (("base", 1.0), ("cand", 3.0)):
        (tmp_path / f"{tag}.json").write_text(
            json.dumps({"meta": {"tag": tag, "git_rev": "x"}, "results": _results(t)})
        )
    n_reg = bench_judge.judge(tmp_path / "cand.json", tmp_path / "base.json")
    assert n_reg == 1
    report = (tmp_path / "judge_cand_vs_base.md").read_text()
    assert "regression" in report
    # Self-judgement is clean.
    assert bench_judge.judge(tmp_path / "base.json", tmp_path / "base.json") == 0


def test_measure_suite_smoke():
    out = bench_judge.measure_suite(repeat=1)
    assert set(out) == {"python", "native"}
    for core, benches in out.items():
        assert "dense_update_n100" in benches
        for rec in benches.values():
            assert rec["time_s"] > 0
            assert rec["alloc_bytes"] >= 0
