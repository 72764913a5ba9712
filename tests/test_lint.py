"""The static-analysis gate as a blocking test — the analogue of the
reference running ``Aqua.test_all`` + ``JET.test_package`` inside its test
suite (``/root/reference/test/runtests.jl:103-110``).

Two halves:
1. the whole package (+ bench/tools/entry scripts) must lint clean;
2. the linter must actually DETECT seeded defects (a gate that can't fail
   is no gate).
"""

import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import lint as lintmod  # noqa: E402


def _lint_source(tmp_path, source):
    f = tmp_path / "mod.py"
    f.write_text(textwrap.dedent(source))
    return lintmod.check_file(f)


def test_package_lints_clean():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "lint.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, f"lint findings:\n{proc.stdout}"


def test_detects_undefined_name(tmp_path):
    findings = _lint_source(
        tmp_path,
        """
        def f(x):
            return x + undefined_thing
        """,
    )
    assert any(c == "F821" and "undefined_thing" in m for *_, c, m in findings)


def test_detects_typo_in_method_scope(tmp_path):
    findings = _lint_source(
        tmp_path,
        """
        import math

        class A:
            def g(self, items):
                return [math.sqrt(i) for i in itmes]
        """,
    )
    assert any("itmes" in m for *_, c, m in findings)


def test_class_scope_invisible_to_nested_functions(tmp_path):
    # Real Python scoping: methods can't see class-body names directly.
    findings = _lint_source(
        tmp_path,
        """
        class A:
            SCALE = 2

            def f(self):
                return SCALE
        """,
    )
    assert any(c == "F821" and "SCALE" in m for *_, c, m in findings)


def test_no_false_positives_on_real_idioms(tmp_path):
    findings = _lint_source(
        tmp_path,
        """
        from __future__ import annotations

        import functools
        from typing import List

        GLOBAL = 1

        def outer(a, b=GLOBAL):
            total = 0

            def inner(x: List[int]) -> int:
                nonlocal total
                total += sum(x)
                return total

            ys = [inner([i]) for i in range(a) if (w := i) > 0]
            try:
                pass
            except ValueError as exc:
                print(exc)
            lam = lambda q: q + a + w
            return functools.reduce(lambda u, v: u + v, ys, lam(b))

        class C:
            attr = GLOBAL

            def m(self) -> "C":
                return type(self).mro() and self
        """,
    )
    assert findings == [], findings


def test_detects_unused_import_and_bad_all(tmp_path):
    findings = _lint_source(
        tmp_path,
        """
        import os
        import sys

        __all__ = ["helper", "helper", "missing"]

        def helper():
            return sys.argv
        """,
    )
    codes = {c for *_, c, _ in findings}
    assert "F401" in codes  # unused 'os'
    assert "F822" in codes  # 'missing' not defined
    assert "F822D" in codes  # duplicate entry


def test_noqa_suppresses(tmp_path):
    findings = _lint_source(
        tmp_path,
        """
        import os  # noqa: F401
        from collections import *  # noqa
        """,
    )
    assert findings == [], findings


# ---------------------------------------------------------------------------
# Formatting gate (tools/format.py) — the JuliaFormatter analogue
# (/root/reference/Makefile `format`, scripts/formatter.jl:1-10).

import format as formatmod  # noqa: E402


def test_package_formats_clean():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "format.py")],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_format_detects_seeded_violations(tmp_path):
    f = tmp_path / "bad.py"
    f.write_text(
        "import cortex_tpu\nimport os\nx = 1  \ny = '"
        + "a" * 120
        + "'\nif x:\n\tz = 2\n\n"
    )
    codes = {code for *_, code, _ in formatmod.check_file(f)}
    assert "import-order" in codes
    assert "trailing-ws" in codes
    assert "long-line" in codes
    assert "tab-indent" in codes
    assert "eof-newline" in codes


def test_format_clean_source_passes(tmp_path):
    f = tmp_path / "good.py"
    f.write_text(
        "import os\n\nimport numpy\n\nfrom cortex_tpu import dists\n\n"
        "x = (os, numpy, dists)\n"
    )
    assert formatmod.check_file(f) == []
