"""Tests for the call-interface gate (tools/typecheck.py) — the JET
type-analysis analogue (reference: ``test/runtests.jl:108-110`` runs
``JET.test_package`` as a blocking static gate).

Two halves, mirroring tests/test_lint.py's strategy:
1. the real package must produce ZERO findings (the gate itself);
2. seeded synthetic errors in a scratch package must each be DETECTED
   (proves the checker is not vacuously green).
"""

import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

import typecheck  # noqa: E402


def test_package_is_clean():
    findings = typecheck.typecheck([str(REPO / "cortex_tpu")])
    assert findings == [], "\n".join(
        f"{p}:{l}:{c} {code} {msg}" for p, l, c, code, msg in findings
    )


def test_cli_exits_zero():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "typecheck.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


@pytest.fixture()
def scratch_pkg(tmp_path, monkeypatch):
    """A throwaway package the checker treats as the target package."""
    pkg = tmp_path / "tcscratch"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    monkeypatch.setattr(typecheck, "REPO", tmp_path)
    monkeypatch.setattr(typecheck, "PACKAGE", "tcscratch")
    monkeypatch.syspath_prepend(str(tmp_path))
    return pkg


def _run(pkg, source):
    import importlib

    mod = pkg / "seeded.py"
    mod.write_text(textwrap.dedent(source))
    for name in [m for m in sys.modules if m.split(".")[0] == "tcscratch"]:
        del sys.modules[name]
    importlib.invalidate_caches()
    return typecheck.typecheck([str(mod)])


def test_detects_too_many_positional(scratch_pkg):
    findings = _run(
        scratch_pkg,
        """
        def f(a, b=1):
            return a + b

        def g():
            f(1, 2, 3)
        """,
    )
    assert [f[3] for f in findings] == ["call-arity"]
    assert "too many positional" in findings[0][4]


def test_detects_missing_required(scratch_pkg):
    findings = _run(
        scratch_pkg,
        """
        def f(a, b):
            return a + b

        def g():
            f(1)
        """,
    )
    assert [f[3] for f in findings] == ["call-arity"]
    assert "missing a required argument" in findings[0][4]


def test_detects_unknown_keyword(scratch_pkg):
    findings = _run(
        scratch_pkg,
        """
        def f(a, b=1):
            return a + b

        def g():
            f(a=1, bogus=2)
        """,
    )
    assert [f[3] for f in findings] == ["call-kwarg"]
    assert "bogus" in findings[0][4]


def test_detects_class_init_arity(scratch_pkg):
    findings = _run(
        scratch_pkg,
        """
        class C:
            def __init__(self, x):
                self.x = x

        def g():
            C(1, 2)
        """,
    )
    assert [f[3] for f in findings] == ["call-arity"]


def test_detects_self_method_arity(scratch_pkg):
    findings = _run(
        scratch_pkg,
        """
        class C:
            def m(self, x):
                return x

            def caller(self):
                return self.m(1, 2)
        """,
    )
    assert [f[3] for f in findings] == ["call-arity"]
    assert "C.m" in findings[0][4]


def test_detects_bad_annotation(scratch_pkg):
    findings = _run(
        scratch_pkg,
        """
        def h(x: "NoSuchType") -> None:
            pass
        """,
    )
    assert [f[3] for f in findings] == ["bad-annotation"]
    assert "NoSuchType" in findings[0][4]


def test_locally_rebound_names_are_skipped(scratch_pkg):
    # `f` is a parameter in g's scope — the module-level f must NOT be
    # consulted (zero-false-positive stance).
    findings = _run(
        scratch_pkg,
        """
        def f(a, b):
            return a + b

        def g(f):
            return f(1, 2, 3, 4)
        """,
    )
    assert findings == []


def test_shadowed_self_in_nested_function_is_skipped(scratch_pkg):
    # A nested function whose OWN parameter is named `self` must not be
    # resolved through the enclosing class (zero-false-positive stance).
    findings = _run(
        scratch_pkg,
        """
        class C:
            def m(self, x):
                return x

            def caller(self):
                def cb(self):
                    return self.m(1, 2)   # unrelated receiver: skip
                return cb

            def closure_ok(self):
                def cb():
                    return self.m(1, 2)   # method's own self: check
                return cb
        """,
    )
    assert [f[3] for f in findings] == ["call-arity"]
    assert findings[0][1] > 10  # the closure_ok block, not the cb(self) one


def test_star_args_skip_arity(scratch_pkg):
    findings = _run(
        scratch_pkg,
        """
        def f(a, b):
            return a + b

        def g(args, kw):
            f(*args)
            f(**kw)
        """,
    )
    assert findings == []


def test_varkw_callee_absorbs_keywords(scratch_pkg):
    findings = _run(
        scratch_pkg,
        """
        def f(a, **kw):
            return a

        def g():
            f(1, anything=2, goes=3)
        """,
    )
    assert findings == []


def test_staticmethod_and_classmethod(scratch_pkg):
    findings = _run(
        scratch_pkg,
        """
        class C:
            @staticmethod
            def s(x):
                return x

            @classmethod
            def c(cls, x):
                return x

            def caller(self):
                self.s(1)
                self.c(2)
                return self.s(1, 2)
        """,
    )
    assert [f[3] for f in findings] == ["call-arity"]
    assert "C.s" in findings[0][4]
