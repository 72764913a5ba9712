"""Static-analysis gate for cortex_tpu — the Aqua/JET analogue.

The reference runs two blocking static gates before its test suite:
``Aqua.test_all`` (project hygiene) and ``JET.test_package`` (static
type/undefined-binding analysis) — ``/root/reference/test/runtests.jl:103-110``.
This image ships no ruff/mypy/pyflakes and installing packages is forbidden,
so this module implements the equivalent checks directly on the ``ast``:

JET analogue (catches typos / unbound names before any test runs):
  * **undefined-name** — every ``Name(Load)`` / ``Name(Del)`` must resolve in
    the lexical scope chain (function scopes see enclosing functions + module,
    NOT enclosing class bodies — real Python scoping), against builtins, or
    against explicit ``global``/``nonlocal`` declarations.  Python names are
    function-scoped, so binding anywhere in the scope counts (no
    possibly-unbound flow analysis — zero false positives from branches).

Aqua analogue (project hygiene):
  * **unused-import**    — imported name never loaded; names in ``__all__``
    and ``import x as x`` re-exports are uses.
  * **bad-all**          — ``__all__`` entry that is not defined in the module.
  * **duplicate-all**    — repeated ``__all__`` entry.
  * **star-import**      — ``from m import *`` (defeats static resolution).

Run: ``python tools/lint.py [paths...]`` — exits non-zero with one
``path:line:col code message`` finding per line.  Gated by ``make lint`` and
``tests/test_lint.py`` (which also seeds synthetic errors to prove detection).
"""

from __future__ import annotations

import ast
import builtins
import sys
from pathlib import Path
from typing import Iterator, List, Optional, Set, Tuple

BUILTINS: Set[str] = set(dir(builtins)) | {
    "__file__",
    "__name__",
    "__doc__",
    "__package__",
    "__spec__",
    "__loader__",
    "__builtins__",
    "__debug__",
    "__annotations__",
    "__dict__",
    "__path__",
    # implicit in class bodies / methods
    "__module__",
    "__qualname__",
    "__class__",
}

Finding = Tuple[str, int, int, str, str]  # path, line, col, code, message


class Scope:
    __slots__ = ("node", "bindings", "globals", "nonlocals", "is_class")

    def __init__(self, node: Optional[ast.AST], is_class: bool = False) -> None:
        self.node = node
        self.bindings: Set[str] = set()
        self.globals: Set[str] = set()
        self.nonlocals: Set[str] = set()
        self.is_class = is_class


def _collect_bindings(body: List[ast.stmt], scope: Scope) -> None:
    """All names bound anywhere directly in this scope (not nested scopes)."""
    for stmt in body:
        for node in _shallow_walk(stmt):
            _bind_node(node, scope)


_SCOPE_NODES = (
    ast.FunctionDef,
    ast.AsyncFunctionDef,
    ast.ClassDef,
    ast.Lambda,
    ast.ListComp,
    ast.SetComp,
    ast.DictComp,
    ast.GeneratorExp,
)


def _shallow_walk(node: ast.AST) -> Iterator[ast.AST]:
    """Walk the statement tree WITHOUT descending into nested scopes
    (functions/classes/lambdas); comprehension targets bind their own scope.
    A scope-introducing node yields itself (its NAME binds in the enclosing
    scope) but its interior is never entered — even when it is the top node."""
    yield node
    if isinstance(node, _SCOPE_NODES):
        return
    for child in ast.iter_child_nodes(node):
        if isinstance(child, _SCOPE_NODES):
            yield child
            continue
        yield from _shallow_walk(child)


def _bind_node(node: ast.AST, scope: Scope) -> None:
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        scope.bindings.add(node.name)
    elif isinstance(node, ast.Name) and isinstance(node.ctx, (ast.Store, ast.Del)):
        scope.bindings.add(node.id)
    elif isinstance(node, ast.alias):
        name = node.asname or node.name.split(".")[0]
        scope.bindings.add(name)
    elif isinstance(node, ast.ExceptHandler) and node.name:
        scope.bindings.add(node.name)
    elif isinstance(node, ast.Global):
        scope.globals.update(node.names)
    elif isinstance(node, ast.Nonlocal):
        scope.nonlocals.update(node.names)
        scope.bindings.update(node.names)
    elif isinstance(node, ast.MatchAs) and node.name:
        scope.bindings.add(node.name)
    elif isinstance(node, ast.MatchStar) and node.name:
        scope.bindings.add(node.name)
    elif isinstance(node, ast.MatchMapping) and node.rest:
        scope.bindings.add(node.rest)


class Checker(ast.NodeVisitor):
    def __init__(self, path: str, tree: ast.Module) -> None:
        self.path = path
        self.findings: List[Finding] = []
        self.module_scope = Scope(tree)
        _collect_bindings(tree.body, self.module_scope)
        self.stack: List[Scope] = [self.module_scope]
        self.loads: Set[str] = set()  # module-level "used" names (for imports)
        self.star_import = False

    # -- helpers -----------------------------------------------------------

    def _err(self, node: ast.AST, code: str, msg: str) -> None:
        self.findings.append(
            (self.path, node.lineno, node.col_offset, code, msg)
        )

    def _resolves(self, name: str) -> bool:
        top = self.stack[-1]
        if name in top.globals:
            return name in self.module_scope.bindings or name in BUILTINS
        # lexical chain: current scope, then enclosing FUNCTION scopes
        # (class bodies are invisible to nested scopes), then module.
        for i, scope in enumerate(reversed(self.stack)):
            if i > 0 and scope.is_class:
                continue
            if name in scope.bindings:
                return True
        return name in BUILTINS or self.star_import

    def _enter(self, node: ast.AST, body: List[ast.stmt], is_class: bool = False,
               params: Optional[List[str]] = None) -> Scope:
        scope = Scope(node, is_class)
        if params:
            scope.bindings.update(params)
        _collect_bindings(body, scope)
        self.stack.append(scope)
        return scope

    # -- scope-introducing nodes --------------------------------------------

    def _visit_function(self, node) -> None:
        args = node.args
        all_args = (
            list(args.posonlyargs) + list(args.args) + list(args.kwonlyargs)
            + ([args.vararg] if args.vararg else [])
            + ([args.kwarg] if args.kwarg else [])
        )
        params = [a.arg for a in all_args]
        # defaults/annotations/decorators evaluate in the ENCLOSING scope
        for d in list(args.defaults) + [d for d in args.kw_defaults if d]:
            self.visit(d)
        for dec in getattr(node, "decorator_list", []):
            self.visit(dec)
        for a in all_args:
            if a.annotation:
                self.visit(a.annotation)
        if getattr(node, "returns", None):
            self.visit(node.returns)
        if isinstance(node, ast.Lambda):
            self._enter(node, [], params=params)
            self.visit(node.body)
        else:
            self._enter(node, node.body, params=params)
            for stmt in node.body:
                self.visit(stmt)
        self.stack.pop()

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        self._visit_function(node)

    def visit_AsyncFunctionDef(self, node: ast.AsyncFunctionDef) -> None:
        self._visit_function(node)

    def visit_Lambda(self, node: ast.Lambda) -> None:
        self._visit_function(node)

    def visit_ClassDef(self, node: ast.ClassDef) -> None:
        for dec in node.decorator_list:
            self.visit(dec)
        for base in node.bases:
            self.visit(base)
        for kw in node.keywords:
            self.visit(kw.value)
        self._enter(node, node.body, is_class=True)
        for stmt in node.body:
            self.visit(stmt)
        self.stack.pop()

    def _visit_comprehension(self, node, exprs: List[ast.expr]) -> None:
        # first iterable evaluates in the enclosing scope
        gens = node.generators
        self.visit(gens[0].iter)
        scope = self._enter(node, [])
        for gen in gens:
            for target in _shallow_walk(gen.target):
                _bind_node(target, scope)
        for i, gen in enumerate(gens):
            if i > 0:
                self.visit(gen.iter)
            for cond in gen.ifs:
                self.visit(cond)
        for e in exprs:
            self.visit(e)
        self.stack.pop()

    def visit_ListComp(self, node): self._visit_comprehension(node, [node.elt])
    def visit_SetComp(self, node): self._visit_comprehension(node, [node.elt])
    def visit_GeneratorExp(self, node): self._visit_comprehension(node, [node.elt])
    def visit_DictComp(self, node):
        self._visit_comprehension(node, [node.key, node.value])

    # -- leaf checks ---------------------------------------------------------

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            if len(self.stack) == 1 or node.id in self.module_scope.bindings:
                self.loads.add(node.id)
            if not self._resolves(node.id):
                self._err(node, "F821", f"undefined name '{node.id}'")
        elif isinstance(node.ctx, ast.Store) and isinstance(
            self.stack[-1].node, ast.Module
        ):
            pass
        self.generic_visit(node)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.generic_visit(node)

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        for alias in node.names:
            if alias.name == "*":
                self.star_import = True
                if node.module != "__future__":
                    self._err(node, "F403", f"star import from '{node.module}'")
        self.generic_visit(node)

    # walrus inside comprehensions binds in the enclosing function scope; our
    # per-scope pre-pass already collected it via _shallow_walk on statements,
    # but comprehension bodies are visited in their own scope — bind it there.
    def visit_NamedExpr(self, node: ast.NamedExpr) -> None:
        if isinstance(node.target, ast.Name):
            for scope in reversed(self.stack):
                scope.bindings.add(node.target.id)
                if not scope.is_class and not isinstance(
                    scope.node,
                    (ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp),
                ):
                    break
        self.visit(node.value)


def _all_entries(tree: ast.Module) -> List[ast.Constant]:
    out: List[ast.Constant] = []
    for stmt in tree.body:
        targets: List[ast.expr] = []
        if isinstance(stmt, ast.Assign):
            targets = stmt.targets
            value = stmt.value
        elif isinstance(stmt, ast.AugAssign):
            targets = [stmt.target]
            value = stmt.value
        else:
            continue
        if any(
            isinstance(t, ast.Name) and t.id == "__all__" for t in targets
        ) and isinstance(value, (ast.List, ast.Tuple)):
            out.extend(
                e for e in value.elts
                if isinstance(e, ast.Constant) and isinstance(e.value, str)
            )
    return out


def _noqa_lines(src: str) -> dict:
    """line number -> set of suppressed codes (empty set = all codes)."""
    out = {}
    for i, line in enumerate(src.splitlines(), start=1):
        if "# noqa" not in line:
            continue
        tail = line.split("# noqa", 1)[1]
        codes = set()
        if tail.startswith(":"):
            codes = {c.strip() for c in tail[1:].split(",") if c.strip()}
        out[i] = codes
    return out


def check_file(path: Path) -> List[Finding]:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:
        return [(str(path), exc.lineno or 0, exc.offset or 0, "E999", str(exc))]
    noqa = _noqa_lines(src)
    checker = Checker(str(path), tree)
    checker.visit(tree)
    findings = checker.findings

    all_consts = _all_entries(tree)
    all_names = [c.value for c in all_consts]
    seen: Set[str] = set()
    for c in all_consts:
        if c.value in seen:
            findings.append(
                (str(path), c.lineno, c.col_offset, "F822D",
                 f"duplicate __all__ entry '{c.value}'")
            )
        seen.add(c.value)
        if c.value not in checker.module_scope.bindings and not checker.star_import:
            findings.append(
                (str(path), c.lineno, c.col_offset, "F822",
                 f"__all__ entry '{c.value}' is undefined in module")
            )

    # unused imports (module level only; __all__ + `import x as x` are uses)
    used = checker.loads | set(all_names)
    for stmt in tree.body:
        aliases: List[ast.alias] = []
        if isinstance(stmt, ast.Import):
            aliases = stmt.names
        elif isinstance(stmt, ast.ImportFrom) and stmt.module != "__future__":
            aliases = [a for a in stmt.names if a.name != "*"]
        for a in aliases:
            name = a.asname or a.name.split(".")[0]
            if a.asname is not None and a.asname == a.name:
                continue  # explicit re-export convention
            if name not in used:
                findings.append(
                    (str(path), stmt.lineno, stmt.col_offset, "F401",
                     f"unused import '{name}'")
                )
    return [
        f for f in findings
        if not (f[1] in noqa and (not noqa[f[1]] or f[3] in noqa[f[1]]))
    ]


def lint(paths: List[str]) -> List[Finding]:
    findings: List[Finding] = []
    for p in paths:
        path = Path(p)
        files = sorted(path.rglob("*.py")) if path.is_dir() else [path]
        for f in files:
            findings.extend(check_file(f))
    return findings


def main(argv: List[str]) -> int:
    paths = argv or ["cortex_tpu", "benchmarks", "tools", "bench.py",
                     "__graft_entry__.py"]
    findings = lint(paths)
    for path, line, col, code, msg in findings:
        print(f"{path}:{line}:{col} {code} {msg}")
    print(f"lint: {len(findings)} finding(s)", file=sys.stderr)
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
