"""Static schedule extraction: signal DAG → topologically-phased compute plan.

The reference discovers its schedule dynamically — pending bits propagate and
``process_dependencies!`` walks them per sweep (``src/inference_engine.jl:
512-525``; its own ``scan_inference_request`` at ``:540-546`` proves the
schedule can be extracted as data).  On TPU the graph is fixed after resolver
wiring (``src/inference_engine.jl:84-86``), so we extract the *whole* schedule
once:

1. collect the signals needed for the requested targets (backward reachability
   through dependency edges),
2. classify sources (signals with no dependencies, or already computed at
   compile time — observations, initial VMP marginals),
3. assign phases by longest-path layering over strong edges.  Weak edges
   (VMP) do not constrain ordering — they read the previous iteration's value,
   exactly the reference's weak-dependency semantics
   (``src/signal.jl:668-730``) made static,
4. group each phase's steps by *rule key* ``(variant kind, factor functional
   form, arity)`` — each group executes as ONE batched rule call.

The resulting :class:`StaticSchedule` is pure data; execution lives in
:mod:`cortex_tpu.compile.executor`.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Any, Dict, List, Optional, Sequence, Tuple

from ..core import variants as V
from ..core.engine import InferenceEngine
from ..core.signal import Signal

__all__ = ["ComputeStep", "PhaseGroup", "StaticSchedule", "extract_schedule"]


@dataclasses.dataclass
class ComputeStep:
    """One signal computation: the static analogue of a traced execution."""

    signal: Signal
    variant: Any
    deps: List[Signal]
    weak_mask: Tuple[bool, ...]


@dataclasses.dataclass
class PhaseGroup:
    """All steps in one phase sharing a rule key — one batched rule call."""

    key: Tuple[str, Optional[Any], int]
    steps: List[ComputeStep]


@dataclasses.dataclass
class StaticSchedule:
    """Phased compute plan over the signal DAG."""

    phases: List[List[PhaseGroup]]
    sources: List[Signal]  # required inputs (uncomputed, no deps)
    initials: List[Signal]  # computed at compile time (VMP initial marginals)
    targets: Dict[int, Signal]  # variable_id -> marginal signal
    linked: Dict[int, List[Signal]]  # variable_id -> linked signals

    @property
    def num_steps(self) -> int:
        return sum(len(g.steps) for phase in self.phases for g in phase)

    def summary(self) -> str:
        lines = [
            f"StaticSchedule: {len(self.phases)} phases, {self.num_steps} steps, "
            f"{len(self.sources)} sources, {len(self.initials)} initials"
        ]
        for i, phase in enumerate(self.phases):
            parts = ", ".join(f"{g.key[0]}/{g.key[1]}×{len(g.steps)}" for g in phase)
            lines.append(f"  phase {i}: {parts}")
        return "\n".join(lines)


def _rule_key(engine: InferenceEngine, signal: Signal) -> Tuple[str, Optional[Any], int]:
    variant = signal.variant
    kind = type(variant).__name__
    form: Optional[Any] = None
    if isinstance(variant, (V.MessageToVariable, V.MessageToFactor)):
        form = engine.get_factor(variant.factor_id).functional_form
    elif isinstance(variant, V.JointMarginal):
        form = engine.get_factor(variant.factor_id).functional_form
    return (kind, form, len(signal.get_dependencies()))


def extract_schedule(
    engine: InferenceEngine,
    variable_ids: Sequence[int],
    *,
    treat_computed_as_sources: bool = True,
) -> StaticSchedule:
    """Extract the static schedule for updating the marginals of
    ``variable_ids`` (the compile-time analogue of ``update_marginals!``).

    Signals already computed at compile time (e.g. VMP initial marginals set
    with ``set_value``) become *initials*: their current slot is an input to
    the first iteration, and they are ALSO scheduled for recomputation when
    they have dependencies (the VMP fixed-point update).
    """
    if isinstance(variable_ids, int):
        variable_ids = (variable_ids,)

    targets: Dict[int, Signal] = {}
    linked: Dict[int, List[Signal]] = {}
    roots: List[Signal] = []
    for vid in variable_ids:
        variable = engine.get_variable(vid)
        targets[vid] = variable.marginal
        linked[vid] = list(variable.linked_signals)
        roots.append(variable.marginal)
        roots.extend(variable.linked_signals)

    # -- backward reachability -------------------------------------------
    needed: List[Signal] = []
    seen: set = set()
    stack = list(roots)
    while stack:
        s = stack.pop()
        if id(s) in seen:
            continue
        seen.add(id(s))
        needed.append(s)
        for dep in s.get_dependencies():
            stack.append(dep)

    sources: List[Signal] = []
    initials: List[Signal] = []
    computable: List[Signal] = []
    for s in needed:
        if not s.get_dependencies():
            if s.is_computed():
                initials.append(s)
            else:
                sources.append(s)
        else:
            if s.is_computed() and treat_computed_as_sources:
                initials.append(s)
            computable.append(s)

    # -- phase assignment: longest path over strong edges ------------------
    # Weak edges are ordering-free (previous-iteration values).  Strong edges
    # to initials are satisfied at phase -1 for the first iteration.
    phase_of: Dict[int, int] = {}
    for s in sources + initials:
        if not s.get_dependencies():
            phase_of[id(s)] = -1
    # Initials WITH dependencies still get recomputed; they participate in
    # ordering like any computable signal, but their consumers may read the
    # stale value (weak edges) — strong edges to them order normally.

    computable_ids = {id(s) for s in computable}

    def strong_deps(s: Signal) -> List[Signal]:
        out = []
        props = s._deps_props
        deps = s.get_dependencies()
        for i, d in enumerate(deps):
            if not props.is_weak(i) and id(d) in computable_ids:
                out.append(d)
        return out

    # Kahn-style longest path with cycle detection on strong edges.
    indeg: Dict[int, int] = {}
    dependents: Dict[int, List[Signal]] = defaultdict(list)
    for s in computable:
        sd = strong_deps(s)
        indeg[id(s)] = len(sd)
        for d in sd:
            dependents[id(d)].append(s)

    frontier = [s for s in computable if indeg[id(s)] == 0]
    for s in frontier:
        phase_of[id(s)] = 0
    ordered: List[Signal] = []
    while frontier:
        s = frontier.pop()
        ordered.append(s)
        for t in dependents[id(s)]:
            indeg[id(t)] -= 1
            phase_of[id(t)] = max(
                phase_of.get(id(t), 0), phase_of[id(s)] + 1
            )
            if indeg[id(t)] == 0:
                frontier.append(t)

    if len(ordered) != len(computable):
        cyclic = [s for s in computable if indeg[id(s)] > 0]
        raise ValueError(
            "Strong-dependency cycle detected among "
            f"{len(cyclic)} signals; cyclic structures must use weak "
            "dependencies (VMP) to be compilable. Example variant: "
            f"{cyclic[0].variant!r}"
        )

    # -- bucket into phases and rule-key groups ----------------------------
    nphases = 1 + max((phase_of[id(s)] for s in computable), default=-1)
    phases: List[List[PhaseGroup]] = []
    for p in range(nphases):
        groups: Dict[Tuple[str, Optional[Any], int], List[ComputeStep]] = defaultdict(
            list
        )
        for s in computable:
            if phase_of[id(s)] != p:
                continue
            props = s._deps_props
            deps = s.get_dependencies()
            weak_mask = tuple(props.is_weak(i) for i in range(len(deps)))
            groups[_rule_key(engine, s)].append(
                ComputeStep(s, s.variant, list(deps), weak_mask)
            )
        phases.append([PhaseGroup(k, steps) for k, steps in groups.items()])

    return StaticSchedule(phases, sources, initials, targets, linked)
