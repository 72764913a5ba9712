"""DOT rendering of signal graphs and compiled schedules."""

from __future__ import annotations

from typing import Dict, List

from ..core.signal import Signal, UNDEF_VARIANT

__all__ = ["signal_to_dot", "schedule_to_dot"]

# State colors mirror the reference (ext/GraphVizExt/GraphVizExt.jl:6-14).
_COLOR_COMPUTED = "lightyellow"
_COLOR_PENDING = "lightblue"
_COLOR_UNDEF = "white"


def _node_color(s: Signal) -> str:
    if s.is_pending():
        return _COLOR_PENDING
    if s.is_computed():
        return _COLOR_COMPUTED
    return _COLOR_UNDEF


def _node_label(s: Signal) -> str:
    parts = []
    if s.variant is not UNDEF_VARIANT:
        parts.append(type(s.variant).__name__)
        fields = getattr(s.variant, "__dataclass_fields__", None)
        if fields:
            vals = ", ".join(
                f"{name}={getattr(s.variant, name)!r}" for name in fields
            )
            parts.append(f"({vals})")
    if s.is_computed():
        v = repr(s.get_value())
        if len(v) > 30:
            v = v[:27] + "..."
        parts.append(f"= {v}")
    else:
        parts.append("#undef")
    return "\\n".join(parts) if parts else "Signal"


def signal_to_dot(
    signal: Signal,
    *,
    max_depth: int = 3,
    max_dependencies: int = 8,
    max_listeners: int = 4,
    include_listeners: bool = True,
) -> str:
    """Render ``signal``'s dependency/listener neighborhood as a DOT digraph.

    Edge styles follow the reference (``ext/GraphVizExt/GraphVizExt.jl:
    17-39``): weak → dashed, intermediate → gray, fresh → blue.
    """
    ids: Dict[int, str] = {}
    lines: List[str] = [
        "digraph Signals {",
        "  rankdir=BT;",
        '  node [shape=box, style="filled,rounded", fontsize=10];',
    ]
    counter = [0]

    def node_id(s: Signal) -> str:
        if id(s) not in ids:
            ids[id(s)] = f"s{counter[0]}"
            counter[0] += 1
            lines.append(
                f'  {ids[id(s)]} [label="{_node_label(s)}", '
                f'fillcolor={_node_color(s)}];'
            )
        return ids[id(s)]

    visited: set = set()

    def walk(s: Signal, depth: int) -> None:
        if id(s) in visited:
            return
        visited.add(id(s))
        sid = node_id(s)
        if depth >= max_depth:
            return
        deps = s.get_dependencies()
        for i, dep in enumerate(deps[:max_dependencies]):
            did = node_id(dep)
            styles = []
            if s.dep_is_weak(i):
                styles.append("dashed")
            color = "black"
            if s.dep_is_intermediate(i):
                color = "gray"
            if s.dep_is_fresh(i):
                color = "blue"
            style_attr = f', style="{",".join(styles)}"' if styles else ""
            lines.append(f"  {sid} -> {did} [color={color}{style_attr}];")
            walk(dep, depth + 1)
        if len(deps) > max_dependencies:
            more = f"{sid}_more_deps"
            lines.append(
                f'  {more} [label="{len(deps) - max_dependencies} more", '
                "shape=plaintext];"
            )
            lines.append(f"  {sid} -> {more} [style=dotted];")
        if include_listeners and depth == 0:
            listeners = s.get_listeners()
            for listener in listeners[:max_listeners]:
                lid = node_id(listener)
                lines.append(f"  {lid} -> {sid} [color=gray, style=dotted];")
            if len(listeners) > max_listeners:
                more = f"{sid}_more_listeners"
                lines.append(
                    f'  {more} [label="{len(listeners) - max_listeners} more '
                    'listeners", shape=plaintext];'
                )
                lines.append(f"  {more} -> {sid} [style=dotted];")

    walk(signal, 0)
    lines.append("}")
    return "\n".join(lines)


def schedule_to_dot(schedule) -> str:
    """Render a :class:`~cortex_tpu.compile.StaticSchedule` as a phase DAG:
    one node per (phase, rule-key) group, sized by group width."""
    lines = [
        "digraph Schedule {",
        "  rankdir=TB;",
        '  node [shape=box, style="filled", fillcolor=lightyellow, fontsize=10];',
    ]
    lines.append(
        f'  sources [label="{len(schedule.sources)} sources", fillcolor=white];'
    )
    if schedule.initials:
        lines.append(
            f'  initials [label="{len(schedule.initials)} initials '
            '(iteration state)", fillcolor=lightgray];'
        )
    prev = ["sources"] + (["initials"] if schedule.initials else [])
    for p, phase in enumerate(schedule.phases):
        names = []
        for gi, group in enumerate(phase):
            name = f"p{p}g{gi}"
            kind, form, arity = group.key
            form_str = f" [{form}]" if form is not None else ""
            lines.append(
                f'  {name} [label="phase {p}: {kind}{form_str}\\n'
                f'×{len(group.steps)} (arity {arity})"];'
            )
            names.append(name)
            for pr in prev:
                lines.append(f"  {pr} -> {name};")
        prev = names
    lines.append("}")
    return "\n".join(lines)
