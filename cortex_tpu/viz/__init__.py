"""Dependency-graph visualization: render signals and schedules to DOT.

The TPU-native counterpart of the reference's GraphViz extension
(``/root/reference/ext/GraphVizExt/GraphVizExt.jl:293-444``): node color
encodes computed (light yellow) / pending (light blue) state, edge style
encodes weak (dashed) / intermediate (gray) / fresh (blue), traversal is
bounded by ``max_depth`` / ``max_dependencies`` / ``max_listeners`` with
"N more" summary nodes.  Output is a DOT string (no GraphViz binding
required; pipe to ``dot -Tsvg`` or any renderer).

Also renders :class:`~cortex_tpu.compile.StaticSchedule` phase plans — the
compiled-path observability surface.
"""

from .dot import schedule_to_dot, signal_to_dot

__all__ = ["signal_to_dot", "schedule_to_dot"]
