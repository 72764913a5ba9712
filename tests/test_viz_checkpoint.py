"""Visualization (DOT) and checkpoint tests.

Viz assertions mirror the reference's SVG-content tests
(``test/ext/graph_viz_ext_tests.jl``): state colors, edge styles, bounding.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from cortex_tpu import (
    BipartiteFactorGraph,
    Connection,
    Factor,
    InferenceEngine,
    Signal,
    Variable,
)
from cortex_tpu.checkpoint import CheckpointManager, restore, save
from cortex_tpu.compile import extract_schedule
from cortex_tpu.models.hgf import HGF
from cortex_tpu.viz import schedule_to_dot, signal_to_dot


# -- signal_to_dot ----------------------------------------------------------


def test_dot_state_colors():
    s1 = Signal(1)
    pending = Signal()
    pending.add_dependency(s1)
    dot = signal_to_dot(pending)
    assert "digraph" in dot
    assert "lightblue" in dot  # pending node
    assert "lightyellow" in dot  # computed dependency


def test_dot_edge_styles():
    derived = Signal()
    weak_dep = Signal(1)
    inter_dep = Signal(2)
    derived.add_dependency(weak_dep, weak=True)
    derived.add_dependency(inter_dep, intermediate=True)
    dot = signal_to_dot(derived)
    assert "dashed" in dot  # weak edge
    assert "color=gray" in dot or "color=blue" in dot  # intermediate/fresh


def test_dot_bounded_with_summary_nodes():
    derived = Signal()
    for i in range(20):
        derived.add_dependency(Signal(i))
    dot = signal_to_dot(derived, max_dependencies=5)
    assert "15 more" in dot


def test_dot_variant_labels():
    g = BipartiteFactorGraph()
    v = g.add_variable(Variable(name="v"))
    f = g.add_factor(Factor(functional_form="prior"))
    g.add_edge(v, f, Connection(label="out"))
    engine = InferenceEngine(model_engine=g)
    dot = signal_to_dot(engine.get_variable_marginal(v))
    assert "IndividualMarginal" in dot
    assert "MessageToVariable" in dot


def test_dot_depth_bounded():
    chain = [Signal(0)]
    for i in range(10):
        s = Signal()
        s.add_dependency(chain[-1])
        chain.append(s)
    dot = signal_to_dot(chain[-1], max_depth=2, include_listeners=False)
    # Depth 2: the root, its dep, and its dep's dep appear; deeper ones don't.
    assert dot.count("[label=") <= 4


def test_dot_display_knobs():
    """show_value / show_variant / show_listeners / variant_to_string_fn
    mirror the reference's GraphViz.load kwargs
    (ext/GraphVizExt/GraphVizExt.jl:293-310)."""
    g = BipartiteFactorGraph()
    v = g.add_variable(Variable(name="v"))
    f = g.add_factor(Factor(functional_form="prior"))
    g.add_edge(v, f, Connection(label="out"))
    engine = InferenceEngine(model_engine=g)
    marginal = engine.get_variable_marginal(v)

    assert "IndividualMarginal" not in signal_to_dot(marginal, show_variant=False)
    assert "#undef" not in signal_to_dot(marginal, show_value=False)
    custom = signal_to_dot(
        marginal, variant_to_string_fn=lambda var: f"V<{type(var).__name__}>"
    )
    assert "V<IndividualMarginal>" in custom

    msg = engine.get_message_to_variable(v, f)
    with_l = signal_to_dot(msg, show_listeners=True)
    without_l = signal_to_dot(msg, show_listeners=False)
    assert with_l.count("[label=") > without_l.count("[label=")


@pytest.mark.skipif(
    __import__("shutil").which("dot") is None,
    reason="graphviz 'dot' binary not installed",
)
def test_render_signal_svg():
    """Rendered-output parity with the reference's SVG-content assertions
    (test/ext/graph_viz_ext_tests.jl); skipped when dot is absent."""
    from cortex_tpu.viz import render_signal

    s1 = Signal(1)
    pending = Signal()
    pending.add_dependency(s1)
    svg = render_signal(pending, format="svg").decode()
    assert "<svg" in svg
    assert "lightblue" in svg


def test_render_dot_clear_error_without_binary(monkeypatch):
    import shutil as _shutil

    from cortex_tpu.viz import render_dot

    monkeypatch.setattr(_shutil, "which", lambda name: None)
    with pytest.raises(RuntimeError, match="dot"):
        render_dot("digraph G {}")


# -- schedule_to_dot --------------------------------------------------------


def test_schedule_dot():
    g = BipartiteFactorGraph()
    p = g.add_variable(Variable(name="p"))
    for i in range(10):
        o = g.add_variable(Variable(name="o", index=(i,)))
        f = g.add_factor(Factor(functional_form="bernoulli"))
        g.add_edge(p, f, Connection(label="out"))
        g.add_edge(o, f, Connection(label="out"))
    engine = InferenceEngine(model_engine=g)
    sched = extract_schedule(engine, [p])
    dot = schedule_to_dot(sched)
    assert "sources" in dot
    assert "MessageToVariable [bernoulli]" in dot
    assert "IndividualMarginal" in dot


# -- checkpoint -------------------------------------------------------------


def test_save_restore_roundtrip(tmp_path):
    from cortex_tpu.dists import from_mean_variance

    state = {
        "gauss": from_mean_variance(jnp.arange(4.0), jnp.ones(4)),
        "step": jnp.asarray(7),
    }
    path = str(tmp_path / "state.npz")
    save(path, state)
    like = {
        "gauss": from_mean_variance(jnp.zeros(4), jnp.ones(4)),
        "step": jnp.asarray(0),
    }
    loaded = restore(path, like)
    np.testing.assert_allclose(np.asarray(loaded["gauss"].xi), np.arange(4.0))
    assert int(loaded["step"]) == 7


def test_restore_structure_mismatch_raises(tmp_path):
    path = str(tmp_path / "state.npz")
    save(path, {"a": jnp.zeros(3)})
    with pytest.raises(ValueError, match="structure mismatch"):
        restore(path, {"b": (jnp.zeros(3), jnp.zeros(3))})


def test_checkpoint_manager_retention_and_resume(tmp_path):
    hgf = HGF()
    manager = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    state = hgf.init_state((4,))
    rng = np.random.default_rng(0)

    for step in range(5):
        chunk = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
        state, _ = hgf.filter(chunk, state=state)
        manager.save(step, state)

    assert manager.latest_step() == 4
    files = sorted(os.listdir(tmp_path / "ckpts"))
    assert files == ["ckpt_3.npz", "ckpt_4.npz"]

    resumed = manager.restore(hgf.init_state((4,)))
    for got, want in zip(resumed, state):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_checkpoint_manager_empty_raises(tmp_path):
    manager = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        manager.restore(jnp.zeros(2))
