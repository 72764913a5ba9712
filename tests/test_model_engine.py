"""Model-engine struct + trait + backend conformance tests.

Ports ``test/model_engine_tests.jl`` and the backend conformance coverage of
``test/ext/bipartite_factor_graphs_ext_tests.jl``.
"""

import pytest

from cortex_tpu import (
    BipartiteFactorGraph,
    Connection,
    Factor,
    InferenceEngine,
    Signal,
    UnsupportedModelEngineError,
    Variable,
    create_inference_signal,
    is_engine_supported,
    throw_if_engine_unsupported,
)


def test_variable_construction():
    v = Variable(name="x")
    assert v.get_name() == "x"
    assert v.get_index() is None
    assert isinstance(v.get_marginal(), Signal)
    assert v.get_linked_signals() == []

    v2 = Variable(name="x", index=(1,))
    assert v2.get_index() == (1,)
    assert "index" in repr(v2)


def test_variable_linked_signals():
    v = Variable(name="x")
    s = create_inference_signal()
    v.link_signal(s)
    assert v.get_linked_signals() == [s]


def test_factor_construction():
    f = Factor(functional_form="gaussian")
    assert f.get_functional_form() == "gaussian"
    assert f.get_local_marginals() == []
    s = create_inference_signal()
    f.add_local_marginal(s)
    assert f.get_local_marginals() == [s]
    assert "gaussian" in repr(f)


def test_connection_construction():
    c = Connection(label="out")
    assert c.get_label() == "out"
    assert c.get_index() == 0
    assert isinstance(c.get_message_to_variable(), Signal)
    assert isinstance(c.get_message_to_factor(), Signal)
    c2 = Connection(label="in", index=3)
    assert c2.get_index() == 3
    assert "index = 3" in repr(c2)


def test_unsupported_engine_errors():
    class NotAnEngine:
        pass

    assert not is_engine_supported(NotAnEngine())
    with pytest.raises(UnsupportedModelEngineError) as exc_info:
        throw_if_engine_unsupported(NotAnEngine())
    assert "not supported" in str(exc_info.value)

    with pytest.raises(UnsupportedModelEngineError):
        InferenceEngine(model_engine=NotAnEngine())


def test_partially_implemented_engine_reports_missing_function():
    class Partial:
        __cortex_engine_supported__ = True

        def get_variable(self, vid):
            return None

    with pytest.raises(UnsupportedModelEngineError) as exc_info:
        throw_if_engine_unsupported(Partial())
    assert "get_factor" in str(exc_info.value)


def test_duck_typed_custom_engine_is_supported():
    class Custom:
        def get_variable(self, variable_id):
            raise NotImplementedError

        def get_factor(self, factor_id):
            raise NotImplementedError

        def get_variable_ids(self):
            return []

        def get_factor_ids(self):
            return []

        def get_connection(self, variable_id, factor_id):
            raise NotImplementedError

        def get_connected_variable_ids(self, factor_id):
            return []

        def get_connected_factor_ids(self, variable_id):
            return []

    assert is_engine_supported(Custom())
    engine = InferenceEngine(model_engine=Custom())
    assert engine.get_warnings() == []


# -- BipartiteFactorGraph backend conformance --------------------------------


def test_graph_backend_conformance():
    g = BipartiteFactorGraph()
    v1 = g.add_variable(Variable(name="v1"))
    v2 = g.add_variable(Variable(name="v2"))
    f1 = g.add_factor(Factor(functional_form="f1"))
    g.add_edge(v1, f1, Connection(label="out"))
    g.add_edge(v2, f1, Connection(label="in"))

    assert is_engine_supported(g)
    assert g.get_variable(v1).get_name() == "v1"
    assert g.get_factor(f1).get_functional_form() == "f1"
    assert list(g.get_variable_ids()) == [v1, v2]
    assert list(g.get_factor_ids()) == [f1]
    assert g.get_connection(v1, f1).get_label() == "out"
    assert list(g.get_connected_variable_ids(f1)) == [v1, v2]
    assert list(g.get_connected_factor_ids(v1)) == [f1]
    assert list(g.get_connected_factor_ids(v2)) == [f1]

    # IDs are unique across variables and factors.
    assert len({v1, v2, f1}) == 3


def test_graph_backend_errors():
    g = BipartiteFactorGraph()
    v1 = g.add_variable(Variable(name="v1"))
    f1 = g.add_factor(Factor(functional_form="f1"))
    with pytest.raises(KeyError):
        g.add_edge(999, f1, Connection(label="x"))
    with pytest.raises(KeyError):
        g.add_edge(v1, 999, Connection(label="x"))
    g.add_edge(v1, f1, Connection(label="x"))
    with pytest.raises(ValueError):
        g.add_edge(v1, f1, Connection(label="dup"))


def test_engine_prepares_signal_variants():
    """Ports ``test/inference_engine_tests.jl:48-91``."""
    from cortex_tpu import variants as V

    g = BipartiteFactorGraph()
    v1 = g.add_variable(Variable(name="v1"))
    v2 = g.add_variable(Variable(name="v2"))
    v3 = g.add_variable(Variable(name="v3"))
    f1 = g.add_factor(Factor(functional_form="f1"))
    f2 = g.add_factor(Factor(functional_form="f2"))
    g.add_edge(v1, f1, Connection(label="out"))
    g.add_edge(v2, f2, Connection(label="out"))
    g.add_edge(v3, f1, Connection(label="in"))
    g.add_edge(v3, f2, Connection(label="in"))

    engine = InferenceEngine(model_engine=g)

    for v, f in [(v1, f1), (v2, f2), (v3, f1), (v3, f2)]:
        assert engine.get_message_to_variable(v, f).get_variant() == V.MessageToVariable(v, f)
        assert engine.get_message_to_factor(v, f).get_variant() == V.MessageToFactor(v, f)
    for v in [v1, v2, v3]:
        assert engine.get_variable_marginal(v).get_variant() == V.IndividualMarginal(v)


def test_engine_warns_for_dangling_variable():
    """Ports ``test/inference_engine_tests.jl:33-46``."""
    g = BipartiteFactorGraph()
    v = g.add_variable(Variable(name="v"))
    engine = InferenceEngine(model_engine=g)
    assert len(engine.get_warnings()) == 1
    assert engine.get_warnings()[0].description == "Variable has no connected factors"
    assert engine.get_warnings()[0].context == v
