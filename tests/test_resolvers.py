"""Dependency-resolver tests.

Ports ``test/dependencies_tests.jl`` (custom-resolver dispatch; exact BP
wiring for a 3-variable / 2-factor chain) and adds segment-tree coverage for
high-degree variables (reference ``src/dependencies.jl:90-173``).
"""

from cortex_tpu import (
    BipartiteFactorGraph,
    BeliefPropagationResolver,
    Connection,
    DependencyResolver,
    Factor,
    InferenceEngine,
    Variable,
    variants as V,
)


def test_custom_resolver_visits_all_variables_and_factors():
    class CustomResolver(DependencyResolver):
        def __init__(self):
            self.resolved_factors = set()
            self.resolved_variables = set()

        def resolve_variable_dependencies(self, engine, variable_id):
            self.resolved_variables.add(variable_id)

        def resolve_factor_dependencies(self, engine, factor_id):
            self.resolved_factors.add(factor_id)

    g = BipartiteFactorGraph()
    x = g.add_variable(Variable(name="x"))
    y = g.add_variable(Variable(name="y"))
    z = g.add_variable(Variable(name="z"))
    f1 = g.add_factor(Factor(functional_form="f1"))
    f2 = g.add_factor(Factor(functional_form="f2"))

    resolver = CustomResolver()
    engine = InferenceEngine(model_engine=g, dependency_resolver=resolver)
    assert resolver.resolved_variables == {x, y, z}
    assert resolver.resolved_factors == {f1, f2}


def test_default_bp_wiring_chain():
    """Exact wiring assertions for |v1|-f1-|v2|-f2-|v3|
    (reference ``test/dependencies_tests.jl:39-99``)."""
    g = BipartiteFactorGraph()
    v1 = g.add_variable(Variable(name="v1"))
    v2 = g.add_variable(Variable(name="v2"))
    v3 = g.add_variable(Variable(name="v3"))
    f1 = g.add_factor(Factor(functional_form="f1"))
    f2 = g.add_factor(Factor(functional_form="f2"))
    g.add_edge(v1, f1, Connection(label="out"))
    g.add_edge(v2, f1, Connection(label="out"))
    g.add_edge(v2, f2, Connection(label="out"))
    g.add_edge(v3, f2, Connection(label="out"))

    engine = InferenceEngine(
        model_engine=g, dependency_resolver=BeliefPropagationResolver()
    )

    v1_deps = engine.get_variable_marginal(v1).get_dependencies()
    assert v1_deps == [engine.get_message_to_variable(v1, f1)]

    v2_deps = engine.get_variable_marginal(v2).get_dependencies()
    assert len(v2_deps) == 2
    assert engine.get_message_to_variable(v2, f1) in v2_deps
    assert engine.get_message_to_variable(v2, f2) in v2_deps

    v3_deps = engine.get_variable_marginal(v3).get_dependencies()
    assert v3_deps == [engine.get_message_to_variable(v3, f2)]

    assert engine.get_message_to_variable(v2, f1).get_dependencies() == [
        engine.get_message_to_factor(v1, f1)
    ]
    assert engine.get_message_to_variable(v2, f2).get_dependencies() == [
        engine.get_message_to_factor(v3, f2)
    ]
    assert engine.get_message_to_factor(v2, f1).get_dependencies() == [
        engine.get_message_to_variable(v2, f2)
    ]
    assert engine.get_message_to_factor(v2, f2).get_dependencies() == [
        engine.get_message_to_variable(v2, f1)
    ]


def _star_model(n):
    """One central variable connected to n two-edge factors, each with a leaf."""
    g = BipartiteFactorGraph()
    center = g.add_variable(Variable(name="p"))
    leaves, factors = [], []
    for i in range(n):
        leaf = g.add_variable(Variable(name="o", index=(i,)))
        f = g.add_factor(Factor(functional_form="obs"))
        g.add_edge(center, f, Connection(label="out"))
        g.add_edge(leaf, f, Connection(label="out"))
        leaves.append(leaf)
        factors.append(f)
    return g, center, leaves, factors


def test_direct_wiring_degree_at_most_5():
    g, center, leaves, factors = _star_model(5)
    engine = InferenceEngine(model_engine=g)
    marginal_deps = engine.get_variable_marginal(center).get_dependencies()
    assert len(marginal_deps) == 5
    for f in factors:
        assert engine.get_message_to_variable(center, f) in marginal_deps
    # No ProductOfMessages intermediates created at this degree.
    for d in marginal_deps:
        assert isinstance(d.get_variant(), V.MessageToVariable)


def test_segment_tree_wiring_degree_above_5():
    n = 8
    g, center, leaves, factors = _star_model(n)
    engine = InferenceEngine(model_engine=g)

    marginal_deps = engine.get_variable_marginal(center).get_dependencies()
    # Marginal depends on exactly the two subtree roots.
    assert len(marginal_deps) == 2
    for d in marginal_deps:
        assert isinstance(d.get_variant(), V.ProductOfMessages)
    left, right = marginal_deps
    assert left.get_variant().range == (0, n // 2)
    assert right.get_variant().range == (n // 2, n)

    # Leaves of the tree are the actual inbound messages.
    def collect_leaves(signal):
        if not isinstance(signal.get_variant(), V.ProductOfMessages):
            return [signal]
        out = []
        for d in signal.get_dependencies():
            out.extend(collect_leaves(d))
        return out

    leaves_of_tree = collect_leaves(left) + collect_leaves(right)
    expected = [engine.get_message_to_variable(center, f) for f in factors]
    assert len(leaves_of_tree) == n
    assert set(map(id, leaves_of_tree)) == set(map(id, expected))


def test_segment_tree_message_to_factor_untouched_without_listeners():
    """Outbound v→f messages only get dependencies if someone listens
    (reference ``src/dependencies.jl:73,107,117``).  In a star model the
    factor side wires f→leaf messages to depend on center→f, so center→f
    messages DO have listeners and get segment-tree deps."""
    n = 8
    g, center, leaves, factors = _star_model(n)
    engine = InferenceEngine(model_engine=g)
    for f in factors:
        msg = engine.get_message_to_factor(center, f)
        deps = msg.get_dependencies()
        # Depends on complementary products: O(log n) of them.
        assert 1 <= len(deps) <= 4


def test_dangling_leafless_factor_chain_marginal_degree1():
    g = BipartiteFactorGraph()
    v = g.add_variable(Variable(name="v"))
    f = g.add_factor(Factor(functional_form="prior"))
    g.add_edge(v, f, Connection(label="out"))
    engine = InferenceEngine(model_engine=g)
    # Degree-1: marginal := the single inbound message.
    assert engine.get_variable_marginal(v).get_dependencies() == [
        engine.get_message_to_variable(v, f)
    ]
    assert engine.get_warnings() == []
