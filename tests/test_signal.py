"""State-machine tests of the reactive signal core.

Ports the behavioral coverage of the reference's ``test/signal_tests.jl``
(pending semantics, weak/strong deps, listen=False, check_computed=False,
chains, pyramids, circular deps, the documented duplicate-dependency caveat,
self-dependency no-op, process_dependencies recursion × retry truth table,
compute force/skip, repr).
"""

import pytest

from cortex_tpu import (
    UNDEF,
    Signal,
    UndefValue,
    UndefVariant,
)


# -- Basic operations (signal_tests.jl:1-98) --------------------------------


def test_basic_signal_operations():
    s = Signal(42)
    assert s.get_value() == 42
    assert s.is_computed()
    assert not s.is_pending()

    s.set_value(43)
    assert s.get_value() == 43


def test_signal_variant():
    s = Signal(variant=(1, 2))
    assert s.get_variant() == (1, 2)
    s.set_variant("meta")
    assert s.get_variant() == "meta"
    assert s.isa_variant(str)
    assert not s.isa_variant(int)


def test_undef_singletons():
    assert UndefValue() is UndefValue()
    assert UndefVariant() is UndefVariant()
    assert UNDEF is UndefValue()


def test_empty_signal_creation():
    s = Signal()
    assert not s.is_computed()
    assert not s.is_pending()
    assert s.get_value() is UNDEF
    assert s.get_dependencies() == []
    assert s.get_listeners() == []


def test_signal_creation_with_value_sets_computed():
    s = Signal(0)
    assert s.is_computed()


# -- add_dependency basics (signal_tests.jl:99-243) -------------------------


def test_add_dependency_basic():
    s1 = Signal()
    s2 = Signal()
    s1.add_dependency(s2)
    assert s1.get_dependencies() == [s2]
    assert s2.get_listeners() == [s1]
    assert not s1.is_pending()
    s2.set_value(1)
    assert s1.is_pending()


def test_add_initialized_dependency():
    # An already-computed dependency notifies immediately (check_computed).
    s1 = Signal()
    s2 = Signal(5)
    s1.add_dependency(s2)
    assert s1.is_pending()


def test_add_single_non_initialized_weak_dependency():
    derived = Signal()
    weak = Signal()
    derived.add_dependency(weak, weak=True)
    assert not derived.is_pending()
    weak.set_value(1)
    assert derived.is_pending()


def test_add_single_initialized_weak_dependency():
    derived = Signal()
    weak = Signal(1)
    derived.add_dependency(weak, weak=True)
    assert derived.is_pending()


def test_add_initialized_dependency_without_check_computed():
    derived = Signal()
    dep = Signal(1)
    derived.add_dependency(dep, check_computed=False)
    # Not notified about the existing value.
    assert not derived.is_pending()
    dep.set_value(2)
    assert derived.is_pending()


def test_add_many_dependencies_all_strong():
    source1, source2, source3 = Signal(), Signal(), Signal()
    derived = Signal()
    derived.add_dependency(source1)
    derived.add_dependency(source2)
    derived.add_dependency(source3)

    assert derived.get_dependencies() == [source1, source2, source3]
    assert source1.get_listeners() == [derived]
    assert not derived.is_pending()
    assert not derived.is_computed()

    source1.set_value(1)
    assert not derived.is_pending()
    source2.set_value(2)
    assert not derived.is_pending()
    source3.set_value(3)
    assert derived.is_pending()
    assert not derived.is_computed()

    derived.set_value(10)
    assert not derived.is_pending()
    assert derived.is_computed()


def test_update_dependency_marks_signal_as_pending():
    # Uninitialized signals.
    s1, s2 = Signal(), Signal()
    s1.add_dependency(s2)
    assert not s1.is_pending() and not s2.is_pending()
    s2.set_value(3)
    assert s1.is_pending()
    assert not s2.is_pending()
    assert not s1.is_computed() and s2.is_computed()

    # Initialized signals.
    s1, s2 = Signal(1), Signal(2)
    s1.add_dependency(s2)
    assert not s1.is_pending()
    s2.set_value(3)
    assert s1.is_pending()
    assert s1.is_computed() and s2.is_computed()


# -- Weak dependency semantics (signal_tests.jl:333-440) --------------------


def test_weak_dependencies_basic():
    weak_dep = Signal(1)
    strong_dep = Signal(2)
    derived = Signal()

    derived.add_dependency(weak_dep, weak=True)
    derived.add_dependency(strong_dep)

    assert derived.get_dependencies() == [weak_dep, strong_dep]
    assert derived.is_pending()
    assert not derived.is_computed()

    derived.set_value(10)
    assert not derived.is_pending()
    assert derived.is_computed()

    strong_dep.set_value(3)
    assert derived.is_pending()

    derived.set_value(11)
    assert not derived.is_pending()

    # A weak update alone does not re-pend: the strong dep is stale.
    weak_dep.set_value(4)
    assert not derived.is_pending()

    strong_dep.set_value(5)
    assert derived.is_pending()


def test_add_many_weak_dependencies():
    weak1, weak2, strong1 = Signal(), Signal(), Signal()
    derived = Signal()
    derived.add_dependency(weak1, weak=True)
    derived.add_dependency(weak2, weak=True)
    derived.add_dependency(strong1)

    assert not derived.is_pending()

    strong1.set_value(10)
    assert not derived.is_pending()  # weak deps not computed yet

    weak1.set_value(1)
    assert not derived.is_pending()  # weak2 not computed

    weak2.set_value(2)
    assert derived.is_pending()  # all criteria met

    derived.set_value(100)
    assert not derived.is_pending()

    strong1.set_value(11)
    assert derived.is_pending()

    derived.set_value(101)
    assert not derived.is_pending()

    weak1.set_value(3)
    assert not derived.is_pending()  # strong is stale

    strong1.set_value(333)
    assert derived.is_pending()


# -- Edge cases (signal_tests.jl:442-591) -----------------------------------


def test_duplicate_dependencies_documented_caveat():
    s1, s2 = Signal(), Signal()
    s1.add_dependency(s2)
    s1.add_dependency(s2)  # duplicate

    assert s1.get_dependencies() == [s2, s2]
    assert s2.get_listeners() == [s1, s1]
    assert not s1.is_pending()

    s2.set_value(1)
    # Only the first duplicate slot is ever notified, so the criterion fails.
    assert not s1.is_pending()


def test_circular_dependencies_ping_pong():
    s1, s2 = Signal(), Signal()
    s1.add_dependency(s2)
    s2.add_dependency(s1)

    assert s1.get_dependencies() == [s2]
    assert s1.get_listeners() == [s2]
    assert not s1.is_pending() and not s2.is_pending()

    s1.set_value(1)
    assert not s1.is_pending()
    assert s2.is_pending()

    s2.set_value(2)
    assert s1.is_pending()
    assert not s2.is_pending()

    s2.set_value(3)
    assert s1.is_pending()
    assert not s2.is_pending()

    s1.set_value(4)
    assert not s1.is_pending()
    assert s2.is_pending()


def test_self_dependency_is_noop():
    s1 = Signal()
    s1.add_dependency(s1)
    assert s1.get_dependencies() == []
    assert s1.get_listeners() == []
    assert not s1.is_pending()


def test_pending_state_logic_coverage():
    # Strong dep not computed.
    derived, strong_dep = Signal(), Signal()
    derived.add_dependency(strong_dep)
    assert not derived.is_pending()
    derived.set_value(1)
    assert not derived.is_pending()

    derived, strong_dep = Signal(), Signal()
    derived.add_dependency(strong_dep)
    strong_dep.set_value(10)
    assert derived.is_pending()

    # Weak dep not computed.
    derived, weak_dep = Signal(), Signal()
    derived.add_dependency(weak_dep, weak=True)
    assert not derived.is_pending()
    derived.set_value(1)
    assert not derived.is_pending()
    weak_dep.set_value(10)
    assert derived.is_pending()

    # Strong dep computed but consumed ("not older").
    derived, strong_dep = Signal(1), Signal(10)
    derived.add_dependency(strong_dep)
    assert not derived.is_pending()
    derived.set_value(100)
    assert not derived.is_pending()
    strong_dep.set_value(101)
    assert derived.is_pending()
    derived.set_value(102)
    assert not derived.is_pending()
    strong_dep.set_value(103)
    assert derived.is_pending()

    # Mixed.
    derived, weak_dep, strong_dep = Signal(), Signal(), Signal()
    derived.add_dependency(weak_dep, weak=True)
    derived.add_dependency(strong_dep)
    assert not derived.is_pending()
    weak_dep.set_value(1)
    assert not derived.is_pending()
    strong_dep.set_value(2)
    assert derived.is_pending()


def test_chain_of_signals():
    s1, s2, s3 = Signal(1), Signal(), Signal()
    s2.add_dependency(s1)
    s3.add_dependency(s2)

    assert not s1.is_pending()
    assert s2.is_pending()  # s1 is initialized
    assert not s3.is_pending()

    s1.set_value(2)
    assert s2.is_pending() and not s3.is_pending()

    s2.set_value(3)
    assert not s2.is_pending() and s3.is_pending()

    s3.set_value(4)
    assert not s1.is_pending() and not s2.is_pending() and not s3.is_pending()

    s1.set_value(5)
    assert s2.is_pending() and not s3.is_pending()
    s2.set_value(6)
    assert s3.is_pending()
    s3.set_value(7)
    assert not s3.is_pending()


def test_not_listening_dependency():
    # Single non-weak non-listening dep.
    s1, s2 = Signal(1), Signal(2)
    s2.add_dependency(s1, listen=False)
    assert not s2.is_pending()
    s1.set_value(10)
    assert not s2.is_pending()

    # Single weak non-listening dep: pending because weak+computed at add time.
    s1, s2 = Signal(1), Signal(2)
    s2.add_dependency(s1, listen=False, weak=True)
    assert s2.is_pending()
    s1.set_value(10)
    assert s2.is_pending()

    # Non-listening and no check_computed.
    s1, s2 = Signal(1), Signal(2)
    s2.add_dependency(s1, listen=False, check_computed=False)
    assert not s2.is_pending()
    s1.set_value(10)
    assert not s2.is_pending()

    # Multiple deps, one not listening.
    s1, s2, s3 = Signal(), Signal(), Signal()
    s3.add_dependency(s1, listen=False)
    s3.add_dependency(s2)
    assert not s3.is_pending()
    s2.set_value(10)
    assert not s3.is_pending()  # s1 not set yet
    s1.set_value(10)
    assert not s3.is_pending()  # no notification from s1
    s2.set_value(30)
    assert s3.is_pending()  # s1's slot got marked on its set_value


def test_adding_uncomputed_after_computed_unsets_pending():
    s1, s2 = Signal(1), Signal()
    derived = Signal()
    derived.add_dependency(s1)
    assert derived.is_pending()
    derived.add_dependency(s2)
    assert not derived.is_pending()

    # With check_computed=False the pending state is untouched.
    s1, s2 = Signal(1), Signal()
    derived = Signal()
    derived.add_dependency(s1, check_computed=True)
    assert derived.is_pending()
    derived.add_dependency(s2, check_computed=False)
    assert derived.is_pending()


# -- repr (signal_tests.jl:751-788) -----------------------------------------


def test_signal_repr():
    assert repr(Signal()) == "Signal(value=#undef, pending=false)"
    assert repr(Signal(123)) == "Signal(value=123, pending=false)"
    assert (
        repr(Signal("test", variant="some info"))
        == "Signal(value='test', pending=false, variant='some info')"
    )
    s1 = Signal(1)
    s_pending = Signal(variant=31)
    s_pending.add_dependency(s1)
    assert repr(s_pending) == "Signal(value=#undef, pending=true, variant=31)"
    s_pending.set_value(50)
    assert repr(s_pending) == "Signal(value=50, pending=false, variant=31)"
    s1.set_value(2)
    assert repr(s_pending) == "Signal(value=50, pending=true, variant=31)"


# -- compute (signal_tests.jl:834-917,1116-1133) ----------------------------


def test_compute_with_lambda():
    s1, s2, s3 = Signal(1), Signal(2), Signal()
    s3.add_dependency(s1)
    s3.add_dependency(s2)
    assert s3.is_pending()

    strategy = lambda signal, deps: sum(d.get_value() for d in deps)
    s3.compute(strategy)
    assert s3.is_computed()
    assert not s3.is_pending()
    assert s3.get_value() == 3

    with pytest.raises(ValueError):
        s3.compute(strategy)
    s3.compute(strategy, force=True)
    assert s3.get_value() == 3

    s1.set_value(10)
    s2.set_value(20)
    assert s3.is_pending()
    s3.compute(strategy)
    assert s3.get_value() == 30


def test_compute_pyramid():
    s01, s02, s11, s12 = Signal(1), Signal(2), Signal(3), Signal(4)
    s21, s22, s3 = Signal(), Signal(), Signal()
    s21.add_dependency(s01)
    s21.add_dependency(s02)
    s22.add_dependency(s11)
    s22.add_dependency(s12)
    s3.add_dependency(s21)
    s3.add_dependency(s22)

    assert s21.is_pending() and s22.is_pending()
    assert not s3.is_pending()

    strategy = lambda signal, deps: sum(d.get_value() for d in deps)
    s21.compute(strategy)
    s22.compute(strategy)
    assert not s21.is_pending() and not s22.is_pending()
    assert s3.is_pending()
    s3.compute(strategy)
    assert s3.get_value() == 10


def test_compute_skip_if_no_listeners():
    s = Signal(1)
    s.compute(lambda sig, deps: 2, skip_if_no_listeners=True)
    assert s.get_value() == 1
    s.compute(lambda sig, deps: 2, force=True, skip_if_no_listeners=False)
    assert s.get_value() == 2


def test_compute_with_strategy_object():
    class Doubler:
        def compute_value(self, signal, deps):
            return 2 * deps[0].get_value()

    s1 = Signal(21)
    s2 = Signal()
    s2.add_dependency(s1)
    s2.compute(Doubler())
    assert s2.get_value() == 42


# -- process_dependencies (signal_tests.jl:919-1114) ------------------------


def _chain_with_intermediate():
    source = Signal()
    intermediate = Signal()
    derived = Signal()
    intermediate.add_dependency(source)
    derived.add_dependency(intermediate, intermediate=True)
    return source, intermediate, derived


def test_intermediate_dependency_wiring():
    source, intermediate, derived = _chain_with_intermediate()
    assert derived.get_dependencies() == [intermediate]
    assert intermediate.get_dependencies() == [source]


@pytest.mark.parametrize("retry", [False, True])
def test_process_dependencies_recurses_callback_false(retry):
    source, intermediate, derived = _chain_with_intermediate()
    attempted = []

    def cb(dep):
        attempted.append(dep)
        return False

    processed = derived.process_dependencies(cb, retry=retry)
    assert attempted == [intermediate, source]
    assert not processed


@pytest.mark.parametrize("retry", [False, True])
def test_process_dependencies_no_recursion_callback_true(retry):
    source, intermediate, derived = _chain_with_intermediate()
    attempted = []

    def cb(dep):
        attempted.append(dep)
        return True

    processed = derived.process_dependencies(cb, retry=retry)
    assert attempted == [intermediate]
    assert processed


def test_process_dependencies_retry_false_mixed():
    source, intermediate, derived = _chain_with_intermediate()
    attempted = []

    def cb(dep):
        attempted.append(dep)
        return dep is not intermediate

    processed = derived.process_dependencies(cb, retry=False)
    assert attempted == [intermediate, source]
    assert processed


def test_process_dependencies_retry_true_mixed():
    source, intermediate, derived = _chain_with_intermediate()
    attempted = []

    def cb(dep):
        attempted.append(dep)
        return dep is not intermediate

    processed = derived.process_dependencies(cb, retry=True)
    assert attempted == [intermediate, source, intermediate]
    assert processed


@pytest.mark.parametrize("retry", [False, True])
@pytest.mark.parametrize("callback_returns", [False, True])
def test_process_dependencies_no_recursion_for_non_intermediate(
    retry, callback_returns
):
    source = Signal()
    not_intermediate = Signal()
    derived = Signal()
    not_intermediate.add_dependency(source)
    derived.add_dependency(not_intermediate)
    attempted = []

    def cb(dep):
        attempted.append(dep)
        return callback_returns

    processed = derived.process_dependencies(cb, retry=retry)
    assert attempted == [not_intermediate]
    assert processed == callback_returns


@pytest.mark.parametrize("retry", [False, True])
def test_process_dependencies_returns_true_if_any_processed(retry):
    source, intermediate, derived = _chain_with_intermediate()
    attempted = []

    def cb(dep):
        attempted.append(dep)
        return dep is source

    processed = derived.process_dependencies(cb, retry=retry)
    assert len(attempted) >= 1
    assert processed


# -- many dependencies exercise the multi-chunk bit-packing -----------------


@pytest.mark.parametrize("n", [15, 16, 17, 33, 100])
def test_many_dependencies_bitpacking(n):
    sources = [Signal() for _ in range(n)]
    derived = Signal()
    for s in sources:
        derived.add_dependency(s)
    for i, s in enumerate(sources):
        s.set_value(i)
        if i < n - 1:
            assert not derived.is_pending()
    assert derived.is_pending()
    derived.set_value(sum(range(n)))
    assert not derived.is_pending()
    # Strong deps must ALL be fresh again to re-pend: one update is not enough.
    sources[n // 2].set_value(123)
    assert not derived.is_pending()
    for i, s in enumerate(sources):
        s.set_value(i + 1)
    assert derived.is_pending()


@pytest.mark.parametrize("n", [16, 17, 40])
def test_many_weak_dependencies_bitpacking(n):
    sources = [Signal() for _ in range(n)]
    derived = Signal()
    for s in sources:
        derived.add_dependency(s, weak=True)
    for s in sources:
        s.set_value(0)
    assert derived.is_pending()
    derived.set_value(1)
    # Pending is notification-driven: after consuming, no notification is
    # outstanding, so the signal is not pending even though all weak deps
    # remain computed.
    assert not derived.is_pending()
    # A single weak update re-pends (weak deps only need computed, not fresh).
    sources[0].set_value(5)
    assert derived.is_pending()
