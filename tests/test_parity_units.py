"""Additional unit parity tests against reference utility behaviours
(reference test/utils/* and test/utils/circuit_operations/*): division
helpers, parameterised-gate variable system, trig helpers, depth and
degeneracy utilities."""

import numpy as np

from adaptaqc_tpu import Circuit
from adaptaqc_tpu.circuits import operations as co
from adaptaqc_tpu.circuits.division import calculate_next_gate_indexes
from adaptaqc_tpu.circuits.peephole import find_previous_gate_on_qubit
from adaptaqc_tpu.optim.sinusoidal import (has_stopped_improving,
                                           normalized_angles)
from adaptaqc_tpu.utils.utilityfunctions import (
    get_distinct_items_and_degeneracies)

from reference_sim import simulate


def test_find_previous_gate_on_qubit():
    """peephole scan helper (ref circuit_division.py:19-42)."""
    qc = Circuit(3)
    qc.h(0)          # 0
    qc.cx(0, 1)      # 1
    qc.rz(0.3, 2)    # 2
    qc.cx(1, 2)      # 3
    instr, idx = find_previous_gate_on_qubit(qc, 3)
    assert idx == 2 and instr.name == "rz"  # qubit 2's previous gate
    instr, idx = find_previous_gate_on_qubit(qc, 1)
    assert idx == 0 and instr.name == "h"
    instr, idx = find_previous_gate_on_qubit(qc, 0)
    assert instr is None and idx is None


def test_calculate_next_gate_indexes_depth_slicing():
    """Depth budget counts gate levels per qubit (ref :61-89)."""
    qc = Circuit(2)
    qc.h(0)          # level 1 on q0
    qc.h(1)          # level 1 on q1
    qc.cx(0, 1)      # level 2
    qc.h(0)          # level 3
    assert calculate_next_gate_indexes(qc, 0, 1) == 2
    assert calculate_next_gate_indexes(qc, 0, 2) == 3
    assert calculate_next_gate_indexes(qc, 0, 3) == 4


def test_parameterised_gate_variable_system():
    """#var independent / @expr dependent gates re-evaluate together
    (ref basic.py:208-262)."""
    qc = Circuit(1)
    g = co.create_independent_parameterised_gate("rx", "a", angle=0.5)
    g.qubits = (0,)
    qc.data.append(g)
    d = co.create_dependent_parameterised_gate("rz", "2*a")
    d.qubits = (0,)
    qc.data.append(d)
    values = co.calculate_independent_variable_values(qc)
    assert values == {"a": 0.5}
    co.reevaluate_dependent_parameterised_gates(qc, values)
    assert abs(qc.data[1].params[0] - 1.0) < 1e-12

    # subscripting renames variables consistently in labels and equations
    co.add_subscript_to_all_variables(qc, 3)
    assert qc.data[0].label == "rx#a_3"
    assert qc.data[1].label == "rz@2*a_3"
    values = co.calculate_independent_variable_values(qc)
    co.reevaluate_dependent_parameterised_gates(qc, values)
    assert abs(qc.data[1].params[0] - 1.0) < 1e-12


def test_normalized_angles_range():
    """Angles wrap into [-pi, pi) (ref utilityfunctions.py:98-116)."""
    angles = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -2.5 * np.pi, 0.3])
    out = np.asarray(normalized_angles(angles))
    assert np.all(out >= -np.pi - 1e-9) and np.all(out < np.pi + 1e-9)
    # wrapping preserves the rotation modulo 2 pi
    np.testing.assert_allclose(np.cos(out), np.cos(angles), atol=1e-9)
    np.testing.assert_allclose(np.sin(out), np.sin(angles), atol=1e-9)


def test_has_stopped_improving_linear_fit():
    """Relative slope criterion (ref utilityfunctions.py:272-278)."""
    assert has_stopped_improving([0.5, 0.5, 0.5], 1e-2)
    assert not has_stopped_improving([0.5, 0.4, 0.3], 1e-2)
    assert has_stopped_improving([0.3, 0.4, 0.5], 1e-2)  # worsening
    # improvement below tolerance counts as stopped
    assert has_stopped_improving([0.5, 0.49999, 0.49998], 1e-2)


def test_get_distinct_items_and_degeneracies():
    items = ["a", "b", "a", "c", "b", "a"]
    distinct, degs = get_distinct_items_and_degeneracies(items)
    assert dict(zip(distinct, degs)) == {"a": 3, "b": 2, "c": 1}


def test_multi_qubit_gate_depth():
    qc = Circuit(3)
    qc.h(0)
    qc.cx(0, 1)
    qc.cx(1, 2)
    qc.cx(0, 1)
    qc.rz(0.1, 2)
    assert qc.multi_qubit_gate_depth() == 3
    qc2 = Circuit(3)
    qc2.cx(0, 1)
    qc2.cx(1, 2)  # shares qubit 1 -> sequential
    qc2.cx(0, 2)
    assert qc2.multi_qubit_gate_depth() == 3
    qc3 = Circuit(4)
    qc3.cx(0, 1)
    qc3.cx(2, 3)  # disjoint -> parallel
    assert qc3.multi_qubit_gate_depth() == 1


def test_are_circuits_identical_angle_tolerance():
    a = Circuit(2)
    a.rx(0.5, 0)
    a.cx(0, 1)
    b = Circuit(2)
    b.rx(0.5, 0)
    b.cx(0, 1)
    assert co.are_circuits_identical(a, b)
    c = Circuit(2)
    c.rx(0.6, 0)
    c.cx(0, 1)
    assert not co.are_circuits_identical(a, c)
    d = Circuit(2)
    d.cx(0, 1)
    d.rx(0.5, 0)  # different order
    assert not co.are_circuits_identical(a, d)


def test_remove_permutations_keeps_order_and_uniqueness():
    """(ref test_given_coupling_map_with_permutations_*): first occurrence
    wins, original order preserved."""
    cmap = [(0, 1), (1, 0), (2, 3), (1, 2), (3, 2), (0, 1)]
    out = co.remove_permutations_from_coupling_map(cmap)
    assert out == [(0, 1), (2, 3), (1, 2)]


def test_ghz_compilation():
    """Compile a GHZ state on both engines (ref test_GHZ)."""
    from adaptaqc_tpu import AdaptCompiler, MPSBackend
    n = 4
    qc = Circuit(n)
    qc.h(0)
    for q in range(n - 1):
        qc.cx(q, q + 1)
    for backend in (None, MPSBackend(max_chi=8)):
        kwargs = {"backend": backend} if backend is not None else {}
        result = AdaptCompiler(qc.copy(), **kwargs).compile()
        assert result.overlap > 0.99
        sv_t = simulate(qc)
        sv_s = simulate(co.make_quantum_only_circuit(result.circuit))
        assert abs(np.vdot(sv_t, sv_s)) ** 2 > 0.97


def test_adapt_result_fields_consistent():
    """exact_overlap (SV backend) matches an independent statevector
    overlap, and the recorded cnot depth matches the returned circuit
    (ref test_exact_overlap_*, test_cnot_depth_in_adapt_result_correct)."""
    from adaptaqc_tpu import AdaptCompiler
    from test_sv_core import random_circuit
    qc = random_circuit(3, 10, np.random.default_rng(44))
    result = AdaptCompiler(qc).compile()
    assert isinstance(result.exact_overlap, float)
    sv_t = simulate(co.make_quantum_only_circuit(qc))
    sv_s = simulate(co.make_quantum_only_circuit(result.circuit))
    independent = abs(np.vdot(sv_t, sv_s)) ** 2
    assert abs(result.exact_overlap - independent) < 1e-5
    assert abs(result.exact_overlap - result.overlap) < 5e-3
    assert result.cnot_depth_history[-1] == \
        co.make_quantum_only_circuit(result.circuit).multi_qubit_gate_depth()


def test_expectation_values_callable_twice():
    """Backend e-val queries are side-effect free (ref
    test_given_circuit_when_mps_expectation_value_then_callable_twice)."""
    from adaptaqc_tpu import AdaptCompiler, MPSBackend
    from test_sv_core import random_circuit
    qc = random_circuit(3, 8, np.random.default_rng(45))
    compiler = AdaptCompiler(qc, backend=MPSBackend(max_chi=8))
    first = compiler.backend.measure_qubit_expectation_values(compiler)
    second = compiler.backend.measure_qubit_expectation_values(compiler)
    np.testing.assert_allclose(first, second, atol=1e-7)


def test_get_initial_layout_identity():
    from adaptaqc_tpu.utils.constants import get_initial_layout
    qc = Circuit(5)
    assert get_initial_layout(qc) == {q: q for q in range(5)}


def test_subscripted_custom_layer_compiles_distinct_variables():
    """AdaptCompiler subscripts the custom layer's variables per layer so
    parameterised layers stay independent (ref adapt_compiler.py get_layer
    + number-preserving ansatz flow)."""
    from adaptaqc_tpu import AdaptCompiler, AdaptConfig
    layer = Circuit(2)
    g = co.create_independent_parameterised_gate("ry", "t", angle=0.1)
    g.qubits = (0,)
    layer.data.append(g)
    d = co.create_dependent_parameterised_gate("ry", "-t")
    d.qubits = (1,)
    layer.data.append(d)
    layer.cx(0, 1)
    qc = Circuit(2)
    qc.ry(0.7, 0)
    qc.cx(0, 1)
    compiler = AdaptCompiler(qc, custom_layer_2q_gate=layer,
                             adapt_config=AdaptConfig(max_layers=3))
    # distinct per-layer variable names are created by subscripting
    l0 = compiler.get_layer_2q_gate(0)
    l1 = compiler.get_layer_2q_gate(1)
    assert l0.data[0].label == "ry#t_0"
    assert l1.data[0].label == "ry#t_1"
    assert l0.data[1].label == "ry@-t_0"
    result = compiler.compile()
    assert result.overlap > 0.5  # parameterised host path still optimises
