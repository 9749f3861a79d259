"""Reference-parity tests for utils: depth, rotation indices, expectation
values, and the ansatz white-box suite.

Ports test/utils/test_utilityfunctions.py (multi_qubit_gate_depth cases
:the TestMultiQubitGateDepth class; find_rotation_indices; expectation
values) and test/utils/test_ansatzes.py (parameter/axis/gate-type
white-box tests).
"""

import numpy as np
import pytest

from adaptaqc_tpu import (AdaptCompiler, AdaptConfig, MPSBackend,
                          SamplingBackend, SVBackend, Circuit)
from adaptaqc_tpu.circuits import operations as co
from adaptaqc_tpu.compilers.approximate_compiler import (
    calculate_overlap_between_circuits)
from adaptaqc_tpu.utils import ansatzes as ans

ANSATZ_LIST = [ans.u4, ans.thinly_dressed_cnot, ans.fully_dressed_cnot,
               ans.identity_resolvable, ans.heisenberg]


# -------------------------------------------- multi_qubit_gate_depth cases
def test_depth_no_gates_is_zero():
    assert Circuit(3).multi_qubit_gate_depth() == 0


def test_depth_single_qubit_gates_is_zero():
    qc = Circuit(3)
    qc.rx(0.3, 0)
    qc.ry(0.2, 1)
    qc.rz(0.1, 2)
    assert qc.multi_qubit_gate_depth() == 0


def test_depth_single_cnot_is_one():
    qc = Circuit(3)
    qc.cx(0, 1)
    assert qc.multi_qubit_gate_depth() == 1


def test_depth_overlapping_cnots_is_two():
    qc = Circuit(3)
    qc.cx(0, 1)
    qc.cx(1, 2)
    assert qc.multi_qubit_gate_depth() == 2


def test_depth_disjoint_cnots_is_one():
    qc = Circuit(4)
    qc.cx(0, 1)
    qc.cx(2, 3)
    assert qc.multi_qubit_gate_depth() == 1


def test_depth_cnot_and_1q_gates_is_one():
    qc = Circuit(2)
    qc.rx(0.2, 0)
    qc.cx(0, 1)
    qc.ry(0.4, 1)
    assert qc.multi_qubit_gate_depth() == 1


def test_depth_nested_cnots_is_three():
    # cx(0,3) after cx(1,2) after cx(0,1): qubit chains force depth 3
    qc = Circuit(4)
    qc.cx(0, 1)
    qc.cx(1, 2)
    qc.cx(2, 3)
    assert qc.multi_qubit_gate_depth() == 3


def test_find_rotation_indices():
    qc = Circuit(2)
    qc.rx(0.1, 0)       # 0 rotation
    qc.cx(0, 1)         # 1
    qc.ry(0.2, 1)       # 2 rotation
    qc.cz(0, 1)         # 3
    qc.rz(0.3, 0)       # 4 rotation
    assert co.find_rotation_indices(qc, [0, 1, 2, 3, 4]) == [0, 2, 4]
    assert co.find_rotation_indices(qc, [1, 3]) == []


# --------------------------------------------------- expectation values
def _evals(backend, qc):
    compiler = AdaptCompiler(qc, backend=backend)
    return backend.measure_qubit_expectation_values(compiler)


def test_sv_zero_state_z_expectations_are_one():
    vals = _evals(SVBackend(), Circuit(3))
    assert np.allclose(vals, [1, 1, 1], atol=1e-7)


def test_sv_flipped_qubit_z_expectation_is_minus_one():
    qc = Circuit(3)
    qc.x(1)
    vals = _evals(SVBackend(), qc)
    assert np.allclose(vals, [1, -1, 1], atol=1e-7)


def test_sampling_zero_state_z_expectations_are_one():
    vals = _evals(SamplingBackend(), Circuit(3))
    assert np.allclose(vals, [1, 1, 1], atol=0.05)


def test_sampling_mixed_z_expectations():
    qc = Circuit(3)
    qc.x(0)
    qc.h(2)
    vals = _evals(SamplingBackend(), qc)
    assert np.allclose(vals, [-1, 1, 0], atol=0.08)


# ------------------------------------------------------- ansatz white-box
@pytest.mark.parametrize("ansatz", ANSATZ_LIST, ids=lambda a: a.__name__)
def test_custom_ansatz_add_layer_changes_parameters(ansatz):
    qc = co.create_random_initial_state_circuit(3, seed=0)
    compiler = AdaptCompiler(qc, backend=SVBackend(),
                             custom_layer_2q_gate=ansatz())
    compiler._add_layer(0)
    block = compiler.full_circuit.data[-len(ansatz().data):]
    params = [g.params[0] for g in block if g.name != "cx"]
    assert any(p != 0.0 for p in params)


@pytest.mark.parametrize("ansatz,cnots", [
    (ans.u4, [6, 9, 11]),
    (ans.thinly_dressed_cnot, [2]),
    (ans.fully_dressed_cnot, [6]),
    (ans.identity_resolvable, [2, 5]),
], ids=lambda a: getattr(a, "__name__", str(a)))
def test_custom_ansatz_gate_types_as_expected(ansatz, cnots):
    qc = co.create_random_initial_state_circuit(3, seed=2)
    compiler = AdaptCompiler(qc, backend=SVBackend(),
                             custom_layer_2q_gate=ansatz())
    compiler._add_layer(0)
    compiler._add_layer(1)
    block = compiler.full_circuit.data[-len(ansatz().data):]
    for i in cnots:
        assert block[i].name == "cx"


@pytest.mark.parametrize("ansatz", ANSATZ_LIST, ids=lambda a: a.__name__)
def test_rotoselect_false_keeps_rotation_axes(ansatz):
    qc = co.create_random_initial_state_circuit(3, seed=3)
    compiler = AdaptCompiler(qc, backend=SVBackend(),
                             custom_layer_2q_gate=ansatz(),
                             use_rotoselect=False)
    compiler._add_layer(0)
    compiler._add_layer(1)
    block = compiler.full_circuit.data[-len(ansatz().data):]
    for built, template in zip(block, ansatz().data):
        assert built.name == template.name


@pytest.mark.parametrize("ansatz", [ans.u4, ans.fully_dressed_cnot],
                         ids=lambda a: a.__name__)
def test_u4_and_fully_dressed_compile_without_rotoselect(ansatz):
    qc = co.create_random_initial_state_circuit(3, seed=5)
    compiler = AdaptCompiler(qc, backend=SVBackend(),
                             custom_layer_2q_gate=ansatz(),
                             use_rotoselect=False)
    result = compiler.compile()
    assert calculate_overlap_between_circuits(qc, result.circuit) > 0.99


def test_heisenberg_ansatz_compiles_heisenberg_structured_state():
    # analogue of the reference's XXX-Trotter target (test_ansatzes.py:175):
    # a Neel-start state evolved by heisenberg() blocks with fixed angles
    qc = Circuit(4)
    qc.x(0)
    qc.x(2)
    rng = np.random.default_rng(0)
    for pair in [(0, 1), (2, 3), (1, 2), (0, 1), (2, 3)]:
        block = ans.heisenberg()
        for instr in block.data:
            mapped = tuple(pair[q] for q in instr.qubits)
            params = tuple(rng.uniform(-0.4, 0.4) for _ in instr.params)
            qc.data.append(type(instr)(instr.name, mapped, params,
                                       label=instr.label))
    compiler = AdaptCompiler(qc, backend=SVBackend(),
                             custom_layer_2q_gate=ans.heisenberg(),
                             use_rotoselect=False)
    result = compiler.compile()
    assert calculate_overlap_between_circuits(qc, result.circuit) > 0.99


def test_custom_ansatz_mps_backend_layers_cached():
    # reference test_ansatzes.py:86-104: with absorption active, the working
    # circuit holds the set_mps prefix plus exactly one active layer
    for ansatz in [ans.thinly_dressed_cnot, ans.identity_resolvable]:
        qc = co.create_random_initial_state_circuit(3, seed=1)
        compiler = AdaptCompiler(
            qc, backend=MPSBackend(), custom_layer_2q_gate=ansatz(),
            adapt_config=AdaptConfig(max_layers_to_modify=2))
        compiler._add_layer(0)
        assert len(compiler.full_circuit.data) == 1 + len(ansatz().data)
        compiler._add_layer(1)
        assert len(compiler.full_circuit.data) == 1 + len(ansatz().data)
