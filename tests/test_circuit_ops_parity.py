"""Reference-parity unit tests for circuits/operations.py, mirroring
test/utils/circuit_operations/test_circuit_operations_basic.py and
...full_circuit.py cases not already covered elsewhere."""

import numpy as np
import pytest

from adaptaqc_tpu import Circuit, MPSBackend
from adaptaqc_tpu.circuits import operations as co
from adaptaqc_tpu.circuits.circuit import (create_1q_gate, create_2q_gate,
                                           Instruction)

from reference_sim import simulate


def test_create_1q_gate_properties():
    g = create_1q_gate("rx", 0.7, qubit=2)
    assert (g.name, g.qubits, g.params, g.label) == ("rx", (2,), (0.7,), "rx")
    with pytest.raises(ValueError):
        create_1q_gate("rq", 0.1, 0)


def test_create_2q_gate_properties():
    g = create_2q_gate("cx", 0, 1)
    assert (g.name, g.qubits) == ("cx", (0, 1))
    with pytest.raises(ValueError):
        create_2q_gate("cc", 0, 1)


def test_add_gate_at_index():
    qc = Circuit(2)
    qc.rx(0.1, 0)
    qc.rx(0.2, 0)
    co.add_gate(qc, create_1q_gate("ry", 0.9, 1), gate_index=1)
    assert [i.name for i in qc.data] == ["rx", "ry", "rx"]
    assert qc.data[1].params[0] == 0.9


def test_replace_1q_gate_keeps_position():
    qc = Circuit(2)
    qc.rx(0.1, 0)
    qc.cx(0, 1)
    co.replace_1q_gate(qc, 0, "rz", 1.2)
    assert qc.data[0].name == "rz"
    assert qc.data[0].params[0] == 1.2
    assert qc.data[1].name == "cx"


def test_replace_2q_gate_changes_qubits():
    qc = Circuit(3)
    qc.cx(0, 1)
    co.replace_2q_gate(qc, 0, 1, 2)
    assert qc.data[0].qubits == (1, 2)


def test_is_supported_1q_gate():
    assert co.is_supported_1q_gate(create_1q_gate("rx", 0.3, 0))
    assert not co.is_supported_1q_gate(create_2q_gate("cx", 0, 1))
    fixed = Instruction("rx", (0,), (0.2,), label="fixed")
    assert not co.is_supported_1q_gate(fixed)


def test_thinly_dressed_cnot_structure():
    qc = Circuit(2)
    co.add_dressed_cnot(qc, 0, 1, thinly_dressed=True)
    names = [i.name for i in qc.data]
    assert names.count("cx") == 1
    # 1 rotation per qubit on each side of the cx (basic.py:148-189)
    assert len(names) == 5
    assert names[2] == "cx"


def test_fully_dressed_cnot_structure():
    qc = Circuit(2)
    co.add_dressed_cnot(qc, 0, 1, thinly_dressed=False)
    names = [i.name for i in qc.data]
    assert names.count("cx") == 1
    # 3 rotations (rz ry rz) per qubit per side
    assert len(names) == 13


def test_dressed_cnot_v_flags_control_sides():
    qc = Circuit(2)
    co.add_dressed_cnot(qc, 0, 1, thinly_dressed=True, v1=False, v2=False)
    names = [i.name for i in qc.data]
    # v1/v2 False: no pre-rotations, only the cx and the post rotations
    assert names[0] == "cx"
    assert len(names) == 3


def test_remove_and_add_classical_operations_roundtrip():
    qc = Circuit(3)
    qc.rx(0.4, 0)
    qc.measure(0, 0)
    qc.ry(0.2, 1)
    qc.measure(1, 1)
    removed = co.remove_classical_operations(qc)
    assert all(i.name != "measure" for i in qc.data)
    assert len(removed) == 2
    co.add_classical_operations(qc, removed)
    measures = [(i, instr) for i, instr in enumerate(qc.data)
                if instr.name == "measure"]
    assert [i for i, _ in measures] == [1, 3]


def test_find_num_gates_with_range():
    qc = Circuit(3)
    qc.rx(0.1, 0)
    qc.cx(0, 1)
    qc.ry(0.2, 2)
    qc.cz(1, 2)
    qc.rz(0.3, 0)
    assert co.find_num_gates(qc) == (2, 3)
    assert co.find_num_gates(qc, gate_range=(1, 4)) == (2, 1)


def test_remove_inner_circuit():
    qc = Circuit(2)
    qc.rx(0.1, 0)
    qc.cx(0, 1)
    qc.ry(0.2, 1)
    co.remove_inner_circuit(qc, (1, 2))
    assert [i.name for i in qc.data] == ["rx", "ry"]


def test_initial_state_to_circuit_prepares_state():
    vec = np.array([0.6, 0.8j], dtype=complex)
    qc = co.initial_state_to_circuit(vec)
    sv = simulate(qc)
    assert abs(np.vdot(sv, vec)) ** 2 == pytest.approx(1.0, abs=1e-6)


def test_mps_backends_with_different_trunc_give_different_states():
    # reference test_circuit_operations_running.py: mps sims with different
    # truncation settings produce different MPS
    rng = np.random.default_rng(5)
    qc = Circuit(4)
    for q in range(4):
        qc.ry(float(rng.uniform(-2, 2)), q)
    for q in range(3):
        qc.cx(q, q + 1)
        qc.ry(float(rng.uniform(-2, 2)), q + 1)
    for q in range(3):
        qc.cx(q, q + 1)

    from adaptaqc_tpu.backends import mps_core
    from adaptaqc_tpu.circuits.tape import compile_tape
    import jax.numpy as jnp

    tape = compile_tape(qc)

    def run(chi, thr):
        return mps_core.apply_tape(
            mps_core.zero_mps(4, chi), jnp.asarray(tape.kinds),
            jnp.asarray(tape.q0), jnp.asarray(tape.q1),
            jnp.asarray(tape.angles), thr)

    exact = mps_core.to_dense(run(8, 1e-16))
    capped_mps = run(2, 1e-16)
    capped = mps_core.to_dense(capped_mps)
    thresholded = mps_core.to_dense(run(8, 0.3))
    ov_cap = abs(np.vdot(exact, capped)) ** 2
    ov_thr = abs(np.vdot(exact, thresholded)) ** 2
    assert ov_cap < 1.0 - 1e-4
    assert ov_thr < 1.0 - 1e-4
    assert float(capped_mps.trunc) > 0
