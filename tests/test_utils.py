"""Unit tests for the utils layer (reference test strategy item 8: one test
per util module, direct input/output checks)."""

import numpy as np
import pytest

from adaptaqc_tpu.circuits.circuit import Circuit
from adaptaqc_tpu.circuits import qasm
from adaptaqc_tpu.circuits.division import vertically_divide_circuit
from adaptaqc_tpu.circuits.peephole import remove_unnecessary_gates_from_circuit
from adaptaqc_tpu.circuits.pauli_ops import (convert_qubit_op_to_pauli_dict,
                                             expectation_value_of_pauli_operator)
from adaptaqc_tpu.utils import constants as vc
from adaptaqc_tpu.utils import gate_tomography as gt
from adaptaqc_tpu.utils import hamiltonians as ham
from adaptaqc_tpu.utils.entanglement_measures import (concurrence, eof,
                                                      negativity, partial_trace)
from adaptaqc_tpu.utils import utilityfunctions as uf
from adaptaqc_tpu.utils.fixed_ansatz_circuits import (custom_ansatz,
                                                      hardware_efficient_circuit,
                                                      number_preserving_ansatz)

from reference_sim import apply_1q, apply_2q, simulate
from test_sv_core import random_circuit


def test_coupling_maps():
    assert vc.coupling_map_linear(4) == [(0, 1), (1, 2), (2, 3)]
    assert vc.coupling_map_linear(3, loop=True) == [(0, 1), (1, 2), (2, 0)]
    full = vc.coupling_map_fully_entangled(4)
    assert len(full) == 6
    ladder = vc.coupling_map_ladder(5)
    assert ladder == [(0, 1), (2, 3), (1, 2), (3, 4)]
    both = vc.coupling_map_linear(3, both_dir=True)
    assert (1, 0) in both


def test_entanglement_measures_bell():
    bell = np.zeros(4, dtype=complex)
    bell[0] = bell[3] = 1 / np.sqrt(2)
    rho = np.outer(bell, bell.conj())
    assert abs(concurrence(rho) - 1.0) < 1e-8
    assert abs(eof(rho) - 1.0) < 1e-8
    assert abs(negativity(rho) - 0.5) < 1e-6
    prod = np.zeros(4, dtype=complex)
    prod[0] = 1
    rho_p = np.outer(prod, prod.conj())
    assert concurrence(rho_p) < 1e-10


def test_partial_trace_matches_engine():
    rng = np.random.default_rng(0)
    qc = random_circuit(4, 15, rng)
    sv = simulate(qc)
    from adaptaqc_tpu.backends import sv_core
    from adaptaqc_tpu.ops import cplx
    rho_host = partial_trace(sv, 1, 3)
    rho_dev = cplx.to_np(sv_core.rdm2(sv_core.state_from_vector(sv), 1, 3))
    np.testing.assert_allclose(rho_host, rho_dev, atol=1e-8)


def test_gate_tomography_reconstructs_cost():
    # cost function of 2 rotation angles from an actual circuit
    rng = np.random.default_rng(1)
    base = random_circuit(2, 6, rng)
    base.ry(0.0, 0)
    base.rx(0.0, 1)
    i0, i1 = len(base.data) - 2, len(base.data) - 1

    def cost(a0, a1):
        qc = base.copy()
        qc.data[i0].params = (a0,)
        qc.data[i1].params = (a1,)
        return 1 - abs(simulate(qc)[0]) ** 2

    grid = gt.angle_sets_to_evaluate(2)
    measurements = [cost(*row) for row in grid]
    coeffs = gt.measurements_to_zero_delta_pi_bases(measurements)
    for a0, a1 in [(0.3, -1.2), (2.0, 0.7), (-2.5, 3.0)]:
        assert abs(gt.reconstructed_cost([a0, a1], coeffs) - cost(a0, a1)) < 1e-8


def test_hamiltonians_ground_state():
    h = ham.heisenberg_hamiltonian(n=2, jx=1.0)
    energy, wf = ham.calculate_ground_state(h, 2)
    # H = -X0X1: ground energy -1
    assert abs(energy - (-1.0)) < 1e-10
    h2 = ham.heisenberg_hamiltonian(n=3, jx=0.5, jz=0.3, hz=0.1)
    m = ham.hamiltonian_matrix(h2, 3)
    np.testing.assert_allclose(m, m.conj().T, atol=1e-12)


def test_anderson_hamiltonian_hermitian():
    h = ham.anderson_model_qubit_hamiltonian()
    n = 4
    m = ham.hamiltonian_matrix(h, n)
    np.testing.assert_allclose(m, m.conj().T, atol=1e-10)
    # interaction U present
    assert any("Z" in t for t in h)


def test_pauli_expectation():
    from adaptaqc_tpu.backends.backend import SVBackend
    qc = Circuit(2)
    qc.x(0)
    op = {"X0": 0.7, "Z0": 1.0, "Z1": 2.0, "": 0.5}
    pauli_dict = convert_qubit_op_to_pauli_dict(op)
    assert pauli_dict == {"IX": 0.7, "IZ": 1.0, "ZI": 2.0, "II": 0.5}
    val = expectation_value_of_pauli_operator(qc, pauli_dict, SVBackend())
    # <X0>=0, <Z0>=-1, <Z1>=1, identity 0.5
    assert abs(val - (0.5 - 1.0 + 2.0)) < 1e-6


def test_fixed_ansatz_factories():
    qc = hardware_efficient_circuit(3, "rxry", 2)
    assert qc.num_2q_gates() == 4
    assert sum(1 for i in qc.data if len(i.qubits) == 1) == 12
    fixed = hardware_efficient_circuit(3, "ry", 1, gates_to_fix={0: 0.5},
                                       gates_to_remove=[1])
    assert fixed.data[0].label == vc.FIXED_GATE_LABEL
    assert fixed.data[0].params[0] == 0.5
    npa = number_preserving_ansatz(4, 1)
    # dependent gates re-evaluate when independents change
    from adaptaqc_tpu.circuits import operations as co
    angles = co.find_angles_in_circuit(npa)
    co.update_angles_in_circuit(npa, [0.3] * len(angles))
    dep = [i for i in npa.data if i.label and "@" in i.label]
    assert dep and all(abs(i.params[0] + 0.3) < 1e-12 for i in dep)
    ca = custom_ansatz(4, Circuit(2).cx(0, 1), 2)
    assert ca.num_2q_gates() == 2 * len(vc.coupling_map_ladder(4))


def test_vertical_division():
    rng = np.random.default_rng(2)
    qc = random_circuit(3, 25, rng)
    parts = vertically_divide_circuit(qc, 4)
    assert all(p.depth() <= 4 for p in parts)
    assert sum(len(p.data) for p in parts) == len(qc.data)
    # concatenation preserves the state
    merged = Circuit(3)
    for p in parts:
        merged.data.extend(i.copy() for i in p.data)
    np.testing.assert_allclose(simulate(merged), simulate(qc), atol=1e-12)


def _reference_divide_oracle(qc, cap):
    """Faithful re-execution of the reference's division loop
    (circuit_division.py:104-144) as a test oracle: per-bit level table over
    qubits+clbits, updated UNCONDITIONALLY per scanned gate; append iff
    max(levels over ALL bits) <= cap; early-break iff min(levels) >= cap.
    Returns block boundaries as lists of original gate indices."""
    nc = max([qc.num_clbits] + [c + 1 for i in qc.data for c in i.clbits])
    remaining = list(range(len(qc.data)))
    blocks = []
    while remaining:
        levels = [0] * (qc.num_qubits + nc)
        taken = []
        for idx in remaining:
            instr = qc.data[idx]
            bits = (list(instr.qubits)
                    + [qc.num_qubits + c for c in instr.clbits])
            lvl = max((levels[b] for b in bits), default=0) + 1
            for b in bits:
                levels[b] = lvl  # unconditional, even when skipped
            if max(levels) <= cap:
                taken.append(idx)
            elif min(levels) >= cap:
                break
        blocks.append(taken)
        remaining = [i for i in remaining if i not in taken]
    return blocks


def test_reference_block_boundaries_nonlayered():
    """White-box parity on a NON-layered circuit (VERDICT r2 item 6): the
    reference never packs depth-compatible gates past the first overflow —
    a skipped gate's level update inflates max(next_gate_indexes) above the
    cap for the rest of the block scan (circuit_division.py:117-139)."""
    qc = Circuit(4)
    for _ in range(3):
        qc.rx(0.1, 0)   # serial chain saturates depth on q0
    qc.cx(0, 1)
    qc.rx(0.2, 2)       # depth-1 parallel gate AFTER the deep chain
    qc.cx(2, 3)
    qc.rx(0.3, 3)
    oracle = _reference_divide_oracle(qc, 2)
    # the parallel rx(q2) at index 4 must NOT ride in block 0
    assert oracle == [[0, 1], [2, 3, 4, 5], [6]]
    parts = vertically_divide_circuit(qc, 2)
    got = []
    pos = 0
    for p in parts:
        got.append(list(range(pos, pos + len(p.data))))
        pos += len(p.data)
    assert got == oracle
    # randomized cross-check: boundaries identical on irregular circuits
    rng = np.random.default_rng(7)
    for trial in range(5):
        rqc = random_circuit(4, 30, rng)
        oracle = _reference_divide_oracle(rqc, 3)
        parts = vertically_divide_circuit(rqc, 3)
        assert [len(b) for b in oracle] == [len(p.data) for p in parts]


def test_division_tracks_clbit_dependencies():
    """Two measures into the same clbit serialize through the clbit level
    (reference circuit_division.py:76-90 indexes clbits after qubits)."""
    qc = Circuit(3, 1)
    qc.measure(0, 0)
    qc.measure(1, 0)  # same clbit: depth 2 even though qubits differ
    qc.measure(2, 0)
    parts = vertically_divide_circuit(qc, 2)
    assert [len(p.data) for p in parts] == [2, 1]


def test_peephole_preserves_state():
    rng = np.random.default_rng(3)
    qc = random_circuit(3, 30, rng)
    qc.cx(0, 1)
    qc.cx(0, 1)  # cancellable pair
    qc.rz(0.0, 2)  # zero gate
    before = simulate(qc)
    n_before = len(qc.data)
    remove_unnecessary_gates_from_circuit(qc, True, False)
    after = simulate(qc)
    assert len(qc.data) < n_before
    assert abs(abs(np.vdot(before, after)) - 1.0) < 1e-8


def test_qasm_roundtrip():
    rng = np.random.default_rng(4)
    qc = random_circuit(3, 15, rng)
    qc.measure(0, 0)
    qc.num_clbits = 1
    text = qasm.dumps(qc)
    qc2 = qasm.loads(text)
    assert len(qc2.data) == len(qc.data)
    np.testing.assert_allclose(simulate(qc2), simulate(qc), atol=1e-12)


def test_qasm_loads_reference_gate_set():
    """Interop (VERDICT r2 item 7): QASM exported by the reference via
    qiskit.qasm2 uses qelib1 gates outside dumps()'s table (u/u1/u2/p, sx,
    rzz, cp/cu1, crz, cy, ch, ccx, multiple registers). Parse one such
    circuit and check the simulated state against an independent
    qiskit-convention matrix oracle, up to global phase."""
    text = """OPENQASM 2.0;
include "qelib1.inc";
qreg a[2];
qreg b[2];
creg c[1];
u(0.3,0.4,0.5) a[0];
u3(0.2,-0.1,0.7) a[1];
u2(0.25,-0.6) b[0];
u1(0.8) b[1];
p(-0.35) a[0];
id b[0];
sx a[1];
sxdg b[1];
rzz(0.45) a[0],b[0];
cp(0.6) a[1],b[1];
cu1(-0.3) b[0],a[0];
crz(0.9) a[0],a[1];
cy b[1],b[0];
ch a[0],b[1];
ccx a[0],a[1],b[0];
swap a[0],b[1];
measure a[0] -> c[0];
"""
    qc = qasm.loads(text)
    assert qc.num_qubits == 4 and qc.num_clbits == 1
    assert qc.data[-1].name == "measure" and qc.data[-1].qubits == (0,)

    # independent oracle: standard qiskit-convention matrices
    def u3m(t, p, l):
        return np.array([
            [np.cos(t / 2), -np.exp(1j * l) * np.sin(t / 2)],
            [np.exp(1j * p) * np.sin(t / 2), np.exp(1j * (p + l)) * np.cos(t / 2)]])

    def ctrl(u):
        m = np.eye(4, dtype=complex)
        m[2:, 2:] = u  # index r = 2*b(control) + b(target)
        return m

    def apply_ct(sv, m_ct, c, tq, n):
        """Apply a 4x4 in r=2*b(c)+b(t) indexing via apply_2q's
        r=2*b(max)+b(min) convention."""
        if c < tq:  # swap the local bit roles
            P = np.eye(4)[[0, 2, 1, 3]]
            m_ct = P @ m_ct @ P
        return apply_2q(sv, m_ct, min(c, tq), max(c, tq), n)

    pi = np.pi
    Y = np.array([[0, -1j], [1j, 0]])
    H = np.array([[1, 1], [1, -1]], dtype=complex) / np.sqrt(2)
    SX = 0.5 * np.array([[1 + 1j, 1 - 1j], [1 - 1j, 1 + 1j]])
    t = 0.45
    rzz = np.diag([np.exp(-1j * t / 2), np.exp(1j * t / 2),
                   np.exp(1j * t / 2), np.exp(-1j * t / 2)])
    n = 4
    sv = np.zeros(2 ** n, dtype=complex)
    sv[0] = 1.0
    for u, q in [(u3m(0.3, 0.4, 0.5), 0), (u3m(0.2, -0.1, 0.7), 1),
                 (u3m(pi / 2, 0.25, -0.6), 2), (np.diag([1, np.exp(0.8j)]), 3),
                 (np.diag([1, np.exp(-0.35j)]), 0), (SX, 1), (SX.conj().T, 3)]:
        sv = apply_1q(sv, u, q, n)
    sv = apply_ct(sv, rzz, 0, 2, n)                                  # rzz a0,b0
    sv = apply_ct(sv, ctrl(np.diag([1, np.exp(0.6j)])), 1, 3, n)     # cp
    sv = apply_ct(sv, ctrl(np.diag([1, np.exp(-0.3j)])), 2, 0, n)    # cu1
    sv = apply_ct(sv, ctrl(np.diag([np.exp(-0.45j), np.exp(0.45j)])), 0, 1, n)
    sv = apply_ct(sv, ctrl(Y), 3, 2, n)                              # cy
    sv = apply_ct(sv, ctrl(H), 0, 3, n)                              # ch
    # ccx 0,1,2: local basis r = 4*b(q2) + 2*b(q1) + b(q0)
    ccx = np.eye(8, dtype=complex)
    ccx[[3, 7]] = ccx[[7, 3]]  # controls q0,q1 set: swap target b(q2)
    psi = sv.reshape([2] * n)
    psi = np.moveaxis(psi, (n - 1 - 2, n - 1 - 1, n - 1 - 0), (0, 1, 2))
    psi = (ccx @ psi.reshape(8, -1)).reshape([2] * n)
    psi = np.moveaxis(psi, (0, 1, 2), (n - 1 - 2, n - 1 - 1, n - 1 - 0))
    sv = psi.reshape(-1)
    swap = np.eye(4, dtype=complex)[[0, 2, 1, 3]]
    sv = apply_2q(sv, swap, 0, 3, n)

    got = simulate(qc)
    fid = abs(np.vdot(sv, got))
    assert fid == pytest.approx(1.0, abs=1e-10), fid


def test_qasm_loads_rejects_unknown():
    with pytest.raises(ValueError):
        qasm.loads('OPENQASM 2.0;\nqreg q[1];\nfoo q[0];\n')
    with pytest.raises(ValueError):
        qasm.loads('OPENQASM 2.0;\ngate g a { x a; }\nqreg q[1];\n')


def test_utilityfunctions_counts():
    sv = np.zeros(4)
    sv[0] = np.sqrt(0.25)
    sv[2] = np.sqrt(0.75)
    counts = uf.counts_data_from_statevector(sv, num_shots=1000)
    # int-cast truncation (matches reference's np.asarray(..., int))
    assert abs(counts["00"] - 250) <= 1 and abs(counts["10"] - 750) <= 1
    evs = uf.expectation_value_of_qubits(counts)
    assert abs(evs[0] - 1.0) < 1e-2
    assert abs(evs[1] - (-0.5)) < 1e-2
    sv2 = uf.statevector_from_counts_data(counts)
    np.testing.assert_allclose(sv2, sv, atol=1e-3)


def test_zero_noise_extrapolate_noiseless():
    from adaptaqc_tpu.circuits.running import zero_noise_extrapolate
    qc = Circuit(2)
    qc.h(0)
    qc.cx(0, 1)

    def measure():
        return 1 - abs(simulate(qc)[0]) ** 2

    # noiseless measurement: extrapolation should return ~ the same value
    val = zero_noise_extrapolate(qc, measure, num_points=5)
    assert abs(val - measure()) < 0.05


def test_chi1_compression_finds_good_product_state():
    """Sequential Gauss-Seidel compression (utils/compression.py) on a
    weakly-entangled state: overlap must beat the trivial |0...0> overlap
    and land near the dominant mean-field value."""
    import jax.numpy as jnp
    from adaptaqc_tpu.backends import mps_core
    from adaptaqc_tpu.circuits.tape import compile_tape
    from adaptaqc_tpu.utils.compression import best_product_state
    rng = np.random.default_rng(3)
    n = 6
    qc = Circuit(n)
    for q in range(n):
        qc.ry(float(rng.uniform(-0.6, 0.6)), q)   # weak rotations
    for q in range(n - 1):
        qc.cx(q, q + 1)
    tape = compile_tape(qc)
    state = mps_core.apply_tape(mps_core.zero_mps(n, 8),
                                jnp.asarray(tape.kinds), jnp.asarray(tape.q0),
                                jnp.asarray(tape.q1), jnp.asarray(tape.angles),
                                1e-12)
    amps = best_product_state(state)
    prod = mps_core.product_mps(np.asarray(amps), 8)
    overlap = abs(complex(*map(float, (mps_core.mps_dot(prod, state).re,
                                       mps_core.mps_dot(prod, state).im))))
    zero_overlap = abs(complex(*map(float,
                                    (mps_core.overlap_with_zero(state).re,
                                     mps_core.overlap_with_zero(state).im))))
    # |0...0> is one of the sweep's starting points, so the result can
    # never be worse than it
    assert overlap >= zero_overlap - 1e-9
    assert overlap > 0.85  # weakly entangled: product approx is good


def test_start_variant_is_global_phase_only():
    """start_variant k>0 re-rolls the leading Rz angles of the starting
    triples; the prepared state must be identical up to global phase while
    the circuit's f32 bit pattern differs (the multi-start retry knob)."""
    from adaptaqc_tpu.utils.compression import product_state_to_circuit
    rng = np.random.default_rng(11)
    amps = rng.normal(size=(4, 2)) + 1j * rng.normal(size=(4, 2))
    amps /= np.linalg.norm(amps, axis=1, keepdims=True)
    qc0 = product_state_to_circuit(amps)
    qc3 = product_state_to_circuit(amps, variant=3)
    lead0 = [i.params[0] for i in qc0.data if i.name == "rz"][::2]
    lead3 = [i.params[0] for i in qc3.data if i.name == "rz"][::2]
    assert all(a == 0.0 for a in lead0)
    assert any(abs(a) > 1e-3 for a in lead3)
    sv0, sv3 = simulate(qc0), simulate(qc3)
    assert abs(np.vdot(sv0, sv3)) == pytest.approx(1.0, abs=1e-9)


def test_chi1_compression_exact_on_product_state():
    from adaptaqc_tpu.backends import mps_core
    from adaptaqc_tpu.utils.compression import best_product_state
    rng = np.random.default_rng(4)
    amps = rng.normal(size=(5, 2)) + 1j * rng.normal(size=(5, 2))
    amps /= np.linalg.norm(amps, axis=1, keepdims=True)
    state = mps_core.product_mps(amps, 4)
    found = best_product_state(state)
    prod = mps_core.product_mps(np.asarray(found), 4)
    dot = mps_core.mps_dot(prod, state)
    assert abs(complex(float(dot.re), float(dot.im))) == pytest.approx(
        1.0, abs=1e-7)
