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

from reference_sim import simulate
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
