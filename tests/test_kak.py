"""KAK decomposition + 3-CX resynthesis + 2q block consolidation."""

import numpy as np
import pytest

from adaptaqc_tpu.backends import sv_core
from adaptaqc_tpu.circuits import kak
from adaptaqc_tpu.circuits.circuit import Circuit
from adaptaqc_tpu.circuits.peephole import (advanced_circuit_transpilation,
                                            consolidate_2q_blocks)
from adaptaqc_tpu.circuits.tape import compile_tape
from adaptaqc_tpu.ops import cplx
from adaptaqc_tpu.utils.gradients import circuit_to_matrix_2q


def _random_unitary(rng, dim=4):
    m = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    q, r = np.linalg.qr(m)
    return q * (np.diag(r) / np.abs(np.diag(r)))


def _fidelity(u, v):
    """|tr(u^H v)| / dim — 1.0 iff equal up to global phase."""
    return abs(np.trace(u.conj().T @ v)) / u.shape[0]


def _matrix_of(qc: Circuit) -> np.ndarray:
    return circuit_to_matrix_2q(qc)


class TestKakDecompose:
    def test_random_unitaries_reconstruct(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            u = _random_unitary(rng)
            phase, l1, l0, abc, r1, r0 = kak.kak_decompose(u)
            rebuilt = phase * np.kron(l1, l0) @ kak.canonical_gate(*abc) \
                @ np.kron(r1, r0)
            assert np.abs(rebuilt - u).max() < 1e-9

    def test_clifford_and_edge_cases(self):
        cases = {
            "identity": np.eye(4, dtype=complex),
            "cx": np.eye(4)[[0, 1, 3, 2]].astype(complex),
            "cz": np.diag([1, 1, 1, -1]).astype(complex),
            "swap": np.eye(4)[[0, 2, 1, 3]].astype(complex),
            "iswap": np.array([[1, 0, 0, 0], [0, 0, 1j, 0],
                               [0, 1j, 0, 0], [0, 0, 0, 1]]),
        }
        for name, u in cases.items():
            phase, l1, l0, abc, r1, r0 = kak.kak_decompose(u)
            rebuilt = phase * np.kron(l1, l0) @ kak.canonical_gate(*abc) \
                @ np.kron(r1, r0)
            assert np.abs(rebuilt - u).max() < 1e-9, name

    def test_local_unitary_has_zero_interaction(self):
        rng = np.random.default_rng(1)
        u = np.kron(_random_unitary(rng, 2), _random_unitary(rng, 2))
        _, _, _, abc, _, _ = kak.kak_decompose(u)
        assert max(abs(x) for x in abc) < 1e-9


class TestSynthesis:
    def test_canonical_template_identity(self):
        """The 3-CX template with fixed corner locals reproduces N(a,b,c)
        exactly (incl. global phase) for arbitrary interaction strengths."""
        rng = np.random.default_rng(2)
        for _ in range(10):
            a, b, c = rng.uniform(-1.2, 1.2, 3)
            qc = kak.decompose_2q_unitary(kak.canonical_gate(a, b, c))
            assert _fidelity(_matrix_of(qc), kak.canonical_gate(a, b, c)) \
                == pytest.approx(1.0, abs=1e-9)

    def test_random_unitary_three_cx(self):
        rng = np.random.default_rng(3)
        for _ in range(10):
            u = _random_unitary(rng)
            qc = kak.decompose_2q_unitary(u)
            n_2q = sum(1 for g in qc.data if len(g.qubits) == 2)
            assert n_2q <= 3
            assert _fidelity(_matrix_of(qc), u) == pytest.approx(1.0,
                                                                 abs=1e-9)

    def test_local_unitary_zero_cx(self):
        rng = np.random.default_rng(4)
        u = np.kron(_random_unitary(rng, 2), _random_unitary(rng, 2))
        qc = kak.decompose_2q_unitary(u)
        assert all(len(g.qubits) == 1 for g in qc.data)
        assert _fidelity(_matrix_of(qc), u) == pytest.approx(1.0, abs=1e-9)

    def test_synthesised_rotations_are_trainable(self):
        rng = np.random.default_rng(5)
        qc = kak.decompose_2q_unitary(_random_unitary(rng))
        for g in qc.data:
            if len(g.qubits) == 1:
                assert g.label == g.name


class TestConsolidation:
    def _dressed_run(self, n, pair, layers, rng, offset_gates=0):
        """`layers` thinly-dressed CNOTs on one pair inside an n-qubit
        circuit, preceded by `offset_gates` rotations elsewhere."""
        qc = Circuit(n)
        other = [q for q in range(n) if q not in pair]
        for k in range(offset_gates):
            qc.ry(float(rng.uniform(-3, 3)), other[k % len(other)])
        for _ in range(layers):
            for q in pair:
                qc.rz(float(rng.uniform(-3, 3)), q)
            qc.cx(*pair)
            for q in pair:
                qc.ry(float(rng.uniform(-3, 3)), q)
        return qc

    def _state(self, qc):
        tape = compile_tape(qc)
        return cplx.to_np(sv_core.apply_tape(
            sv_core.zero_state(qc.num_qubits),
            *(np.asarray(x) for x in (tape.kinds, tape.q0, tape.q1,
                                      tape.angles))))

    def test_long_run_collapses_to_three_cx(self):
        rng = np.random.default_rng(6)
        qc = self._dressed_run(4, (1, 2), layers=6, rng=rng, offset_gates=3)
        before = self._state(qc)
        n2q_before = sum(1 for g in qc.data if len(g.qubits) == 2)
        consolidate_2q_blocks(qc)
        n2q_after = sum(1 for g in qc.data if len(g.qubits) == 2)
        assert n2q_before == 6 and n2q_after <= 3
        after = self._state(qc)
        assert abs(np.vdot(before, after)) == pytest.approx(1.0, abs=1e-7)

    def test_single_cx_run_untouched(self):
        rng = np.random.default_rng(7)
        qc = self._dressed_run(3, (0, 1), layers=1, rng=rng)
        data_before = list(qc.data)
        consolidate_2q_blocks(qc)
        assert qc.data == data_before

    def test_advanced_transpilation_preserves_state(self):
        rng = np.random.default_rng(8)
        qc = Circuit(4)
        for _ in range(5):
            for q in range(4):
                qc.ry(float(rng.uniform(-3, 3)), q)
            for q in range(3):
                qc.cx(q, q + 1)
        before = self._state(qc)
        advanced_circuit_transpilation(qc)
        after = self._state(qc)
        assert abs(np.vdot(before, after)) == pytest.approx(1.0, abs=1e-7)

    def test_compile_with_advanced_transpilation(self):
        from adaptaqc_tpu.backends.backend import SVBackend
        from adaptaqc_tpu.compilers.adapt_compiler import AdaptCompiler
        from adaptaqc_tpu.compilers.adapt_config import AdaptConfig
        from adaptaqc_tpu.circuits.operations import (
            create_random_initial_state_circuit, make_quantum_only_circuit)
        from adaptaqc_tpu.compilers.approximate_compiler import (
            calculate_overlap_between_circuits)
        np.random.seed(3)
        target = create_random_initial_state_circuit(3, seed=29)
        config = AdaptConfig(rotosolve_frequency=2, max_layers_to_modify=4)
        result = AdaptCompiler(target, backend=SVBackend(),
                               adapt_config=config,
                               use_advanced_transpilation=True).compile()
        overlap = calculate_overlap_between_circuits(
            target, make_quantum_only_circuit(result.circuit))
        assert overlap > 0.99
