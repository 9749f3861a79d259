"""Entanglement measures, shot tomography, two-copy protocol, noisy compile.

Oracle values follow the reference's test strategy
(/root/reference/test/utils/test_entanglement_measures.py): known measures on
Bell/product states, cross-checks between exact and shot-based estimates.
"""

import numpy as np
import pytest

from adaptaqc_tpu.backends.backend import SamplingBackend, SVBackend
from adaptaqc_tpu.circuits.circuit import Circuit
from adaptaqc_tpu.circuits.operations import (
    create_random_initial_state_circuit, make_quantum_only_circuit)
from adaptaqc_tpu.circuits.running import create_noisemodel, zero_noise_extrapolate
from adaptaqc_tpu.compilers.adapt_compiler import AdaptCompiler
from adaptaqc_tpu.compilers.approximate_compiler import (
    calculate_overlap_between_circuits)
from adaptaqc_tpu.utils import entanglement_measures as em

BELL = np.zeros(4, complex)
BELL[0] = BELL[3] = 2 ** -0.5
RHO_BELL = np.outer(BELL, BELL.conj())
RHO_PRODUCT = np.diag([1.0, 0, 0, 0]).astype(complex)


class TestMeasures:
    def test_bell_state_oracles(self):
        assert em.concurrence(RHO_BELL) == pytest.approx(1.0)
        assert em.eof(RHO_BELL) == pytest.approx(1.0)
        assert em.negativity(RHO_BELL) == pytest.approx(0.5)
        assert em.log_negativity(RHO_BELL) == pytest.approx(1.0)
        assert em.concurrence_lower_bound_from_rdm(RHO_BELL) == pytest.approx(1.0)

    def test_product_state_oracles(self):
        assert em.concurrence(RHO_PRODUCT) == 0.0
        assert em.eof(RHO_PRODUCT) == 0
        assert em.negativity(RHO_PRODUCT) == pytest.approx(0.0)
        assert em.concurrence_lower_bound_from_rdm(RHO_PRODUCT) == pytest.approx(0.0)

    def test_maximally_mixed_lower_bound_negative(self):
        # separable mixed state: purity difference is negative
        assert em.concurrence_lower_bound_from_rdm(np.eye(4) / 4) == \
            pytest.approx(-0.5)

    def test_partial_transpose_is_involution_and_trace_preserving(self):
        rng = np.random.default_rng(0)
        m = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
        rho = m @ m.conj().T
        rho /= np.trace(rho)
        for wrt in (1, 2):
            pt = em.partial_transpose(rho, wrt)
            assert np.allclose(em.partial_transpose(pt, wrt), rho)
            assert np.trace(pt) == pytest.approx(1.0)
        assert em.trace_norm(rho) == pytest.approx(1.0)

    def test_werner_state_concurrence(self):
        # Werner state p|Bell><Bell| + (1-p) I/4: C = max(0, (3p-1)/2)
        for p in (0.2, 0.5, 0.9):
            rho = p * RHO_BELL + (1 - p) * np.eye(4) / 4
            assert em.concurrence(rho) == pytest.approx(
                max(0.0, (3 * p - 1) / 2), abs=1e-12)


class TestShotTomography:
    def test_converges_to_exact_rdm(self):
        rng = np.random.default_rng(7)
        est = em.sample_tomography_rdm(RHO_BELL, 400_000, rng)
        assert np.abs(est - RHO_BELL).max() < 5e-3
        assert em.concurrence(est) == pytest.approx(1.0, abs=2e-2)

    def test_estimate_is_valid_density_matrix(self):
        rng = np.random.default_rng(8)
        est = em.sample_tomography_rdm(RHO_BELL, 100, rng)  # very noisy
        herm = 0.5 * (est + est.conj().T)
        assert np.allclose(est, herm)
        assert np.linalg.eigvalsh(herm).min() >= -1e-12
        assert np.trace(est).real == pytest.approx(1.0)

    def test_sampling_backend_rdms_have_shot_noise(self):
        qc = Circuit(2)
        qc.h(0)
        qc.cx(0, 1)
        backend = SamplingBackend(shots=2048, seed=1)
        compiler = AdaptCompiler(qc, backend=backend)
        state = backend.state_of(compiler)
        rho1 = backend.two_qubit_rdm(compiler, 0, 1, state=state)
        rho2 = backend.two_qubit_rdm(compiler, 0, 1, state=state)
        # independent draws differ, but both are near the Bell RDM
        assert not np.allclose(rho1, rho2)
        assert np.abs(rho1 - RHO_BELL).max() < 0.1


class TestTwoCopyProtocol:
    def test_exact_backend_bell_pair(self):
        qc = Circuit(3)
        qc.h(0)
        qc.cx(0, 1)
        qc.ry(0.7, 2)
        lb = em.measure_concurrence_lower_bound(qc, 0, 1, SVBackend())
        assert lb == pytest.approx(1.0, abs=1e-9)
        # unentangled pair: bound must not be positive
        lb0 = em.measure_concurrence_lower_bound(qc, 0, 2, SVBackend())
        assert lb0 <= 1e-9

    def test_sampled_converges(self):
        qc = Circuit(2)
        qc.h(0)
        qc.cx(0, 1)
        backend = SamplingBackend(shots=40_000, seed=3)
        lb = em.measure_concurrence_lower_bound(qc, 0, 1, backend)
        assert lb == pytest.approx(1.0, abs=0.1)

    def test_dispatcher_routes_observable_method(self):
        qc = Circuit(2)
        qc.h(0)
        qc.cx(0, 1)
        val = em.calculate_entanglement_measure(
            em.EM_OBSERVABLE_CONCURRENCE_LOWER_BOUND, qc, 0, 1, SVBackend())
        assert val == pytest.approx(1.0, abs=1e-9)

    def test_compile_with_observable_method_sampling_backend(self):
        target = create_random_initial_state_circuit(3, seed=4)
        backend = SamplingBackend(shots=8192, seed=9)
        np.random.seed(2)
        compiler = AdaptCompiler(
            target, backend=backend,
            entanglement_measure=em.EM_OBSERVABLE_CONCURRENCE_LOWER_BOUND)
        result = compiler.compile()
        overlap = calculate_overlap_between_circuits(
            target, make_quantum_only_circuit(result.circuit))
        assert overlap > 0.95


class TestNoisyCompile:
    def test_compile_under_mild_noise_reaches_095(self):
        np.random.seed(0)
        target = create_random_initial_state_circuit(3, seed=11)
        noise_model = create_noisemodel(t1=200, t2=150, log_fidelities=False)
        backend = SamplingBackend(shots=4096, seed=5)
        compiler = AdaptCompiler(
            target, backend=backend,
            execute_kwargs={"shots": 4096, "noise_model": noise_model})
        result = compiler.compile()
        overlap = calculate_overlap_between_circuits(
            target, make_quantum_only_circuit(result.circuit))
        assert overlap > 0.95

    def test_noise_model_degrades_sampled_cost(self):
        # a circuit that is the identity in the clean limit: P(00)=1, cost 0,
        # so ANY faithful noise strictly raises the sampled cost (a Bell
        # target would not work here — amplitude damping pushes toward
        # |00> and can LOWER its cost, which the old X-proxy channel hid)
        qc = Circuit(2)
        qc.h(0)
        qc.cx(0, 1)
        qc.cx(0, 1)
        qc.h(0)
        # t1/t2 are scaled by 1e6 ns; 0.002 -> 2000 ns vs 300 ns per 2q gate
        strong = create_noisemodel(t1=0.002, t2=0.0015, log_fidelities=False)
        noisy = AdaptCompiler(qc, backend=SamplingBackend(shots=8192, seed=6),
                              execute_kwargs={"noise_model": strong})
        clean = AdaptCompiler(qc, backend=SamplingBackend(shots=8192, seed=6))
        assert noisy.evaluate_cost() > clean.evaluate_cost() + 0.01

    def test_zne_on_compiled_circuit(self):
        np.random.seed(1)
        target = create_random_initial_state_circuit(2, seed=3)
        backend = SamplingBackend(shots=4096, seed=7)
        compiler = AdaptCompiler(target, backend=backend)
        compiler.compile()
        extrapolated = zero_noise_extrapolate(compiler.full_circuit,
                                              compiler.evaluate_cost)
        assert np.isfinite(extrapolated)


class TestCircuitExecutingTomography:
    """perform_quantum_tomography on a SamplingBackend now EXECUTES the 9
    rotated measurement circuits (ref entanglement_measures.py:101-135)
    instead of sampling from the exact RDM."""

    def test_bell_rdm_reconstructed_from_rotated_circuits(self):
        qc = Circuit(3)
        qc.h(0)
        qc.cx(0, 1)
        qc.ry(0.4, 2)  # spectator qubit: marginalisation must ignore it
        backend = SamplingBackend(shots=60_000, seed=5)
        est = em.perform_quantum_tomography(qc, 0, 1, backend)
        assert np.abs(est - RHO_BELL).max() < 2e-2
        assert em.concurrence(est) == pytest.approx(1.0, abs=5e-2)

    def test_y_basis_sign_convention(self):
        # |+i> on qubit 0: <Y> = +1 distinguishes Sdg+H from S+H
        qc = Circuit(2)
        qc.h(0)
        qc.s(0)
        backend = SamplingBackend(shots=30_000, seed=6)
        est = em.perform_quantum_tomography(qc, 0, 1, backend)
        y_exp = np.real(np.trace(
            est @ np.kron(em._PAULIS["I"], em._PAULIS["Y"])))
        assert y_exp == pytest.approx(1.0, abs=3e-2)

    def test_draws_differ_but_both_valid(self):
        qc = Circuit(2)
        qc.h(0)
        qc.cx(0, 1)
        backend = SamplingBackend(shots=1024, seed=9)
        a = em.perform_quantum_tomography(qc, 0, 1, backend)
        b = em.perform_quantum_tomography(qc, 0, 1, backend)
        assert not np.allclose(a, b)  # real shot noise, fresh draws
        for est in (a, b):
            assert np.trace(est).real == pytest.approx(1.0)
            assert np.linalg.eigvalsh(0.5 * (est + est.conj().T)).min() >= -1e-12
