"""Reference oracle tests: analytic costs, cross-backend equality, analytic
gradients, brickwall order, checkpoint-resume field equality, absorption
gate-count schedule.

Ports the reference's backend-agnostic oracle classes (SURVEY.md section 4):
test_approximate_compiler.py:78-150, test_gradients.py:39-73,
test_adapt_compiler.py:673-718, :1134-1162, :1509-1543.
"""

import os
import pickle

import numpy as np
import pytest

from adaptaqc_tpu.backends import mps_core
from adaptaqc_tpu.backends.backend import (MPSBackend, SamplingBackend,
                                           SVBackend)
from adaptaqc_tpu.circuits import operations as co
from adaptaqc_tpu.circuits.circuit import Circuit
from adaptaqc_tpu.circuits.operations import (
    create_random_initial_state_circuit)
from adaptaqc_tpu.compilers.adapt_compiler import AdaptCompiler
from adaptaqc_tpu.compilers.adapt_config import AdaptConfig
from adaptaqc_tpu.utils import gradients as gr


class TestAnalyticCosts:
    """Analytic global/local costs of simple 4q states
    (ref test_approximate_compiler.py:114-150, eqs 9/11 of arXiv:1908.04416):
    |0000>: g=0 l=0; Neel |x on 0,2>: g=1 l=1/2; GHZ: g=1/2 l=1/2;
    |++++>: g=15/16 l=1/2."""

    def _circuits(self):
        zero = Circuit(4)
        neel = Circuit(4)
        neel.x(0)
        neel.x(2)
        ghz = Circuit(4)
        ghz.h(0)
        for i in range(3):
            ghz.cx(0, i + 1)
        plus = Circuit(4)
        for q in range(4):
            plus.h(q)
        return [zero, neel, ghz, plus]

    EXPECTED = [0, 0, 1, 1 / 2, 1 / 2, 1 / 2, 15 / 16, 1 / 2]

    def test_sv_backend(self):
        costs = []
        for circuit in self._circuits():
            for local in (False, True):
                compiler = AdaptCompiler(circuit, backend=SVBackend(),
                                         optimise_local_cost=local)
                costs.append(compiler.evaluate_cost())
        np.testing.assert_allclose(costs, self.EXPECTED, atol=1e-12)

    def test_mps_backend(self):
        costs = []
        for circuit in self._circuits():
            for local in (False, True):
                compiler = AdaptCompiler(circuit, backend=MPSBackend(),
                                         optimise_local_cost=local)
                costs.append(compiler.evaluate_cost())
        np.testing.assert_allclose(costs, self.EXPECTED, atol=1e-10)


class TestCrossBackendCosts:
    """Same cost from SV / MPS / sampling to 5 / 2 decimal places
    (ref test_approximate_compiler.py:78-112)."""

    @pytest.mark.parametrize("local", [False, True])
    def test_global_and_local_cost_equality(self, local):
        target = create_random_initial_state_circuit(4, seed=13)
        cost_sv = AdaptCompiler(target, backend=SVBackend(),
                                optimise_local_cost=local).evaluate_cost()
        cost_mps = AdaptCompiler(target, backend=MPSBackend(),
                                 optimise_local_cost=local).evaluate_cost()
        cost_qasm = AdaptCompiler(target, backend=SamplingBackend(seed=1),
                                  optimise_local_cost=local).evaluate_cost()
        np.testing.assert_almost_equal(cost_sv, cost_mps, decimal=5)
        np.testing.assert_almost_equal(cost_sv, cost_qasm, decimal=2)
        np.testing.assert_almost_equal(cost_mps, cost_qasm, decimal=2)

    def test_local_cost_leq_global(self):
        target = create_random_initial_state_circuit(4, seed=17)
        g = AdaptCompiler(target, backend=SVBackend()).evaluate_cost()
        l = AdaptCompiler(target, backend=SVBackend(),
                          optimise_local_cost=True).evaluate_cost()
        assert l <= g + 1e-12


class TestGradientOracle:
    """Hand-derived analytic gradient to 10 places (ref
    test_gradients.py:39-73): for ansatz Rx(theta) q0 + Ry(phi) q1 applied to
    |psi> = [a, b, c, d], dC/dtheta|0 = -Im(a* b), dC/dphi|0 = Re(a* c);
    general_grad returns the Euclidean norm."""

    def _random_2q_target(self, seed):
        rng = np.random.default_rng(seed)
        qc = Circuit(2)
        for _ in range(3):
            qc.rx(float(rng.uniform(-3, 3)), 0)
            qc.ry(float(rng.uniform(-3, 3)), 1)
            qc.cx(0, 1)
            qc.rz(float(rng.uniform(-3, 3)), 0)
        return qc

    def test_rx_ry_ansatz_matches_analytic(self):
        from adaptaqc_tpu.backends import sv_core
        from adaptaqc_tpu.circuits.tape import compile_tape
        from adaptaqc_tpu.ops import cplx

        qc = self._random_2q_target(23)
        tape = compile_tape(qc)
        sv = cplx.to_np(sv_core.apply_tape(
            sv_core.zero_state(2),
            *(np.asarray(x) for x in (tape.kinds, tape.q0, tape.q1,
                                      tape.angles))))
        a, b, c = sv[0], sv[1], sv[2]
        theta_grad = -np.imag(np.conj(a) * b)
        phi_grad = np.real(np.conj(a) * c)
        expected = float(np.sqrt(theta_grad ** 2 + phi_grad ** 2))

        ansatz = Circuit(2)
        ansatz.rx(0, 0)
        ansatz.ry(0, 1)
        generators, degeneracies = gr.get_generators_and_degeneracies(
            ansatz, rotoselect=False, inverse=True)
        ops = gr.prepare_gradient_ops(gr.zero_ansatz_inverse(ansatz),
                                      generators)

        backend = MPSBackend()
        psi = backend.mps_from_compiler_target(qc)
        actual = gr.general_grad_of_pairs_device(
            psi, None, ops, degeneracies, [(0, 1)], backend, 2)[0]
        assert actual == pytest.approx(expected, abs=1e-10)

    def test_identity_resolvable_ansatz_zero_gradient(self):
        """The default thinly-dressed-CNOT resolves to identity at theta=0,
        so <psi|U^dag(0)|s> with s=psi gives gradient formula but for target
        = |0...0> all pair gradients vanish (ref test_gradients.py:25-38)."""
        qc = Circuit(5)  # |00000> target
        config = AdaptConfig(method="general_gradient")
        compiler = AdaptCompiler(qc, backend=MPSBackend(),
                                 adapt_config=config)
        grads = compiler._get_all_qubit_pair_gradients()
        np.testing.assert_array_almost_equal(
            grads, np.zeros(len(compiler.coupling_map)))


class TestBrickwallOrder:
    """White-box pair order (ref test_adapt_compiler.py:1509-1543)."""

    def _history_after_layers(self, n, layers):
        qc = Circuit(n)
        config = AdaptConfig(max_layers=10, method="brickwall")
        compiler = AdaptCompiler(qc, backend=SVBackend(),
                                 adapt_config=config)
        for i in range(layers):
            compiler._add_layer(i)
        return compiler.qubit_pair_history

    def test_odd_qubit_count(self):
        expected = [(0, 1), (2, 3), (1, 2), (3, 4)]
        history = self._history_after_layers(5, 5 * len(expected))
        for i, pair in enumerate(history):
            assert pair == expected[i % len(expected)]

    def test_even_qubit_count(self):
        expected = [(0, 1), (2, 3), (1, 2)]
        history = self._history_after_layers(4, 5 * len(expected))
        for i, pair in enumerate(history):
            assert pair == expected[i % len(expected)]

    def test_two_qubits(self):
        target = create_random_initial_state_circuit(2, seed=5)
        config = AdaptConfig(method="brickwall")
        result = AdaptCompiler(target, backend=SVBackend(),
                               adapt_config=config).compile()
        for pair in result.qubit_pair_history:
            assert pair == (0, 1)

    def test_single_qubit_raises(self):
        config = AdaptConfig(method="brickwall")
        compiler = AdaptCompiler(Circuit(1), backend=SVBackend(),
                                 adapt_config=config)
        with pytest.raises(ValueError):
            compiler.compile()


def _results_equal(res_a, res_b):
    keys = set(res_a.__dict__) | set(res_b.__dict__)
    for key in keys - {"time_taken", "phase_timings"}:  # wall-clock fields
        val_a = getattr(res_a, key, None)
        val_b = getattr(res_b, key, None)
        if key == "circuit":
            assert co.are_circuits_identical(val_a, val_b), key
        elif isinstance(val_a, float) or isinstance(val_b, float):
            assert val_a == pytest.approx(val_b, abs=1e-9), key
        else:
            assert val_a == val_b, key


class TestCheckpointResumeEquality:
    """Resuming from ANY checkpoint reproduces every non-time result field
    (ref test_adapt_compiler.py:1134-1162)."""

    def test_all_fields_equal_from_every_checkpoint(self, tmp_path):
        target = create_random_initial_state_circuit(3, seed=31)
        compiler = AdaptCompiler(target, backend=SVBackend())
        result = compiler.compile(checkpoint_every=1,
                                  checkpoint_dir=str(tmp_path))
        checkpoints = sorted(int(f[:-4]) for f in os.listdir(tmp_path))
        assert len(checkpoints) >= 2
        # the last file is the post-loop final checkpoint; resuming it
        # re-enters the layer loop (same as the reference, whose equality
        # test also only resumes in-loop checkpoints, ref :1141)
        for layer in checkpoints[:-1]:
            with open(tmp_path / f"{layer}.pkl", "rb") as f:
                loaded = pickle.load(f)
            carried_time = loaded.prev_checkpoint_time_taken
            resumed = loaded.compile()
            _results_equal(result, resumed)
            # resumed time accounting continues the checkpoint's clock (the
            # reference asserts 100ms parity; here the first run also pays
            # one-off jit compiles the warm resume does not, and an absolute
            # upper bound is load-sensitive on this 1-core host — assert only
            # the load-insensitive monotone contract)
            assert carried_time <= resumed.time_taken


class TestAbsorptionSchedule:
    """Exact gate counts left outside the MPS prefix after each layer under
    the absorption schedule (ref test_adapt_compiler.py:673-718). The
    thinly-dressed CNOT layer is 5 gates."""

    def _gate_target(self, n=4, seed=41):
        rng = np.random.default_rng(seed)
        qc = Circuit(n)
        for q in range(n):
            qc.ry(float(rng.uniform(-3, 3)), q)
        for q in range(n - 1):
            qc.cx(q, q + 1)
        return qc

    def test_schedule_modify_3(self):
        # rotosolve on layers 4, 8, 12; lowest untouchable index moves in
        # steps of the frequency -> counts cycle [0, 0, 5, 10, 0, ...]
        config = AdaptConfig(rotosolve_frequency=4, max_layers_to_modify=3)
        expected = [0, 0, 5, 10, 0, 0, 5, 10, 0, 0, 5, 10, 0]
        compiler = AdaptCompiler(self._gate_target(), backend=MPSBackend(),
                                 adapt_config=config)
        actual = []
        for i in range(13):
            compiler._add_layer(i)
            actual.append(len(compiler.full_circuit.data) - 1)
        assert actual == expected

    def test_schedule_modify_5(self):
        config = AdaptConfig(rotosolve_frequency=4, max_layers_to_modify=5)
        expected = [5, 10, 15, 20, 5, 10, 15, 20, 5, 10, 15, 20, 5]
        compiler = AdaptCompiler(self._gate_target(), backend=MPSBackend(),
                                 adapt_config=config)
        actual = []
        for i in range(13):
            compiler._add_layer(i)
            actual.append(len(compiler.full_circuit.data) - 1)
        assert actual == expected

    def test_initial_ansatz_fully_absorbed(self):
        # 11-gate initial ansatz: everything lands in the MPS prefix, and
        # the gate-view circuit shows set_mps marker + 11 gates
        initial_ansatz = Circuit(4)
        for q in range(4):
            initial_ansatz.ry(0, q)
        for q in range(3):
            initial_ansatz.cx(q, q + 1)
        for q in range(4):
            initial_ansatz.rx(0, q)
        config = AdaptConfig(rotosolve_frequency=4, max_layers_to_modify=3)
        compiler = AdaptCompiler(self._gate_target(), backend=MPSBackend(),
                                 adapt_config=config)
        compiler.global_cost_history = []
        compiler.initial_ansatz_already_successful = False
        compiler._add_initial_ansatz(initial_ansatz,
                                     optimise_initial_ansatz=True)
        assert len(compiler.full_circuit.data) == 1
        assert len(compiler.ref_circuit_as_gates.data) == 12


class TestMPSConsumesStatevectorTarget:
    """Aer-MPS parity: set_statevector / initialize targets import directly
    into the MPS engine (from_dense)."""

    def test_compile_statevector_target_on_mps(self):
        target, vec = create_random_initial_state_circuit(
            3, return_statevector=True, seed=47)
        np.random.seed(8)
        result = AdaptCompiler(target, backend=MPSBackend()).compile()
        assert result.overlap > 0.99

    def test_from_dense_roundtrip(self):
        rng = np.random.default_rng(53)
        vec = rng.normal(size=16) + 1j * rng.normal(size=16)
        vec /= np.linalg.norm(vec)
        state = mps_core.from_dense(vec, 4)
        assert np.abs(mps_core.to_dense(state) - vec).max() < 1e-12
        assert float(state.trunc) == 0.0


class TestAnsatzStructure:
    """White-box partition of the gate-view circuit into
    [initial-ansatz inverse][isql][dressed layers][starting-circuit inverse]
    (ref test_adapt_compiler.py:745-808)."""

    def test_solution_has_correct_gate_structure(self):
        from adaptaqc_tpu.backends.backend import MPSBackend

        target = create_random_initial_state_circuit(4, seed=61)
        starting_circuit = Circuit(4)
        for q in range(4):
            starting_circuit.x(q)

        initial_ansatz = Circuit(4)
        for q in range(4):
            initial_ansatz.ry(0, q)
        for q in range(3):
            initial_ansatz.cx(q, q + 1)
        for q in range(4):
            initial_ansatz.rx(0, q)

        config = AdaptConfig(rotosolve_frequency=4, max_layers_to_modify=2)
        compiler = AdaptCompiler(target, backend=MPSBackend(),
                                 adapt_config=config,
                                 starting_circuit=starting_circuit,
                                 initial_single_qubit_layer=True)
        compiler.global_cost_history = []
        compiler.initial_ansatz_already_successful = False
        compiler._add_initial_ansatz(initial_ansatz,
                                     optimise_initial_ansatz=True)
        for i in range(5):
            compiler._add_layer(i)

        ref = compiler.ref_circuit_as_gates
        assert ref.data[0].name == "set_mps"
        gates = ref.data[1:]

        # first 11 gates: the inverse of the initial ansatz
        names = [g.name for g in gates[:11]]
        assert names == ["rx"] * 4 + ["cx"] * 3 + ["ry"] * 4

        # next 4: the initial single-qubit layer (Rotoselect may re-axis)
        assert all(g.name in ("rx", "ry", "rz") for g in gates[11:15])

        # middle: whole thinly-dressed CNOT layers, cx at position 2 of 5
        middle = gates[15:-4]
        assert len(middle) % 5 == 0 and len(middle) == 4 * 5
        for i, g in enumerate(middle):
            if i % 5 == 2:
                assert g.name == "cx"
            else:
                assert g.name in ("rx", "ry", "rz")

        # final 4: the starting circuit's inverse (x gates)
        assert all(g.name == "x" for g in gates[-4:])


class TestSvdTruncRankDeficient:
    """Round-5 regression: on a rank-deficient theta at chi >> rank, the
    Gram's noise eigenvalues (as small as 1e-32 in f32) must not be used as
    divisors — that manufactured U columns of norm ~1e16 and exploded the
    center-gauge engine's norm by 24 decades (cross_engine_overlap 6e-8 vs
    dense truth 0.99 on an n=8 fig5 solution circuit)."""

    def test_u_columns_never_exceed_unit_norm(self):
        from adaptaqc_tpu.ops import cplx
        import jax.numpy as jnp
        rng = np.random.default_rng(5)
        m, n, rank = 128, 64, 2
        a = rng.standard_normal((m, rank)) + 1j * rng.standard_normal((m, rank))
        b = rng.standard_normal((rank, n)) + 1j * rng.standard_normal((rank, n))
        qa, _ = np.linalg.qr(a)
        qb, _ = np.linalg.qr(b.conj().T)
        s_true = np.array([1.0, 4.5e-5])
        theta_np = (qa * s_true) @ qb.conj().T
        theta = cplx.C(jnp.asarray(theta_np.real, jnp.float32),
                       jnp.asarray(theta_np.imag, jnp.float32))
        u, s, vh = cplx.svd_trunc(theta, n, 0.0)
        s = np.asarray(s, np.float64)
        col_norms = np.sqrt(np.asarray(
            jnp.sum(u.abs2(), axis=0), np.float64))
        assert col_norms.max() < 1.0 + 1e-4, col_norms.max()
        # kept values match the true spectrum at f32 accuracy; junk
        # directions are zeroed, not amplified
        assert abs(s[0] - 1.0) < 1e-5
        assert s[s > 0].min() >= 0  # no negative/NaN
        # reconstruction on the support
        us = cplx.C(u.re * jnp.asarray(s, u.re.dtype),
                    u.im * jnp.asarray(s, u.im.dtype))
        recon = np.asarray((us @ vh).re) + 1j * np.asarray((us @ vh).im)
        assert np.abs(recon - theta_np).max() < 5e-5
