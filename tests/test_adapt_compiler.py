"""End-to-end ADAPT-AQC compile tests.

Modelled on the reference's test strategy (SURVEY.md section 4; reference
test/recompilers/test_adapt_compiler.py): compile small random states and
assert final overlap > 1 - sufficient_cost against an independent dense
simulation.
"""

import numpy as np
import pytest

from adaptaqc_tpu import (AdaptCompiler, AdaptConfig, MPSBackend,
                          SamplingBackend, SVBackend, Circuit)
from adaptaqc_tpu.circuits import operations as co
from adaptaqc_tpu.utils import ansatzes as ans

from reference_sim import simulate
from test_sv_core import random_circuit

SUFFICIENT = 1e-2


def small_target(n=3, seed=0, depth=14):
    rng = np.random.default_rng(seed)
    return random_circuit(n, depth, rng)


def check_result(result, target_circuit, tol=SUFFICIENT):
    assert result.overlap > 1 - tol, f"overlap {result.overlap}"
    # independent oracle: dense overlap between target and solution
    sv_t = simulate(co.make_quantum_only_circuit(target_circuit))
    sv_s = simulate(co.make_quantum_only_circuit(result.circuit))
    exact = abs(np.vdot(sv_t, sv_s)) ** 2
    assert exact > 1 - 3 * tol, f"exact overlap {exact}"


def test_compile_sv_backend_default():
    qc = small_target(3, seed=1)
    compiler = AdaptCompiler(qc, backend=SVBackend())
    result = compiler.compile()
    check_result(result, qc)
    assert result.exact_overlap > 1 - SUFFICIENT
    assert result.cost_evaluations > 0
    assert result.time_taken > 0


def test_compile_mps_backend():
    qc = small_target(3, seed=2)
    compiler = AdaptCompiler(qc, backend=MPSBackend())
    result = compiler.compile()
    check_result(result, qc)


def test_compile_mps_target_input():
    # target given directly as an MPS (qiskit format)
    from adaptaqc_tpu.backends import mps_core
    from adaptaqc_tpu.circuits.tape import compile_tape
    qc = small_target(3, seed=3)
    tape = compile_tape(qc)
    st = mps_core.apply_tape(mps_core.zero_mps(3, 4), tape.kinds, tape.q0,
                             tape.q1, tape.angles, 1e-16)
    qmps = mps_core.to_qiskit_mps(st)
    compiler = AdaptCompiler(qmps, backend=MPSBackend())
    result = compiler.compile()
    check_result(result, qc)


def test_compile_random_statevector_target():
    qc, vec = co.create_random_initial_state_circuit(3, return_statevector=True,
                                                     seed=5)
    compiler = AdaptCompiler(qc)
    result = compiler.compile()
    sv_s = simulate(co.make_quantum_only_circuit(result.circuit))
    assert abs(np.vdot(vec, sv_s)) ** 2 > 1 - 3 * SUFFICIENT


@pytest.mark.parametrize("method", ["expectation", "basic", "random",
                                    "brickwall"])
def test_pair_selection_methods(method):
    np.random.seed(42)  # the 'random' method draws from np.random
    qc = small_target(3, seed=6)
    config = AdaptConfig(method=method, max_layers=40,
                         cost_improvement_num_layers=20)
    compiler = AdaptCompiler(qc, adapt_config=config)
    result = compiler.compile()
    check_result(result, qc, tol=5e-2)


def test_general_gradient_method():
    qc = small_target(3, seed=7)
    config = AdaptConfig(method="general_gradient")
    compiler = AdaptCompiler(qc, backend=MPSBackend(), adapt_config=config,
                             custom_layer_2q_gate=ans.identity_resolvable())
    result = compiler.compile()
    check_result(result, qc)
    assert "general_gradient" in result.method_history


def test_general_gradient_requires_mps():
    with pytest.raises(ValueError):
        AdaptCompiler(small_target(3),
                      adapt_config=AdaptConfig(method="general_gradient"))


def test_custom_ansatz_u4():
    qc = small_target(3, seed=8)
    compiler = AdaptCompiler(qc, custom_layer_2q_gate=ans.u4(),
                             use_rotoselect=False)
    result = compiler.compile()
    check_result(result, qc)


def test_initial_single_qubit_layer():
    qc = small_target(3, seed=9)
    compiler = AdaptCompiler(qc, initial_single_qubit_layer=True)
    result = compiler.compile()
    check_result(result, qc)
    assert result.qubit_pair_history[0] == (None, None)


def test_starting_circuit():
    n = 3
    start = Circuit(n)
    start.h(range(n))
    qc = Circuit(n)
    qc.h(range(n))
    rng = np.random.default_rng(10)
    for instr in random_circuit(n, 8, rng).data:
        qc.data.append(instr)
    compiler = AdaptCompiler(qc, starting_circuit=start)
    result = compiler.compile()
    check_result(result, qc)
    # the solution must begin with the starting circuit's gates
    names = [i.name for i in result.circuit.data[:n]]
    assert names == ["h"] * n


def test_local_cost_optimisation():
    qc = small_target(3, seed=11)
    compiler = AdaptCompiler(qc, optimise_local_cost=True)
    result = compiler.compile()
    check_result(result, qc, tol=5e-2)
    assert result.local_cost_history is not None


def test_soften_global_cost_mps():
    qc = small_target(3, seed=12)
    compiler = AdaptCompiler(qc, backend=MPSBackend(), soften_global_cost=True)
    result = compiler.compile()
    check_result(result, qc, tol=5e-2)


def test_sampling_backend():
    qc = small_target(2, seed=13, depth=6)
    config = AdaptConfig(sufficient_cost=0.05, max_layers=10)
    compiler = AdaptCompiler(qc, backend=SamplingBackend(shots=4096),
                             adapt_config=config)
    result = compiler.compile()
    # shot noise: loose tolerance (reference: test_adapt_compiler.py:56-68)
    sv_t = simulate(co.make_quantum_only_circuit(qc))
    sv_s = simulate(co.make_quantum_only_circuit(result.circuit))
    assert abs(np.vdot(sv_t, sv_s)) ** 2 > 0.85


def test_initial_ansatz():
    qc = small_target(3, seed=14)
    # first compile to get a good ansatz, then reuse it
    first = AdaptCompiler(qc).compile()
    ansatz = co.make_quantum_only_circuit(first.circuit)
    compiler = AdaptCompiler(qc)
    result = compiler.compile(initial_ansatz=ansatz)
    assert result.overlap > 1 - SUFFICIENT
    # should succeed without needing many more layers
    assert len(result.qubit_pair_history) <= len(first.qubit_pair_history)


def test_save_circuit_history():
    qc = small_target(3, seed=15)
    compiler = AdaptCompiler(qc, save_circuit_history=True)
    result = compiler.compile()
    assert len(result.circuit_history) >= 1
    assert result.circuit_qasm.startswith("OPENQASM 2.0;")


def test_result_histories_consistent():
    qc = small_target(3, seed=16)
    compiler = AdaptCompiler(qc)
    result = compiler.compile()
    layers = len(result.qubit_pair_history)
    assert len(result.method_history) == layers
    assert len(result.global_cost_history) == layers + 1  # + final cost
    assert len(result.cnot_depth_history) == layers + 1
    assert len(result.entanglement_measures_history) == layers


def test_compile_from_evolved_mps_matches_trotter_circuit():
    """Physics-pipeline integration (reference test_adapt_compiler.py:856-912):
    evolve a Neel state under the XXZ chain with the framework's own MPS
    engine (the TEBD analogue), compile from the resulting MPS target with a
    Neel starting circuit, and check the solution against an independently
    assembled Trotter circuit via dense statevectors."""
    from adaptaqc_tpu.backends import mps_core
    from adaptaqc_tpu.circuits.kak import canonical_gate, decompose_2q_unitary
    from adaptaqc_tpu.circuits.tape import compile_tape

    n, steps, dt, delta = 3, 5, 0.4, 1.0
    # bond gate exp(-i dt (XX + YY + delta ZZ)) == N(-dt, -dt, -delta*dt)
    bond = decompose_2q_unitary(canonical_gate(-dt, -dt, -delta * dt))
    prep = Circuit(n)
    for q in range(0, n, 2):
        prep.x(q)
    circuit = prep.copy()
    for _ in range(steps):
        for parity in (0, 1):
            for q in range(parity, n - 1, 2):
                co.add_to_circuit(circuit, bond.copy(), qubit_subset=[q, q + 1])

    tape = compile_tape(circuit)
    st = mps_core.apply_tape(mps_core.zero_mps(n, 4), tape.kinds, tape.q0,
                             tape.q1, tape.angles, 1e-16)
    qmps = mps_core.to_qiskit_mps(st)

    compiler = AdaptCompiler(qmps, backend=MPSBackend(),
                             starting_circuit=prep)
    result = compiler.compile()
    sv_t = simulate(co.make_quantum_only_circuit(circuit))
    sv_s = simulate(co.make_quantum_only_circuit(result.circuit))
    assert abs(np.vdot(sv_t, sv_s)) ** 2 > 1 - SUFFICIENT


def test_warm_start_from_saved_circuit_qasm():
    """The refine workflow (benchmarks/refine.py): a capped run's solution,
    round-tripped through QASM, continues as initial_ansatz to convergence
    (reference initial-ansatz semantics: adapt_compiler.py:536-583)."""
    from adaptaqc_tpu.circuits import qasm

    qc = small_target(4, seed=21, depth=20)
    stage1 = AdaptCompiler(qc, backend=SVBackend(),
                           adapt_config=AdaptConfig(max_layers=1))
    r1 = stage1.compile()
    assert r1.overlap <= 1 - SUFFICIENT  # genuinely capped

    ansatz = co.make_quantum_only_circuit(qasm.loads(qasm.dumps(r1.circuit)))
    stage2 = AdaptCompiler(qc, backend=SVBackend(),
                           adapt_config=AdaptConfig(max_layers=60))
    r2 = stage2.compile(initial_ansatz=ansatz)
    check_result(r2, qc)
