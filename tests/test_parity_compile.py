"""Reference-parity compile tests, batch 3.

Ports the remaining white-box and behavioral tests from the reference's
test/recompilers/test_adapt_compiler.py (reuse priorities, ISQL structure,
checkpoint edge cases, rotosolve_fraction validation, tenpy starting
circuit structure, cnot-depth bookkeeping). Line references cite the
reference test file.
"""

import os
import pickle

import numpy as np
import pytest

from adaptaqc_tpu import (AdaptCompiler, AdaptConfig, MPSBackend,
                          SamplingBackend, SVBackend, Circuit)
from adaptaqc_tpu.circuits import operations as co
from adaptaqc_tpu.compilers.approximate_compiler import (
    calculate_overlap_between_circuits)
from adaptaqc_tpu.utils.utilityfunctions import multi_qubit_gate_depth

SUFFICIENT = 1e-2


def _compiler_after_one_layer(n=4, seed=11, **kwargs):
    qc = co.create_random_initial_state_circuit(n, seed=seed)
    config = kwargs.pop("config", None) or AdaptConfig(rotosolve_frequency=int(1e5))
    compiler = AdaptCompiler(qc, adapt_config=config, backend=SVBackend(),
                             **kwargs)
    compiler._add_layer(0)
    return compiler


# ------------------------------------------------ reuse priorities (:549-644)
def test_previous_pair_reuse_priority_is_minus_one():
    compiler = _compiler_after_one_layer()
    pair_acted_on = compiler.qubit_pair_history[0]
    assert compiler._get_qubit_reuse_priority(pair_acted_on, k=0) == -1


def test_reuse_priorities_exponent_zero_are_one_except_last_pair():
    compiler = _compiler_after_one_layer()
    pair_acted_on = compiler.qubit_pair_history[0]
    priorities = compiler._get_all_qubit_pair_reuse_priorities(k=0)
    for i, pair in enumerate(compiler.coupling_map):
        expected = -1 if pair == pair_acted_on else 1
        assert priorities[i] == expected


def test_qubit_reuse_priority_exponent_one_penalises_shared_qubits():
    config = AdaptConfig(rotosolve_frequency=int(1e5), reuse_exponent=1,
                         reuse_priority_mode="qubit")
    compiler = _compiler_after_one_layer(config=config)
    pair_acted_on = compiler.qubit_pair_history[0]
    priorities = compiler._get_all_qubit_pair_reuse_priorities(k=1)
    for i, pair in enumerate(compiler.coupling_map):
        if pair == pair_acted_on:
            continue
        if pair[0] in pair_acted_on or pair[1] in pair_acted_on:
            assert priorities[i] == pytest.approx(0.5)
        else:
            assert priorities[i] == 1


def test_same_pair_never_acted_on_twice_in_a_row():
    rng = np.random.default_rng(5)
    config = AdaptConfig(rotosolve_frequency=int(1e5),
                         reuse_exponent=float(rng.random() * 2))
    compiler = _compiler_after_one_layer(config=config)
    for i in range(6):
        compiler._add_layer(i + 1)
        assert compiler.qubit_pair_history[-1] != compiler.qubit_pair_history[-2]


def test_add_layer_acts_on_manually_predicted_pair():
    config = AdaptConfig(rotosolve_frequency=int(1e5), reuse_exponent=1)
    compiler = _compiler_after_one_layer(config=config)
    reuse = compiler._get_all_qubit_pair_reuse_priorities(k=1)
    ent = compiler._get_all_qubit_pair_entanglement_measures()
    combined = [r * e for r, e in zip(reuse, ent)]
    predicted = compiler.coupling_map[int(np.argmax(combined))]
    compiler._add_layer(1)
    assert compiler.qubit_pair_history[-1] == predicted


def test_wrong_reuse_priority_mode_raises():
    qc = co.create_random_initial_state_circuit(4, seed=0)
    config = AdaptConfig(reuse_priority_mode="foo")
    compiler = AdaptCompiler(qc, adapt_config=config, backend=SVBackend())
    with pytest.raises(ValueError):
        compiler.compile()


# ------------------------------------------------------------ ISQL (:410-455)
def test_isql_zero_state_gives_zero_depth_solution():
    qc = Circuit(3)
    compiler = AdaptCompiler(qc, backend=SVBackend(),
                             initial_single_qubit_layer=True)
    result = compiler.compile()
    assert co.make_quantum_only_circuit(result.circuit).depth() == 0


def test_isql_ansatz_starts_with_single_qubit_gates():
    n = 3
    qc = co.create_random_initial_state_circuit(n, seed=4)
    config = AdaptConfig(max_layers=2)
    compiler = AdaptCompiler(qc, adapt_config=config, backend=SVBackend(),
                             initial_single_qubit_layer=True)
    compiler.compile()
    start, end = compiler.variational_circuit_range()
    ansatz = compiler.full_circuit.data[start:end]
    for instr in ansatz[:n]:
        assert instr.name in ("rx", "ry", "rz")


def test_isql_result_history_lengths_consistent():
    qc = Circuit(3)
    compiler = AdaptCompiler(qc, backend=SVBackend(),
                             initial_single_qubit_layer=True)
    result = compiler.compile()
    assert (len(result.global_cost_history) - 1
            == len(result.entanglement_measures_history)
            == len(result.e_val_history)
            == len(result.qubit_pair_history)
            == len(result.method_history))


# ----------------------------------------------------- result fields (:522-855)
def test_gate_counts_match_solution_with_starting_circuit():
    qc = co.create_random_circuit(3, seed=6)
    # gate-based starting circuit (ours must be invertible, so no
    # set_statevector shortcut here)
    starting = co.create_random_circuit(3, depth=3, seed=7)
    compiler = AdaptCompiler(qc, backend=SVBackend(), starting_circuit=starting)
    result = compiler.compile()
    n1 = n2 = 0
    for instr in co.make_quantum_only_circuit(result.circuit).data:
        if len(instr.qubits) == 2:
            n2 += 1
        else:
            n1 += 1
    assert (n1, n2) == (result.num_1q_gates, result.num_2q_gates)


def test_cnot_depth_history_matches_solution_depth():
    qc = co.create_random_initial_state_circuit(4, seed=1)
    compiler = AdaptCompiler(qc, backend=SVBackend())
    result = compiler.compile()
    assert multi_qubit_gate_depth(
        co.make_quantum_only_circuit(result.circuit)) \
        == result.cnot_depth_history[-1]


def test_exact_overlap_close_to_approx_overlap():
    qc = co.create_random_initial_state_circuit(3, seed=9)
    compiler = AdaptCompiler(qc, backend=SVBackend())
    result = compiler.compile()
    assert result.exact_overlap == pytest.approx(result.overlap, abs=1e-5)


# ----------------------------------------------------- checkpoints (:1111-1341)
def test_checkpoint_every_large_gives_two_checkpoints(tmp_path):
    qc = co.create_random_initial_state_circuit(3, seed=3)
    compiler = AdaptCompiler(qc, backend=SVBackend())
    d = str(tmp_path / "ckpt")
    compiler.compile(checkpoint_every=100, checkpoint_dir=d)
    assert len(os.listdir(d)) == 2


def test_checkpoint_every_zero_creates_no_dir(tmp_path):
    qc = co.create_random_initial_state_circuit(3, seed=3)
    compiler = AdaptCompiler(qc, backend=SVBackend())
    d = str(tmp_path / "nockpt")
    compiler.compile(checkpoint_every=0, checkpoint_dir=d)
    assert not os.path.isdir(d)


def test_checkpointing_creates_dir(tmp_path):
    qc = co.create_random_initial_state_circuit(3, seed=3)
    compiler = AdaptCompiler(qc, backend=SVBackend())
    d = str(tmp_path / "mkckpt")
    compiler.compile(checkpoint_every=100, checkpoint_dir=d)
    assert os.path.isdir(d)


def test_save_resume_save_resume_overwrites(tmp_path):
    qc = co.create_random_initial_state_circuit(3, seed=8)
    compiler = AdaptCompiler(qc, backend=SVBackend())
    d = str(tmp_path / "ck")
    compiler.compile(checkpoint_every=1, checkpoint_dir=d)
    with open(os.path.join(d, "0.pkl"), "rb") as f:
        loaded = pickle.load(f)
    loaded.compile(checkpoint_every=1, checkpoint_dir=d)
    with open(os.path.join(d, "1.pkl"), "rb") as f:
        loaded = pickle.load(f)
    result = loaded.compile()
    assert len(os.listdir(d)) == len(result.qubit_pair_history)


def test_resume_keeps_rotosolve_fraction(tmp_path):
    qc = co.create_random_initial_state_circuit(3, seed=8)
    compiler = AdaptCompiler(qc, backend=SVBackend(), rotosolve_fraction=0.5)
    observed = [compiler.minimizer.rotosolve_fraction]
    d = str(tmp_path / "ck")
    compiler.compile(checkpoint_every=1, checkpoint_dir=d)
    observed.append(compiler.minimizer.rotosolve_fraction)
    with open(os.path.join(d, "1.pkl"), "rb") as f:
        loaded = pickle.load(f)
    observed.append(loaded.minimizer.rotosolve_fraction)
    loaded.compile(checkpoint_every=1, checkpoint_dir=d)
    observed.append(loaded.minimizer.rotosolve_fraction)
    assert observed == [0.5, 0.5, 0.5, 0.5]


# --------------------------------------------------- validation (:987, :1372)
def test_rotosolve_fraction_validation():
    qc = co.create_random_initial_state_circuit(3, seed=2)
    with pytest.raises(ValueError):
        AdaptCompiler(qc, backend=MPSBackend(), rotosolve_fraction=0)
    with pytest.raises(ValueError):
        AdaptCompiler(qc, backend=MPSBackend(), rotosolve_fraction=1.000000001)
    AdaptCompiler(qc, backend=MPSBackend(), rotosolve_fraction=1)
    AdaptCompiler(qc, backend=MPSBackend(), rotosolve_fraction=1e-9)


def test_soften_global_cost_sampling_backend_raises():
    qc = co.create_random_initial_state_circuit(3, seed=2)
    compiler = AdaptCompiler(qc, backend=SamplingBackend(),
                             soften_global_cost=True)
    with pytest.raises(NotImplementedError):
        compiler.compile()


# -------------------------------------------- tenpy starting circuit (:997-1044)
def test_tenpy_start_solution_begins_with_rz_ry_rz_per_qubit():
    qc = co.create_random_initial_state_circuit(3, seed=12)
    compiler = AdaptCompiler(qc, backend=MPSBackend(),
                             starting_circuit="tenpy_product_state")
    result = compiler.compile()
    per_qubit = {0: [], 1: [], 2: []}
    for instr in co.make_quantum_only_circuit(result.circuit).data:
        if all(len(v) >= 3 for v in per_qubit.values()):
            break
        q = instr.qubits[0]
        if len(instr.qubits) == 1 and len(per_qubit[q]) < 3:
            per_qubit[q].append(instr.name)
    for q in range(3):
        assert per_qubit[q] == ["rz", "ry", "rz"]


def test_tenpy_start_gives_better_starting_cost():
    qc = co.create_random_initial_state_circuit(5, seed=13)
    compiler_plain = AdaptCompiler(qc, backend=MPSBackend())
    compiler_tenpy = AdaptCompiler(qc, backend=MPSBackend(),
                                   starting_circuit="tenpy_product_state")
    assert compiler_plain.evaluate_cost() > compiler_tenpy.evaluate_cost()


# ------------------------------------------------------- misc inputs (:239-401)
def test_non_basis_gate_target_compiles():
    qc = Circuit(3)
    qc.h(0)
    qc.cz(0, 1)
    qc.x(2)
    qc.cx(1, 2)
    compiler = AdaptCompiler(qc, backend=SVBackend())
    result = compiler.compile()
    assert calculate_overlap_between_circuits(qc, result.circuit) \
        > 1 - SUFFICIENT


def test_multiple_measurements_preserved():
    qc = co.create_random_initial_state_circuit(3, seed=14)
    qc.measure(0, 0)
    qc.measure(2, 1)
    compiler = AdaptCompiler(qc, backend=SVBackend())
    result = compiler.compile()
    measures = [i for i in result.circuit.data if i.name == "measure"]
    assert len(measures) == 2
    assert {(m.qubits[0], m.clbits[0]) for m in measures} == {(0, 0), (2, 1)}


def test_soften_global_cost_sv_backend_compiles():
    """Documented DEVIATION from the reference: softening on the SV backend
    raises in the reference (test_given_soften_global_cost_and_aer_sv_
    backend_then_error — Aer SV has no hamming-1 machinery), but the
    full-cost device sweep computes the softened cost generically for both
    engines here, so it simply works."""
    from adaptaqc_tpu.backends.backend import SVBackend
    qc = co.create_random_initial_state_circuit(3, seed=2)
    compiler = AdaptCompiler(qc, backend=SVBackend(),
                             soften_global_cost=True)
    result = compiler.compile()
    assert result.overlap > 0.99


def test_float_cost_improvement_num_layers_no_error():
    """test_given_compiler_when_float_cost_improvement_num_layers_then
    _no_error."""
    from adaptaqc_tpu import AdaptConfig
    qc = co.create_random_initial_state_circuit(2, seed=4)
    cfg = AdaptConfig(cost_improvement_num_layers=2.5)
    result = AdaptCompiler(qc, adapt_config=cfg).compile()
    assert result.overlap > 0.99


def test_rotosolve_fraction_results_reproducible():
    """test_given_rotosolve_fraction_then_results_reproducible: the
    per-cycle gate subsample is drawn from the stdlib random module, so
    seeding it reproduces the full trajectory."""
    import random as stdlib_random
    qc = co.create_random_initial_state_circuit(3, seed=9)

    def run():
        stdlib_random.seed(42)
        np.random.seed(42)
        comp = AdaptCompiler(qc, backend=MPSBackend(),
                             rotosolve_fraction=0.5)
        return comp.compile()

    r1, r2 = run(), run()
    assert r1.overlap == r2.overlap
    assert r1.qubit_pair_history == r2.qubit_pair_history
    assert r1.circuit_qasm == r2.circuit_qasm


def test_wall_deadline_stops_after_one_layer(monkeypatch):
    """ADAPTAQC_WALL_DEADLINE in the past: the layer loop stops after the
    first layer (best-so-far), still producing a complete AdaptResult so a
    time-boxed benchmark run writes a real record instead of dying to
    SIGTERM. No reference counterpart (its runs are interactive)."""
    monkeypatch.setenv("ADAPTAQC_WALL_DEADLINE", "1.0")
    qc = co.create_random_initial_state_circuit(4, seed=13)
    cfg = AdaptConfig(sufficient_cost=1e-12, max_layers=50)
    result = AdaptCompiler(qc, adapt_config=cfg).compile()
    assert len(result.qubit_pair_history) == 1
    assert result.circuit_qasm
    assert 0.0 <= result.overlap <= 1.0 + 1e-6
