"""Re-measure a recorded spin-chain solution circuit and append a fresh
record with trustworthy verification fields.

Why this exists: refine rounds on 2026-08-21 produced records whose
``overlap`` field was corrupted by the TPU deep-chain collapse in the
chi-doubled true-cost re-simulation (fixed by cplx.verification_eigh —
the independent engine check on the same records read 0.986 while the
overlap field read 0.0079). Records are append-only, so rather than edit
history this re-measures the saved circuit with the fixed verification
stack and appends a new record carrying provenance
(``reverified_from`` = the original circuit path). Runs fine on CPU.

Usage: python benchmarks/reverify_spin.py <circuit-rel-path> <n> <steps> <dt>
"""

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import git_rev as _git_rev, platform as _platform
from spin_chain import neel_circuit, staggered_magnetisation, trotter_circuit

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "results_spin_chain.jsonl")


def true_overlap(target_circuit, circuit, chi):
    """|<target|circuit|0>|^2 at bond dimension chi, both sides simulated
    from scratch, normalised by both norms (the chi-doubled deliverable
    measurement of adapt_compiler._true_cost_of_gate_circuit, standalone)."""
    import jax.numpy as jnp
    from adaptaqc_tpu.backends import mps_core
    from adaptaqc_tpu.circuits.operations import make_quantum_only_circuit
    from adaptaqc_tpu.circuits.tape import compile_tape
    from adaptaqc_tpu.ops import cplx

    n = circuit.num_qubits
    with cplx.verification_eigh():
        def sim(qc):
            tape = compile_tape(make_quantum_only_circuit(qc))
            return mps_core.apply_tape(
                mps_core.zero_mps(n, chi), jnp.asarray(tape.kinds),
                jnp.asarray(tape.q0), jnp.asarray(tape.q1),
                jnp.asarray(tape.angles), 1e-16)
        target = sim(target_circuit)
        state = sim(circuit)
        nrm2 = float(mps_core.mps_dot(state, state).re)
        tnrm2 = float(mps_core.mps_dot(target, target).re)
        return float(mps_core.mps_dot(target, state).abs2()
                     / max(nrm2 * tnrm2, 1e-30))


def main():
    from adaptaqc_tpu.circuits import operations as co
    from adaptaqc_tpu.circuits import qasm
    from adaptaqc_tpu.circuits.operations import make_quantum_only_circuit
    from adaptaqc_tpu.utils.verification import cross_engine_overlap

    circ_rel = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    dt = float(sys.argv[4]) if len(sys.argv) > 4 else 0.2
    delta = float(os.environ.get("SPIN_DELTA", 1.5))
    hfield = float(os.environ.get("SPIN_H", 1.0))
    chi = int(os.environ.get("REVERIFY_CHI", 128))

    with gzip.open(os.path.join(HERE, circ_rel), "rt") as f:
        circuit = make_quantum_only_circuit(qasm.loads(f.read()))
    target = neel_circuit(n)
    co.add_to_circuit(target, trotter_circuit(n, steps, dt, delta=delta,
                                              h=hfield))

    ov = true_overlap(target, circuit, chi)
    engine_ov = cross_engine_overlap(target, circuit, chi=64)
    sm_raw = staggered_magnetisation(target, chi=64)
    sm_sol = staggered_magnetisation(circuit, chi=64)
    sol_2q, _ = co.find_num_gates(circuit)

    record = {
        "workload": f"xxz_trotter_n{n}_steps{steps}_dt{dt}",
        "delta": delta,
        "h": hfield,
        "overlap": round(ov, 4),
        "independent_overlap": round(ov, 4),
        "independent_engine_overlap": round(engine_ov, 4),
        "solution_2q_gates": sol_2q,
        "solution_2q_depth": circuit.multi_qubit_gate_depth(),
        "working_chi": chi,
        "sm_raw": round(sm_raw, 4),
        "sm_solution": round(sm_sol, 4),
        "circuit": circ_rel,
        "reverified_from": circ_rel,
        "build": _git_rev(),
        "platform": _platform(),
    }
    print(json.dumps(record), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
