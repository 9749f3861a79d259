"""Warm-start refinement of a capped fig5 spin-chain compile.

Loads the best saved solution circuit for an (n, steps, dt) spin-chain
workload from benchmarks/results_spin_chain.jsonl and continues ADAPT from
it via `AdaptCompiler.compile(initial_ansatz=...)` at a higher working bond
dimension — the same warm-start path refine.py uses for the random-MPS
paper seeds (reference parity: approximate_compiler warm starts,
adapt_compiler.py initial_ansatz handling). A direct compile that capped at
overlap 0.9x restarts from cost ~0.0x instead of ~1-1e-6.

Usage: python benchmarks/spin_refine.py [n] [steps] [dt]
Env: SPIN_REFINE_CHI (default 64), SPIN_REFINE_LAYERS (extra, default 300),
     SPIN_REFINE_SUFF (default 1e-2), SPIN_DELTA / SPIN_H as spin_chain.py.
     A/B knobs for the n=50 plateau investigation:
     SPIN_REFINE_WINDOW — max_layers_to_modify (default 100: a warm start
       larger than the window leaves its leading gates frozen forever);
     SPIN_REFINE_LOCAL=1 — optimise the local (per-qubit) cost instead of
       the global overlap (ISL's large-n recommendation; the global overlap
       is still what gets recorded);
     SPIN_REFINE_SOFTEN=1 — soften the global cost with the hamming-1 terms
       (reference soften_global_cost, adapt_compiler.py:114-121: the other
       large-n flat-landscape tool; mutually exclusive with LOCAL).
"""

import gzip
import json
import logging
import os
import sys
import time

logging.basicConfig(stream=sys.stderr)
logging.getLogger("adaptaqc_tpu").setLevel(logging.INFO)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import (compile_with_recovery, git_rev as _git_rev,
                     platform as _platform, save_circuit as _save_circuit)
from spin_chain import neel_circuit, staggered_magnetisation, trotter_circuit

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "results_spin_chain.jsonl")


def best_saved_circuit(workload: str):
    pinned = os.environ.get("SPIN_REFINE_FROM")  # pin for A/B fairness
    best = None
    with open(RESULTS) as f:
        for line in f:
            r = json.loads(line)
            if r.get("workload") == workload and r.get("circuit"):
                if pinned and r["circuit"] != pinned:
                    continue
                ov = r.get("overlap") or 0.0
                if best is None or ov > best[1]:
                    best = (r["circuit"], ov)
    if best is None:
        raise SystemExit(f"no recorded circuit for workload {workload}")
    return best


def main():
    from adaptaqc_tpu import AdaptCompiler, AdaptConfig, mps_backend_with_args
    from adaptaqc_tpu.circuits import operations as co
    from adaptaqc_tpu.circuits import qasm
    from adaptaqc_tpu.circuits.operations import make_quantum_only_circuit
    from adaptaqc_tpu.utils.ansatzes import identity_resolvable
    from adaptaqc_tpu.utils.constants import CMAP_LINEAR, generate_coupling_map

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    dt = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2
    delta = float(os.environ.get("SPIN_DELTA", 1.5))
    hfield = float(os.environ.get("SPIN_H", 1.0))
    chi = int(os.environ.get("SPIN_REFINE_CHI", 64))
    extra_layers = int(os.environ.get("SPIN_REFINE_LAYERS", 300))
    sufficient = float(os.environ.get("SPIN_REFINE_SUFF", 1e-2))
    window = int(os.environ.get("SPIN_REFINE_WINDOW", 100))
    local_cost = bool(int(os.environ.get("SPIN_REFINE_LOCAL", "0")))
    soften = bool(int(os.environ.get("SPIN_REFINE_SOFTEN", "0")))

    workload = f"xxz_trotter_n{n}_steps{steps}_dt{dt}"
    circ_rel, prev_ov = best_saved_circuit(workload)
    with gzip.open(os.path.join(HERE, circ_rel), "rt") as f:
        ansatz = make_quantum_only_circuit(qasm.loads(f.read()))

    prep = neel_circuit(n)
    target = prep.copy()
    co.add_to_circuit(target, trotter_circuit(n, steps, dt, delta=delta,
                                              h=hfield))

    # the saved circuit already contains the Neel-prep gates, so the warm
    # start runs WITHOUT starting_circuit: ansatz|0> == saved solution state
    config = AdaptConfig(method="brickwall",
                         cost_improvement_num_layers=1000,
                         sufficient_cost=sufficient,
                         max_layers=extra_layers,
                         max_layers_to_modify=window)
    backend = mps_backend_with_args(mps_truncation_threshold=1e-8,
                                    max_chi=chi)
    compiler = AdaptCompiler(
        target, backend=backend, adapt_config=config,
        coupling_map=generate_coupling_map(n, CMAP_LINEAR),
        custom_layer_2q_gate=identity_resolvable(),
        optimise_local_cost=local_cost,
        soften_global_cost=soften)
    t0 = time.time()
    compiler, result = compile_with_recovery(
        compiler, f"spin_refine_n{n}_s{steps}_chi{chi}",
        initial_ansatz=ansatz)
    wall = time.time() - t0

    sol_2q, _ = co.find_num_gates(result.circuit)
    sol_depth = result.circuit.multi_qubit_gate_depth()
    saved = _save_circuit(result, f"spin_n{n}_s{steps}_refined")
    sm_raw = sm_sol = None
    try:
        sm_raw = staggered_magnetisation(target, chi=64)
        sm_sol = staggered_magnetisation(result.circuit, chi=64)
    except Exception as exc:  # pragma: no cover - benchmark resilience
        print(f"staggered-magnetisation check failed: {exc}", file=sys.stderr)
    engine_ov = None
    try:
        if int(os.environ.get("SPIN_CROSS_ENGINE", "1")):
            from adaptaqc_tpu.utils.verification import cross_engine_overlap
            engine_ov = cross_engine_overlap(target, result.circuit, chi=64)
    except Exception as exc:  # pragma: no cover - benchmark resilience
        print(f"cross-engine check failed: {exc}", file=sys.stderr)
    record = {
        "workload": workload,
        "delta": delta,
        "h": hfield,
        "overlap": round(result.overlap, 4),
        "layers": len(result.qubit_pair_history),
        "solution_2q_gates": sol_2q,
        "solution_2q_depth": sol_depth,
        "wall_seconds": round(wall, 1),
        "cost_evaluations": result.cost_evaluations,
        "working_chi": chi,
        "method": "brickwall",
        "rotosolve_window": window,
        "local_cost": local_cost,
        "softened": soften,
        "refined_from": circ_rel,
        "refined_from_overlap": prev_ov,
        "independent_engine_overlap": (
            None if engine_ov is None else round(engine_ov, 4)),
        "sm_raw": None if sm_raw is None else round(sm_raw, 4),
        "sm_solution": None if sm_sol is None else round(sm_sol, 4),
        "circuit": saved,
        "build": _git_rev(),
        "platform": _platform(),
    }
    print(f"{workload}: refined {prev_ov:.4f} -> {result.overlap:.4f} "
          f"wall={wall:.1f}s")
    print(json.dumps(record), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
