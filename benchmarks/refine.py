"""Refine a previously recorded paper-seed solution that capped below the
overlap target.

Loads the best saved circuit for the seed from the benchmark records, feeds
it back through `AdaptCompiler.compile(initial_ansatz=...)` (the framework's
reference-parity warm-start path: the ansatz is inverted into the full
circuit, its angles re-optimised by one whole-range Rotosolve, then ADAPT
continues adding layers) at a higher working bond dimension — so a run that
stalled at overlap 0.98 restarts from cost ~0.02 instead of 1-1e-6.

Usage: python benchmarks/refine.py seed [seed ...]
Env: REFINE_CHI (default 64), REFINE_LAYERS (extra layers, default 300),
     REFINE_SUFF (default 8e-3).
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
from random_mps import independent_overlap, load_target

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "results_random_mps.jsonl")


def best_saved_circuit(seed, source="reference paper target"):
    """(circuit_path, recorded_overlap) of the seed's best recorded run that
    saved its compiled circuit."""
    best = None
    with open(RESULTS) as f:
        for line in f:
            r = json.loads(line)
            if (r.get("seed") == seed and r.get("circuit")
                    and r.get("source") == source):
                ov = max(r.get("overlap") or 0.0,
                         r.get("overlap_chi64_check") or 0.0)
                if best is None or ov > best[1]:
                    best = (r["circuit"], ov)
    if best is None:
        raise SystemExit(f"no recorded circuit for seed {seed}")
    return best


def refine(seed):
    from adaptaqc_tpu import AdaptCompiler, AdaptConfig, mps_backend_with_args
    from adaptaqc_tpu.circuits import qasm
    from adaptaqc_tpu.circuits.operations import make_quantum_only_circuit
    from adaptaqc_tpu.utils.ansatzes import identity_resolvable
    from adaptaqc_tpu.utils.constants import CMAP_LINEAR, generate_coupling_map

    chi = int(os.environ.get("REFINE_CHI", 64))
    extra_layers = int(os.environ.get("REFINE_LAYERS", 300))
    sufficient = float(os.environ.get("REFINE_SUFF", 8e-3))
    # REFINE_N: refine a synthetic scale-demonstration record (e.g. the
    # n=100 run) instead of a reference paper target
    n_override = int(os.environ.get("REFINE_N", 0))

    if n_override:
        from random_mps import random_target
        circ_rel, prev_ov = best_saved_circuit(
            seed, source=f"synthetic n={n_override}")
        qmps = random_target(seed, n=n_override)
    else:
        circ_rel, prev_ov = best_saved_circuit(seed)
        qmps = load_target(seed)
    with gzip.open(os.path.join(HERE, circ_rel), "rt") as f:
        ansatz = make_quantum_only_circuit(qasm.loads(f.read()))
    n = len(qmps[0])

    config = AdaptConfig(method="general_gradient",
                         cost_improvement_num_layers=1000,
                         sufficient_cost=sufficient,
                         max_layers=extra_layers)
    backend = mps_backend_with_args(mps_truncation_threshold=1e-8,
                                    max_chi=chi)
    compiler = AdaptCompiler(
        qmps, backend=backend, adapt_config=config,
        coupling_map=generate_coupling_map(n, CMAP_LINEAR),
        custom_layer_2q_gate=identity_resolvable(),
        # REFINE_LOCAL=1: train the refinement on the local (per-qubit)
        # cost (reference local_cost_function; barren-plateau answer);
        # recorded overlap stays global
        optimise_local_cost=bool(int(os.environ.get("REFINE_LOCAL", "0"))))
    t0 = time.time()
    compiler, result = compile_with_recovery(
        compiler, f"refine_seed{seed}_chi{chi}", initial_ansatz=ansatz)
    wall = time.time() - t0

    overlap64 = independent_overlap(qmps, result.circuit)
    engine_ov = None
    try:
        if int(os.environ.get("RMPS_CROSS_ENGINE", "1")):
            from adaptaqc_tpu.utils.verification import cross_engine_overlap
            engine_ov = cross_engine_overlap(qmps, result.circuit, chi=64)
    except Exception as exc:  # pragma: no cover - benchmark resilience
        print(f"cross-engine check failed: {exc}", file=sys.stderr)
    saved = _save_circuit(result, f"seed_{seed}_refined")
    record = {
        "seed": seed,
        "source": (f"synthetic n={n_override}" if n_override
                   else "reference paper target"),
        "n_qubits": n,
        "overlap": round(result.overlap, 4),
        "overlap_chi64_check": round(overlap64, 4),
        "working_chi": chi,
        "layers": len(result.qubit_pair_history),
        "num_2q_gates": result.num_2q_gates,
        "cnot_depth": result.cnot_depth_history[-1],
        "cost_evaluations": result.cost_evaluations,
        "wall_seconds": round(wall, 1),
        "evals_per_sec": round(result.cost_evaluations / max(wall, 1e-9), 1),
        "sufficient_cost": sufficient,
        "refined_from": circ_rel,
        "refined_from_overlap": prev_ov,
        "independent_engine_overlap": (
            None if engine_ov is None else round(engine_ov, 4)),
        "circuit": saved,
        "build": _git_rev(),
        "platform": _platform(),
    }
    print(f"seed {seed}: refined {prev_ov:.4f} -> overlap="
          f"{result.overlap:.4f} (chi64 check {overlap64:.4f}) "
          f"+{len(result.qubit_pair_history)} layers wall={wall:.1f}s")
    with open(RESULTS, "a") as f:
        f.write(json.dumps(record) + "\n")
    return record


def main():
    for seed in [int(s) for s in sys.argv[1:]] or [67]:
        refine(seed)


if __name__ == "__main__":
    main()
