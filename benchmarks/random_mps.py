"""Paper workload: 50-qubit random-MPS preparation (arXiv:2503.09683).

Compiles the reference repo's actual benchmark targets
(/root/reference/paper/random_mps/target_seed_*.pkl — 50-site chi=2 random
MPS in the Qiskit MPS format) with the paper's configuration
(general_gradient method, identity_resolvable ansatz, chi=1-compression
start; examples/advanced_mps_example.py in the reference) and reports the
BASELINE.md north-star metrics: wall-clock to overlap > 0.99, layer count,
and cost-evaluation throughput.

Usage: python benchmarks/random_mps.py [seed ...]
"""

import logging
import pickle
import sys
import time

import numpy as np

logging.basicConfig(stream=sys.stderr)
logging.getLogger("adaptaqc_tpu").setLevel(logging.INFO)

REFERENCE_TARGETS = "/root/reference/paper/random_mps"


def load_target(seed: int):
    with open(f"{REFERENCE_TARGETS}/target_seed_{seed}.pkl", "rb") as f:
        return pickle.load(f)


def random_target(seed: int, n=50, chi=2):
    """Self-contained substitute when the reference data is unavailable:
    a random chi=2 MPS in Qiskit format."""
    rng = np.random.default_rng(seed)
    gams, lams = [], []
    dims = [1] + [chi] * (n - 1) + [1]
    for i in range(n):
        dl, dr = dims[i], dims[i + 1]
        pair = tuple(rng.normal(size=(dl, dr)) + 1j * rng.normal(size=(dl, dr))
                     for _ in range(2))
        gams.append(pair)
        if i < n - 1:
            v = np.sort(rng.uniform(0.2, 1.0, size=dims[i + 1]))[::-1]
            lams.append(v / np.linalg.norm(v))
    # normalise site tensors roughly (the compiler renormalises anyway)
    return gams, lams


def compile_target(qmps, max_chi=None, sufficient_cost=1e-2, max_layers=400,
                   method="general_gradient"):
    import os
    if max_chi is None:
        # chi=32 runs ~2x faster; chi=64 keeps the absorbed-prefix cost
        # within ~1e-3 of the exact re-simulation at termination
        max_chi = int(os.environ.get("RMPS_CHI", 64))
    from adaptaqc_tpu import AdaptCompiler, AdaptConfig, mps_backend_with_args
    from adaptaqc_tpu.utils.ansatzes import identity_resolvable
    from adaptaqc_tpu.utils.constants import CMAP_LINEAR, generate_coupling_map

    n = len(qmps[0])
    # reference-default rotosolve schedule (rotosolve_frequency=1,
    # max_layers_to_modify=100): the trailing window is re-optimised after
    # every layer — weakening this (e.g. frequency 10 / window 10) plateaus
    # well short of 0.99 overlap on the paper targets
    # patience: the 50q targets have long slow stretches before late, fast
    # convergence phases; a tight improvement window stops at overlap ~0.98
    config = AdaptConfig(
        method=method,
        cost_improvement_num_layers=1000,
        sufficient_cost=sufficient_cost,
        max_layers=max_layers,
    )
    backend = mps_backend_with_args(mps_truncation_threshold=1e-8,
                                    max_chi=max_chi)
    compiler = AdaptCompiler(
        qmps, backend=backend, adapt_config=config,
        coupling_map=generate_coupling_map(n, CMAP_LINEAR),
        custom_layer_2q_gate=identity_resolvable(),
        starting_circuit="tenpy_product_state",
    )
    t0 = time.time()
    result = compiler.compile()
    wall = time.time() - t0
    return result, wall


def main():
    import json
    import os
    seeds = [int(s) for s in sys.argv[1:]] or [1]
    results_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "results_random_mps.jsonl")
    for seed in seeds:
        try:
            qmps = load_target(seed)
            source = "reference paper target"
        except OSError:
            qmps = random_target(seed)
            source = "synthetic fallback"
        result, wall = compile_target(qmps)
        layers = len(result.qubit_pair_history)
        record = {
            "seed": seed,
            "source": source,
            "n_qubits": len(qmps[0]),
            "overlap": round(result.overlap, 4),
            "layers": layers,
            "num_2q_gates": result.num_2q_gates,
            "cnot_depth": result.cnot_depth_history[-1],
            "cost_evaluations": result.cost_evaluations,
            "wall_seconds": round(wall, 1),
            "evals_per_sec": round(result.cost_evaluations / wall, 1),
        }
        print(f"seed {seed}: overlap={result.overlap:.4f} layers={layers} "
              f"2q_gates={result.num_2q_gates} "
              f"cnot_depth={result.cnot_depth_history[-1]} "
              f"evals={result.cost_evaluations} wall={wall:.1f}s "
              f"({result.cost_evaluations / wall:.0f} evals/s)")
        with open(results_path, "a") as f:
            f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
