"""Benchmark: ADAPT-AQC hot-loop throughput on the paper workload scale.

Measures equivalent cost-evaluations/second of the Rotoselect sweep at the
reference's flagship scale (50-qubit MPS target, paper/random_mps workload;
/root/reference/examples/simple_mps_example.py runs 50 qubits). One
"equivalent cost evaluation" is what the reference performs per Rotosolve
probe: a full-circuit MPS simulation + overlap in Aer
(cost_minimiser.py:344-368 -> aer_mps_backend.py:49-78). Our sweep produces
the same sequential angle updates from cached environments, so evals/sec =
(probe evaluations implied by reference semantics) / wall-clock.

Baseline (vs_baseline denominator): the reference publishes no throughput
numbers (BASELINE.md). Estimated Aer-MPS-on-CPU throughput for the same
workload: each probe re-simulates ~60 active two-qubit-gate layers at
chi<=64 on 50 qubits (~1 ms/gate-SVD in Aer's C++), i.e. ~60 ms/eval ->
~16 evals/s. vs_baseline = measured / 16.0 (estimate, not a measured
reference run — qiskit/Aer is not installed in this image).

Prints ONE JSON line to stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from adaptaqc_tpu.circuits.circuit import Circuit
    from adaptaqc_tpu.circuits.tape import compile_tape
    from adaptaqc_tpu.backends import mps_core
    from adaptaqc_tpu.optim import sweeps

    n = int(os.environ.get("BENCH_N", 50))
    chi = int(os.environ.get("BENCH_CHI", 64))
    window_layers = int(os.environ.get("BENCH_LAYERS", 12))
    iters = int(os.environ.get("BENCH_ITERS", 10))

    log(f"bench: n={n} chi={chi} devices={jax.devices()}")

    # Target: a layered random-entangling circuit (a 50q random-MPS state,
    # the paper/random_mps workload shape).
    rng = np.random.default_rng(0)
    target = Circuit(n)
    for q in range(n):
        target.ry(float(rng.uniform(-3, 3)), q)
    for layer in range(3):
        for q in range(layer % 2, n - 1, 2):
            target.cx(q, q + 1)
        for q in range(n):
            target.rz(float(rng.uniform(-3, 3)), q)
    ttape = compile_tape(target)
    t0 = time.time()
    prefix = mps_core.apply_tape(mps_core.zero_mps(n, chi),
                                 jnp.asarray(ttape.kinds), jnp.asarray(ttape.q0),
                                 jnp.asarray(ttape.q1), jnp.asarray(ttape.angles),
                                 1e-16)
    jax.block_until_ready(prefix.lam)
    log(f"target MPS build: {time.time() - t0:.1f}s "
        f"({ttape.length} gates, incl. compile)")

    # Active window: `window_layers` thinly-dressed CNOT layers (the ansatz
    # the ADAPT loop optimises each iteration).
    ansatz = Circuit(n)
    for _ in range(window_layers):
        a = int(rng.integers(n - 1))
        ansatz.rz(0.1, a)
        ansatz.rz(0.1, a + 1)
        ansatz.cx(a, a + 1)
        ansatz.rz(0.1, a)
        ansatz.rz(0.1, a + 1)
    atape = compile_tape(ansatz)
    engine = mps_core.sweep_engine(1e-16)
    bl = sweeps.default_block_len(atape.padded_length)
    ref = mps_core.zero_mps(n, chi)
    args = (jnp.asarray(atape.q0), jnp.asarray(atape.q1))
    sel = jnp.asarray(atape.trainable)
    kinds, angles = jnp.asarray(atape.kinds), jnp.asarray(atape.angles)

    t0 = time.time()
    out = sweeps.sweep(engine, bl, True, prefix, ref, kinds, args[0], args[1],
                       angles, sel)
    jax.block_until_ready(out[2])
    log(f"first sweep (incl. compile): {time.time() - t0:.1f}s")

    evals_per_sweep = int(out[4])
    t0 = time.time()
    k, a = out[0], out[1]
    for _ in range(iters):
        out = sweeps.sweep(engine, bl, True, prefix, ref, k, args[0], args[1],
                           a, sel)
        k, a = out[0], out[1]
    jax.block_until_ready(out[2])
    dt = (time.time() - t0) / iters
    evals_per_sec = evals_per_sweep / dt
    log(f"steady sweep: {dt * 1e3:.1f} ms, {evals_per_sweep} equivalent "
        f"evals/sweep, cost {float(out[2]):.6f}")

    baseline_evals_per_sec = 16.0  # estimated Aer-MPS CPU (see docstring)
    print(json.dumps({
        "metric": "overlap_cost_evals_per_sec_50q_mps",
        "value": round(evals_per_sec, 1),
        "unit": "equivalent cost evaluations / second (n=%d, chi=%d)" % (n, chi),
        "vs_baseline": round(evals_per_sec / baseline_evals_per_sec, 2),
    }))


if __name__ == "__main__":
    main()
