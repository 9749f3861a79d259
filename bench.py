"""Benchmark: ADAPT-AQC hot-loop throughput on the paper workload scale.

Measures equivalent cost-evaluations/second of the Rotoselect sweep at the
reference's flagship scale (50-qubit MPS target, paper/random_mps workload;
/root/reference/examples/simple_mps_example.py runs 50 qubits). One
"equivalent cost evaluation" is what the reference performs per Rotosolve
probe: a full-circuit MPS simulation + overlap in Aer
(cost_minimiser.py:344-368 -> aer_mps_backend.py:49-78). Our sweep produces
the same sequential angle updates from cached environments, so evals/sec =
(probe evaluations implied by reference semantics) / wall-clock.

vs_baseline denominator: a MEASURED run of the identical sweep program on
CPU-JAX (one process-isolated worker run, cached in
benchmarks/cpu_baseline.json — delete that file to re-measure). This is a
proxy for the reference's Aer-MPS-on-CPU engine: same algorithmic work, same
host CPU. The reference itself publishes no throughput numbers (BASELINE.md).

Also reports a FLOP model (chi^3 contraction/SVD counts per sweep, see
`sweep_flop_model`): achieved FLOP/s and model FLOP utilisation (MFU)
against the chip's bf16 peak quantify how far the sweep sits from
speed-of-light. (XLA's cost_analysis is NOT used: it counts while/scan
bodies once, so it undercounts loop-heavy programs by the trip count.)

Prints ONE JSON line to stdout; diagnostics go to stderr.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "cpu_baseline.json")

# bf16 MXU peak per chip by device kind (jax-ml.github.io/scaling-book).
# The sweep's matmuls run split-complex f32 at Precision.HIGHEST, so MFU vs
# the bf16 peak understates the f32-relative utilisation by the 6-pass
# factor; report both references.
PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_workload(n, chi, window_layers):
    """(prefix MPS, ansatz tape, sweep callable pieces) for the paper-scale
    workload: a layered random-entangling 50q target + a window of
    thinly-dressed CNOT layers to Rotoselect over."""
    import jax
    import jax.numpy as jnp
    from adaptaqc_tpu.circuits.circuit import Circuit
    from adaptaqc_tpu.circuits.tape import compile_tape
    from adaptaqc_tpu.backends import mps_core
    from adaptaqc_tpu.optim import sweeps

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
                                 jnp.asarray(ttape.kinds),
                                 jnp.asarray(ttape.q0),
                                 jnp.asarray(ttape.q1),
                                 jnp.asarray(ttape.angles), 1e-16)
    jax.block_until_ready(prefix.lam)
    log(f"target MPS build: {time.time() - t0:.1f}s "
        f"({ttape.length} gates, incl. compile)")

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
    ref = mps_core.zero_mps(n, chi)
    bl = sweeps.default_block_len(atape.padded_length,
                                  sweeps.state_nbytes(ref))
    return prefix, ref, engine, bl, atape


def sweep_flop_model(n, chi, tape, single_block=False):
    """Real-FLOP count of one Rotoselect sweep over `tape` at bond dim chi.

    Conventions: a complex GEMM (m,k)x(k,n) in split-complex form is 4 real
    GEMMs = 8mkn real FLOPs. Dominant terms per sweep (optim/sweeps.py):

    - gate applies: every tape gate is applied 3x (backward checkpoint
      pass + per-block right-state regeneration + forward apply), or 2x
      when the whole tape fits one block (phase A skipped). A 2q
      apply (mps_core._apply_2q_adjacent) costs
        theta build        8*(2chi*chi*2chi)        = 32 chi^3
        theta^H theta      8*(2chi)^3               = 64 chi^3
        eigh of 4chi embed ~9*(4chi)^3              = 576 chi^3
        U = theta V        8*(2chi*2chi*chi)        = 32 chi^3
        Gram-Schmidt scan  ~24 chi^3
      ~ 728 chi^3 real FLOPs; 1q applies are O(chi^2), ignored.
    - probes: each trainable rotation probes the 2x2 local overlap matrix
      (mps_core.local_overlap_matrix): prefix + suffix transfer scans over
      all n sites, each site 2 physical x 2 complex GEMMs (chi,chi)^3
      = 32 chi^3 -> 64 n chi^3 per probe.
    """
    from adaptaqc_tpu.circuits import gates as G
    kinds = np.asarray(tape.kinds)
    n_2q = int(np.sum((kinds == G.CX) | (kinds == G.CZ) | (kinds == G.SWAP)
                      | (kinds >= G.N_KINDS)))
    n_rot = int(np.sum(np.asarray(tape.trainable)))
    passes = 2 if single_block else 3  # single-block sweeps skip phase A
    apply_flops = passes * n_2q * 728 * chi ** 3
    probe_flops = n_rot * 64 * n * chi ** 3
    return float(apply_flops + probe_flops)


def run_sweep_benchmark(n, chi, window_layers, iters):
    """Returns (evals_per_sec, evals_per_sweep, dt_seconds, flops_per_sweep)."""
    import jax
    import jax.numpy as jnp
    from adaptaqc_tpu.optim import sweeps

    prefix, ref, engine, bl, atape = build_workload(n, chi, window_layers)
    q0, q1 = jnp.asarray(atape.q0), jnp.asarray(atape.q1)
    sel = jnp.asarray(atape.trainable)
    kinds, angles = jnp.asarray(atape.kinds), jnp.asarray(atape.angles)

    flops_per_sweep = sweep_flop_model(n, chi, atape,
                                       single_block=(bl >= atape.padded_length))

    # production sweeps run as ONE fused device program
    # (sweep_until_converged); measure the same shape here — per-call relay
    # latency (~33-70 ms on the axon tunnel) would otherwise dominate and
    # understate device throughput by orders of magnitude
    t0 = time.time()
    out = sweeps.sweep(engine, bl, True, prefix, ref, kinds, q0, q1, angles,
                       sel)
    jax.block_until_ready(out[2])
    log(f"first sweep (incl. compile): {time.time() - t0:.1f}s")
    evals_per_sweep = int(out[4])

    fused = sweeps.sweep_n_cycles
    out2 = fused(engine, bl, True, iters, prefix, ref, kinds, q0, q1,
                 angles, sel)
    jax.block_until_ready(out2[2])  # compile the fused loop
    t0 = time.time()
    out2 = fused(engine, bl, True, iters, prefix, ref, out2[0], q0, q1,
                 out2[1], sel)
    jax.block_until_ready(out2[2])
    dt = (time.time() - t0) / iters
    log(f"steady sweep (fused x{iters}): {dt * 1e3:.2f} ms/sweep, "
        f"{evals_per_sweep} equivalent evals/sweep, "
        f"cost {float(out2[2]):.6f}")
    return evals_per_sweep / dt, evals_per_sweep, dt, flops_per_sweep


def measured_cpu_baseline(n, chi, window_layers):
    """Measured CPU-JAX evals/s for the identical sweep, via a subprocess
    with JAX_PLATFORMS=cpu; cached in benchmarks/cpu_baseline.json."""
    key = f"n{n}_chi{chi}_w{window_layers}"
    try:
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
        if key in cache:
            log(f"cpu baseline (cached): {cache[key]['evals_per_sec']:.1f} "
                "evals/s")
            return cache[key]["evals_per_sec"], True
    except OSError:
        cache = {}

    log("measuring cpu-jax baseline (subprocess)...")
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "BENCH_BASELINE_WORKER": "1",
                "BENCH_N": str(n), "BENCH_CHI": str(chi),
                "BENCH_LAYERS": str(window_layers)})
    # keep the axon site off the path so the TPU plugin cannot latch
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                          env=env, capture_output=True, text=True,
                          timeout=1800)
    if proc.returncode != 0:
        log(f"cpu baseline worker failed (rc={proc.returncode}); tail: "
            f"{proc.stderr[-500:]}")
        return None, False
    value = json.loads(proc.stdout.strip().splitlines()[-1])["evals_per_sec"]
    cache[key] = {"evals_per_sec": value,
                  "note": "measured CPU-JAX sweep on this host"}
    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    log(f"cpu baseline (measured): {value:.1f} evals/s")
    return value, False


def tunnel_alive(timeout=240):
    """Probe device initialisation in a subprocess: the axon tunnel, when
    down, makes jax.devices() hang indefinitely (not error), which would
    hang the whole benchmark. A subprocess can be killed; in-process jax
    cannot."""
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout)
        return probe.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if (os.environ.get("JAX_PLATFORMS", "") != "cpu"
            and not os.environ.get("BENCH_TUNNEL_CHECKED")):
        os.environ["BENCH_TUNNEL_CHECKED"] = "1"
        if not tunnel_alive():
            log("TPU tunnel unresponsive; re-running on CPU (labeled)")
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ["BENCH_TUNNEL_FALLBACK"] = "1"
            os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)],
                      os.environ)

    import jax
    if os.environ.get("BENCH_TUNNEL_FALLBACK"):
        jax.config.update("jax_platforms", "cpu")

    n = int(os.environ.get("BENCH_N", 50))
    chi = int(os.environ.get("BENCH_CHI", 64))
    window_layers = int(os.environ.get("BENCH_LAYERS", 12))

    def _descendants(pid):
        out = []
        try:
            import glob as _glob
            for child_file in _glob.glob(f"/proc/{pid}/task/*/children"):
                with open(child_file) as f:
                    for c in f.read().split():
                        c = int(c)
                        out.append(c)
                        out.extend(_descendants(c))
        except OSError:
            pass
        return out

    def _ancestors():
        """PIDs on the chain from this process up to init (via /proc stat),
        so a bench launched FROM a queue never stops its own parents."""
        chain, pid = set(), os.getpid()
        while pid > 1:
            chain.add(pid)
            try:
                with open(f"/proc/{pid}/stat") as f:
                    pid = int(f.read().rsplit(")", 1)[1].split()[1])
            except (OSError, ValueError, IndexError):
                break
        return chain

    def _pause_queue_jobs():
        """Quiesce the benchmark queues for the measurement (exact PIDs from
        the pid files + /proc children — never pattern-matched).

        Shells/timeouts are SIGSTOPped (harmless), but in-flight python TPU
        CLIENTS are KILLED: a SIGSTOPped client's half-open worker session
        plus the bench's own client crashed the TPU worker three times on
        2026-08-19 (docs/tpu_design_notes.md operational lessons). Killed
        compiles are recoverable — every benchmark harness checkpoints via
        compile_with_recovery and the jobrunner retries failed jobs in a
        fresh process, resuming from the newest checkpoint."""
        paused = []
        skip = _ancestors()
        import glob as _glob
        pidfiles = (_glob.glob("/tmp/*seed_queue*.pid")
                    + _glob.glob("/tmp/ladder*.pid"))
        clients = []
        for pidfile in sorted(set(pidfiles)):
            try:
                with open(pidfile) as f:
                    root_pid = int(f.read().strip())
            except (OSError, ValueError):
                continue
            # Stop the ROOT runner shell first: a runner whose child job
            # dies otherwise advances to its NEXT job mid-measurement
            # (observed 2026-08-20: jobrunner started teig_check next to
            # bench — the two-client worker-crash condition).
            if root_pid not in skip:
                try:
                    with open(f"/proc/{root_pid}/comm") as f:
                        root_comm = f.read().strip()
                except OSError:
                    root_comm = ""
                if root_comm.startswith("python"):
                    # a pidfile recording a python ROOT is an in-flight TPU
                    # client itself: kill it like python descendants (it is
                    # not in its own _descendants), never leave it running
                    # beside the bench client (two-client worker crash)
                    clients.append(root_pid)
                elif root_comm:
                    try:
                        os.kill(root_pid, signal.SIGSTOP)
                        paused.append(root_pid)
                    except (OSError, ProcessLookupError):
                        pass
            for pid in _descendants(root_pid):
                if pid in skip:
                    continue
                try:
                    with open(f"/proc/{pid}/comm") as f:
                        comm = f.read().strip()
                except OSError:
                    continue
                if comm.startswith("python"):
                    clients.append(pid)
                    continue
                try:
                    os.kill(pid, signal.SIGSTOP)
                    paused.append(pid)
                except (OSError, ProcessLookupError):
                    pass
        for pid in clients:  # shells are stopped: nothing respawns
            try:
                os.kill(pid, signal.SIGKILL)
            except (OSError, ProcessLookupError):
                pass
        if paused or clients:
            log(f"bench: paused queue shells {paused}, killed in-flight "
                f"clients {clients} (checkpointed; runners retry+resume)")
        return paused

    def _resume_queue_jobs(paused):
        for pid in reversed(paused):
            try:
                os.kill(pid, signal.SIGCONT)
            except (OSError, ProcessLookupError):
                pass

    if os.environ.get("BENCH_BASELINE_WORKER"):
        jax.config.update("jax_platforms", "cpu")
        evals_per_sec, _, _, _ = run_sweep_benchmark(n, chi, window_layers,
                                                     iters=2)
        print(json.dumps({"evals_per_sec": round(evals_per_sec, 1)}))
        return

    iters = int(os.environ.get("BENCH_ITERS", 10))
    device = jax.devices()[0]
    log(f"bench: n={n} chi={chi} devices={jax.devices()}")

    # Measurement hygiene on a ONE-core host (VERDICT r2 weak #1): hold a
    # lockfile that benchmarks/cpu_seed_queue.sh pauses on (and
    # seed_queue.sh pauses on at job boundaries), SIGSTOP any in-flight
    # queue job for the duration (both queues' jobs otherwise contend for
    # the single core and the TPU and contaminate the measurement — the
    # BENCH_r02 0.37x regression was exactly this failure mode), and record
    # the load average so a contended measurement is still self-labeling.
    load_before = os.getloadavg()
    lock = "/tmp/adaptaqc_bench.lock"
    # another runner (e.g. benchmarks/ladder_n50.sh) may already hold the
    # lock for its whole multi-hour run: don't delete it on exit then, or
    # the seed queue would resume next to the still-running holder
    lock_preexisting = os.path.exists(lock)
    if not lock_preexisting:
        with open(lock, "w") as f:
            f.write(str(os.getpid()))
    paused = _pause_queue_jobs()
    try:
        evals_per_sec, evals_per_sweep, dt, flops = run_sweep_benchmark(
            n, chi, window_layers, iters)
    finally:
        _resume_queue_jobs(paused)
        if not lock_preexisting:
            try:
                os.remove(lock)
            except OSError:
                pass

    from adaptaqc_tpu.ops import cplx
    extras = {"eigh_impl": cplx._eigh_impl(),
              "loadavg_1m_at_start": round(load_before[0], 2),
              "loadavg_1m_at_end": round(os.getloadavg()[0], 2)}
    if flops:
        achieved = flops / dt
        extras["flops_per_sweep"] = round(flops)
        extras["achieved_tflops"] = round(achieved / 1e12, 3)
        peak = PEAK_BF16_FLOPS.get(device.device_kind)
        if peak:
            extras["mfu_vs_bf16_peak"] = round(achieved / peak, 5)
            log(f"FLOP model: {flops / 1e9:.2f} GFLOP/sweep, "
                f"{achieved / 1e12:.3f} TFLOP/s achieved, "
                f"MFU {100 * achieved / peak:.2f}% of bf16 peak "
                f"({device.device_kind}; f32 HIGHEST matmuls pay a ~6x "
                "multi-pass factor vs bf16)")

    # convergence evidence from recorded paper-workload runs. Single
    # criterion, single code path: benchmarks/summarize.py (per-seed best of
    # compiler overlap and independent chi=64 re-check, strict > 0.99).
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        import summarize as _summ
        rm = _summ.random_mps_summary()
        if rm["runs"]:
            extras["random_mps_50q_runs"] = rm["runs"]
            extras["random_mps_50q_seeds_tried"] = rm["seeds_tried"]
            extras["random_mps_50q_seeds_converged"] = rm["seeds_converged"]
    except Exception as e:
        log(f"bench: could not summarise paper records: {e}")

    baseline, cached = measured_cpu_baseline(n, chi, window_layers)
    if baseline:
        extras["baseline_cpu_jax_evals_per_sec"] = baseline
        extras["baseline_kind"] = ("measured CPU-JAX sweep"
                                   + (" (cached)" if cached else ""))
        vs_baseline = round(evals_per_sec / baseline, 2)
    else:
        vs_baseline = None

    unit = "equivalent cost evaluations / second (n=%d, chi=%d)" % (n, chi)
    fallback = bool(os.environ.get("BENCH_TUNNEL_FALLBACK"))
    if fallback:
        unit += " [CPU FALLBACK - TPU tunnel down at bench time]"
        last = _last_tpu_record()
        if last:
            # context only, clearly labeled: the most recent REAL-TPU run of
            # this same benchmark (recorded whenever bench.py runs on-device)
            extras["last_recorded_tpu_evals_per_sec"] = last["value"]
            extras["last_recorded_tpu_build"] = last.get("build")
            extras["last_recorded_tpu_utc"] = last.get("utc")
    record = {
        "metric": "overlap_cost_evals_per_sec_50q_mps",
        "value": round(evals_per_sec, 1),
        "unit": unit,
        "vs_baseline": vs_baseline,
        **extras,
    }
    if not fallback and "TPU" in device.device_kind.upper():
        _append_tpu_record(record, device.device_kind)
    print(json.dumps(record))


TPU_HISTORY = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchmarks", "tpu_bench_history.jsonl")


def _last_tpu_record():
    try:
        with open(TPU_HISTORY) as f:
            lines = [l for l in f.read().splitlines() if l.strip()]
        return json.loads(lines[-1]) if lines else None
    except (OSError, ValueError):
        return None


def _append_tpu_record(record, device_kind):
    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        entry = dict(record)
        entry["build"] = rev.stdout.strip() or None
        entry["device_kind"] = device_kind
        entry["utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        with open(TPU_HISTORY, "a") as f:
            f.write(json.dumps(entry) + "\n")
    except OSError as e:
        log(f"bench: could not append TPU history: {e}")


if __name__ == "__main__":
    main()
