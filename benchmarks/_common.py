"""Shared benchmark-record helpers.

Imported at module top by the harnesses so that nothing new is imported at
record-write time: a multi-hour compile must never lose its record to a
mid-edit import or a serialisation error (this happened once — see the
recovered seed-65 record).
"""
import gzip
import os
import subprocess
import time

CIRCUITS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "circuits")


def git_rev():
    """Engine build identifier for benchmark records (trajectories are
    chaotically sensitive to f32-level engine changes, so records must say
    which build produced them)."""
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=10).stdout.strip() or None
    except Exception:
        return None


def platform():
    """Which jax backend produced a record ("cpu" during tunnel outages,
    "axon"/"tpu" on the real chip). Never raises."""
    try:
        import jax
        return jax.default_backend()
    except Exception:
        return None


def save_circuit(result, name_prefix):
    """Persist the compiled circuit (QASM already rendered on the result —
    adapt_compiler stores result.circuit_qasm at compile end) so any record
    can be re-simulated later. Never raises: returns the repo-relative path
    or None."""
    try:
        text = getattr(result, "circuit_qasm", None)
        if not text:
            from adaptaqc_tpu.circuits import qasm
            text = qasm.dumps(result.circuit)
        os.makedirs(CIRCUITS_DIR, exist_ok=True)
        name = f"{name_prefix}_{int(time.time())}.qasm.gz"
        with gzip.open(os.path.join(CIRCUITS_DIR, name), "wt") as f:
            f.write(text)
        return f"circuits/{name}"
    except Exception:
        return None
