"""Checkpoint codec: make AdaptCompiler picklable.

The reference pickles the whole compiler object (adapt_compiler.py:484-506).
Here device-resident state (set_mps payloads holding engine MPS pytrees) is
converted to host numpy (Qiskit MPS format) on save and restored to device on
load; jit caches are dropped and rebuilt lazily.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _encode_circuit(circuit):
    if circuit is None:
        return None
    from ..backends import mps_core
    qc = circuit.copy()
    for instr in qc.data:
        if instr.name == "set_mps" and isinstance(instr.payload, mps_core.MPS):
            instr.payload = ("qiskit_mps", mps_core.to_qiskit_mps(instr.payload))
        elif instr.name == "set_statevector":
            instr.payload = np.asarray(instr.payload)
    return qc


def _decode_circuit(circuit, chi):
    if circuit is None:
        return None
    from ..backends import mps_core
    for instr in circuit.data:
        if instr.name == "set_mps" and isinstance(instr.payload, tuple) \
                and len(instr.payload) == 2 and instr.payload[0] == "qiskit_mps":
            instr.payload = mps_core.from_qiskit_mps(instr.payload[1], chi)
    return circuit


_CIRCUIT_ATTRS = ("full_circuit", "circuit_to_compile", "layers_saved_to_mps",
                  "starting_circuit", "initial_state_circuit")


def encode_compiler_state(compiler) -> Dict[str, Any]:
    state = dict(compiler.__dict__)
    # caches and jit machinery are rebuilt lazily
    state["_prefix_cache"] = None
    state["_current_cache"] = None
    state["_advance_hint"] = None
    minimizer = state.pop("minimizer", None)
    if minimizer is not None:
        state["minimizer_fraction"] = minimizer.rotosolve_fraction
    for attr in _CIRCUIT_ATTRS:
        if attr in state:
            state[attr] = _encode_circuit(state[attr])
    if "_orig_target_instr" in state:
        holder = _encode_circuit_instr(state["_orig_target_instr"])
        state["_orig_target_instr"] = holder
    # backend: store constructor spec
    backend = state.pop("backend")
    from ..backends.backend import MPSBackend, SamplingBackend, SVBackend
    if isinstance(backend, MPSBackend):
        # NOTE: mesh objects are process-local and intentionally not
        # persisted; re-attach one after loading if desired
        state["__backend_spec__"] = ("mps", backend.truncation_threshold,
                                     backend.max_chi, backend.mps_log_data)
    elif isinstance(backend, SamplingBackend):
        state["__backend_spec__"] = ("sampling", backend.shots)
    elif isinstance(backend, SVBackend):
        state["__backend_spec__"] = ("sv",)
    else:
        state["__backend_spec__"] = ("custom", backend)
    state.pop("target", None)  # may hold device arrays; not needed to resume
    # gradient op caches hold device arrays; rebuilt on load
    state.pop("_gradient_ops", None)
    return state


def _encode_circuit_instr(instr):
    from ..backends import mps_core
    out = instr.copy()
    if out.name == "set_mps" and isinstance(out.payload, mps_core.MPS):
        out.payload = ("qiskit_mps", mps_core.to_qiskit_mps(out.payload))
    return out


def decode_compiler_state(compiler, state: Dict[str, Any]) -> None:
    from ..backends.backend import MPSBackend, SamplingBackend, SVBackend
    from ..optim.minimiser import CostMinimiser

    spec = state.pop("__backend_spec__", ("sv",))
    if spec[0] == "mps":
        backend = MPSBackend(spec[1], spec[2],
                             spec[3] if len(spec) > 3 else False)
    elif spec[0] == "sampling":
        backend = SamplingBackend(spec[1])
    elif spec[0] == "sv":
        backend = SVBackend()
    else:
        backend = spec[1]
    compiler.__dict__.update(state)
    compiler.backend = backend
    compiler.target = None
    compiler.__dict__.setdefault("_advance_hint", None)
    compiler.__dict__.setdefault("_absorption_bias", 0.0)
    compiler.__dict__.setdefault("_layers_since_verify", 0)

    n = compiler.full_circuit.num_qubits if compiler.full_circuit else 0
    chi = backend.chi_for(n) if isinstance(backend, MPSBackend) else None
    for attr in _CIRCUIT_ATTRS:
        if getattr(compiler, attr, None) is not None:
            _decode_circuit(getattr(compiler, attr), chi)
    if getattr(compiler, "_orig_target_instr", None) is not None:
        instr = compiler._orig_target_instr
        holder = type(compiler.full_circuit)(n)
        holder.data.append(instr)
        _decode_circuit(holder, chi)
        compiler._orig_target_instr = holder.data[0]

    rotosolve_fraction = getattr(compiler, "minimizer_fraction", None)
    fraction = rotosolve_fraction if rotosolve_fraction else 1.0
    compiler.minimizer = CostMinimiser(compiler.evaluate_cost,
                                       compiler.variational_circuit_range,
                                       compiler, fraction)
    # rebuild gradient op cache if needed
    if getattr(compiler, "adapt_config", None) is not None and \
            compiler.adapt_config.method == "general_gradient":
        from ..utils import gradients as gr
        compiler._gradient_ops = gr.prepare_gradient_ops(
            compiler.inverse_zero_ansatz, compiler.generators)
