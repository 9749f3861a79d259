"""Pairwise entanglement measures for the ISL pair-selection heuristic.

Mirrors /root/reference/adaptaqc/utils/entanglement_measures.py: given the
2-qubit reduced density matrix of the current state, compute concurrence /
EoF / negativity / log-negativity. RDMs come from the engines (statevector
partial trace or cached-environment MPS contraction — both batched on
device); the 4x4 measures run host-side in float64, matching the reference's
numerics exactly.

The shot-based paths (state tomography, two-copy observable concurrence
lower bound) are hardware-oriented; on simulators the reference itself uses
exact RDMs. The sampling backend here estimates the RDM from measured
tomography statistics (see backends/sampling.py).
"""

from __future__ import annotations

import logging

import numpy as np
from scipy import linalg
from scipy.linalg import eig

logger = logging.getLogger(__name__)

EM_OBSERVABLE_CONCURRENCE_LOWER_BOUND = "EM_OBSERVABLE_CONCURRENCE_LOWER_BOUND"
EM_TOMOGRAPHY_EOF = "EM_TOMOGRAPHY_EOF"
EM_TOMOGRAPHY_CONCURRENCE = "EM_TOMOGRAPHY_CONCURRENCE"
EM_TOMOGRAPHY_NEGATIVITY = "EM_TOMOGRAPHY_NEGATIVITY"
EM_TOMOGRAPHY_LOG_NEGATIVITY = "EM_TOMOGRAPHY_LOG_NEGATIVITY"

_MEASURES = {}


def measure_from_rdm(method: str, rho: np.ndarray) -> float:
    if method == EM_TOMOGRAPHY_EOF:
        return eof(rho)
    if method in (EM_TOMOGRAPHY_CONCURRENCE, EM_OBSERVABLE_CONCURRENCE_LOWER_BOUND):
        # on simulators the lower-bound protocol reduces to the exact value
        return concurrence(rho)
    if method == EM_TOMOGRAPHY_NEGATIVITY:
        return negativity(rho)
    if method == EM_TOMOGRAPHY_LOG_NEGATIVITY:
        return log_negativity(rho)
    raise ValueError("Invalid entanglement measure method")


def eof(rho):
    """Entanglement of formation, PhysRevLett.80.2245
    (entanglement_measures.py:262-275)."""
    def h(x):
        return (-x * np.log2(x)) - ((1 - x) * np.log2(1 - x))

    c = concurrence(rho)
    if c == 0:
        return 0
    return h(0.5 * (1 + np.sqrt(1 - c ** 2)))


def concurrence(rho):
    """Mixed-state concurrence, PhysRevLett.80.2245
    (entanglement_measures.py:278-296)."""
    sigma_y = np.array([[0, -1j], [1j, 0]])
    yy = np.kron(sigma_y, sigma_y)
    rho_tilda = yy @ rho.conjugate() @ yy
    eigenvalues = eig(rho @ rho_tilda, left=False, right=False)
    if np.allclose(np.imag(eigenvalues), 0):
        eigenvalues = np.real(eigenvalues)
    else:
        logger.warning("When calculating concurrence, eigenvalues were not real")
        return 0
    lambdas = np.sqrt(eigenvalues.clip(min=0))
    lambdas = sorted(lambdas, reverse=True)
    return np.max([0, lambdas[0] - lambdas[1] - lambdas[2] - lambdas[3]])


def negativity(rho):
    return (trace_norm(partial_transpose(rho)) - 1) / 2


def log_negativity(rho):
    return np.log2(trace_norm(partial_transpose(rho)))


def partial_transpose(density_matrix, wrt=1):
    """entanglement_measures.py:343-356."""
    import copy
    import itertools
    tp = copy.deepcopy(density_matrix)
    for ja, ka, jb, kb in itertools.product(range(2), repeat=4):
        if wrt == 1:
            tp[ka * 2 + jb][ja * 2 + kb] = density_matrix[ja * 2 + jb][ka * 2 + kb]
        elif wrt == 2:
            tp[ja * 2 + kb][ka * 2 + jb] = density_matrix[ja * 2 + jb][ka * 2 + kb]
    return tp


def trace_norm(density_matrix):
    return np.real(np.trace(linalg.sqrtm(
        density_matrix @ np.conjugate(density_matrix).T)))


def partial_trace(statevector, a, b):
    """SV partial trace onto qubits (a, b); a is the LSB of the 4-dim space
    (entanglement_measures.py:325-340)."""
    statevector = np.asarray(statevector)
    num_qubits = int(np.log2(len(statevector)))
    if num_qubits == 2:
        return np.outer(statevector, statevector.conj())
    lo, hi = min(a, b), max(a, b)
    psi = statevector.reshape([2] * num_qubits)
    # little-endian: qubit q is axis (n-1-q)
    keep = [num_qubits - 1 - hi, num_qubits - 1 - lo]
    rest = [ax for ax in range(num_qubits) if ax not in keep]
    psi = np.transpose(psi, keep + rest).reshape(4, -1)
    return psi @ psi.conj().T


def calculate_entanglement_measure(method, circuit, qubit_1, qubit_2, backend,
                                   backend_options=None, execute_kwargs=None,
                                   mps=None):
    """Reference-compatible dispatcher (entanglement_measures.py:39-98).
    The compiler fast-path batches all pairs on device instead; this entry
    point mirrors the per-pair API."""
    rho = backend.two_qubit_rdm(circuit, qubit_1, qubit_2, state=mps)
    return measure_from_rdm(method, rho)
