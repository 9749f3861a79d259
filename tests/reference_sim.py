"""Tiny dense numpy simulator used as the test oracle.

Independently implements little-endian gate application so engine results can
be cross-checked (the reference uses Aer for the same purpose in its
cross-backend equivalence tests, test_approximate_compiler.py:78-150).
"""

import numpy as np

from adaptaqc_tpu.circuits import gates as G
from adaptaqc_tpu.circuits.circuit import Circuit, lower_instruction


def apply_1q(state, u, q, n):
    psi = state.reshape([2] * n)
    # little-endian: qubit q corresponds to axis (n-1-q)
    axis = n - 1 - q
    psi = np.moveaxis(psi, axis, 0)
    psi = np.tensordot(u, psi, axes=[[1], [0]])
    psi = np.moveaxis(psi, 0, axis)
    return psi.reshape(-1)


def apply_2q(state, u4, q0, q1, n):
    """u4 basis index r = 2*b(q1)+b(q0)."""
    psi = state.reshape([2] * n)
    a0, a1 = n - 1 - q0, n - 1 - q1
    psi = np.moveaxis(psi, (a1, a0), (0, 1))  # (b1, b0, rest)
    shape = psi.shape
    psi = psi.reshape(4, -1)
    psi = u4 @ psi
    psi = psi.reshape(shape)
    psi = np.moveaxis(psi, (0, 1), (a1, a0))
    return psi.reshape(-1)


def simulate(circuit: Circuit, state=None) -> np.ndarray:
    n = circuit.num_qubits
    if state is None:
        state = np.zeros(2 ** n, dtype=complex)
        state[0] = 1.0
    else:
        state = np.asarray(state, dtype=complex).copy()
    for instr in circuit.data:
        if instr.name == "set_statevector":
            state = np.asarray(instr.payload, dtype=complex).copy()
            state /= np.linalg.norm(state)
            continue
        if instr.name in ("measure", "barrier"):
            continue
        for low in lower_instruction(instr):
            if len(low.qubits) == 1:
                u = G.u1q_np(low.name, low.params[0] if low.params else 0.0)
                state = apply_1q(state, u, low.qubits[0], n)
            else:
                a, b = low.qubits
                u4 = G.u2q_np(low.name)
                if low.name == "cx" and a > b:
                    # express as matrix on (min, max) ordering
                    m = np.eye(4, dtype=complex)
                    m[[2, 3]] = m[[3, 2]]
                    state = apply_2q(state, m, b, a, n)
                else:
                    state = apply_2q(state, u4, min(a, b), max(a, b), n)
    return state


def overlap(a, b):
    return np.vdot(a, b)
