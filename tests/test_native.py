"""Native C++ circuit-runtime kernels vs the Python implementations."""

import numpy as np
import pytest

from adaptaqc_tpu.circuits.circuit import Circuit
from adaptaqc_tpu.circuits import peephole
from adaptaqc_tpu.ops import native

from reference_sim import simulate
from test_sv_core import random_circuit

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native circkit not built")


def python_peephole(qc, **kw):
    """Run the pure-Python path regardless of native availability."""
    out = qc.copy()
    gate_range = [0, len(out.data)]
    last = len(out.data)
    i = 0
    while True:
        if i == 0:
            peephole.remove_unnecessary_1q_gates_from_circuit(
                out, kw.get("remove_zero_gates", True),
                kw.get("remove_small_gates", False), tuple(gate_range))
            i = 1
        else:
            peephole.remove_unnecessary_2q_gates_from_circuit(out, tuple(gate_range))
            i = 0
        new = len(out.data)
        if new != last:
            gate_range[1] -= last - new
            last = new
        elif i == 0:
            return out


@pytest.mark.parametrize("seed", range(6))
def test_native_peephole_matches_python(seed):
    rng = np.random.default_rng(seed)
    qc = random_circuit(4, 40, rng)
    qc.cx(0, 1)
    qc.cx(0, 1)
    qc.rz(0.0, 2)

    py = python_peephole(qc)
    nat = qc.copy()
    assert native.peephole(nat)

    assert len(nat.data) == len(py.data)
    # state equivalence with the original (up to global phase)
    s0, s1 = simulate(qc), simulate(nat)
    assert abs(abs(np.vdot(s0, s1)) - 1.0) < 1e-8
    # gate-by-gate identical output
    for a, b in zip(nat.data, py.data):
        assert a.name == b.name and a.qubits == b.qubits
        if a.params:
            assert abs(a.params[0] - b.params[0]) < 1e-9


def test_native_depth_matches_python():
    rng = np.random.default_rng(7)
    qc = random_circuit(5, 30, rng)
    assert native.multi_qubit_gate_depth(qc) == qc.multi_qubit_gate_depth()


def test_native_fallback_on_unsupported():
    qc = Circuit(2)
    qc.set_statevector(np.array([1, 0, 0, 0]))
    qc.rx(0.3, 0)
    assert not native.peephole(qc)  # contains state injection -> fallback
