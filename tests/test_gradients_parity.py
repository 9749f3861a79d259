"""Reference-parity tests for the generator/degeneracy machinery behind the
general_gradient heuristic (test/utils/test_gradients.py:74-200)."""

import numpy as np

from adaptaqc_tpu import Circuit
from adaptaqc_tpu.circuits.operations import (are_circuits_identical,
                                              create_random_circuit)
from adaptaqc_tpu.utils import ansatzes as ans
from adaptaqc_tpu.utils import gradients as gr


def _ident(list_a, list_b):
    return len(list_a) == len(list_b) and all(
        are_circuits_identical(a, b) for a, b in zip(list_a, list_b))


def test_random_ansatz_degeneracy_sums():
    ansatz = create_random_circuit(2, depth=3, seed=9,
                                   two_qubit_gates=["cx"])
    num_rot = sum(1 for i in ansatz.data if i.name in ("rx", "ry", "rz"))
    _, deg_plain = gr.get_generators_and_degeneracies(ansatz, rotoselect=False)
    _, deg_rsel = gr.get_generators_and_degeneracies(ansatz, rotoselect=True)
    assert sum(deg_plain) == num_rot
    assert sum(deg_rsel) == 3 * num_rot


def test_known_ansatz_generators_and_inverses():
    ansatz = Circuit(2)
    ansatz.rx(0, 0)
    ansatz.cx(0, 1)

    def circ(ops):
        qc = Circuit(2)
        for name, qubits in ops:
            if name == "cx":
                qc.cx(*qubits)
            else:
                from adaptaqc_tpu.circuits.circuit import Instruction
                qc.data.append(Instruction(name, qubits))
        return qc

    gen_x = circ([("x", (0,)), ("cx", (0, 1))])
    gen_y = circ([("y", (0,)), ("cx", (0, 1))])
    gen_z = circ([("z", (0,)), ("cx", (0, 1))])
    inv_x = circ([("cx", (0, 1)), ("x", (0,))])
    inv_y = circ([("cx", (0, 1)), ("y", (0,))])
    inv_z = circ([("cx", (0, 1)), ("z", (0,))])

    g, _ = gr.get_generators_and_degeneracies(ansatz, rotoselect=False)
    assert _ident(g, [gen_x])
    g, _ = gr.get_generators_and_degeneracies(ansatz, rotoselect=True)
    assert _ident(g, [gen_x, gen_y, gen_z])
    g, _ = gr.get_generators_and_degeneracies(ansatz, rotoselect=False,
                                              inverse=True)
    assert _ident(g, [inv_x])
    g, _ = gr.get_generators_and_degeneracies(ansatz, rotoselect=True,
                                              inverse=True)
    assert _ident(g, [inv_x, inv_y, inv_z])


def test_get_generator_specific_index():
    ansatz = Circuit(2)
    ansatz.rx(0, 0)
    ansatz.ry(0, 1)
    ansatz.cx(0, 1)
    ansatz.rz(0, 0)
    ansatz.rx(0, 1)
    ansatz.cx(1, 0)
    ansatz.ry(0, 0)
    ansatz.rz(0, 1)
    ansatz.cx(1, 0)

    generator = gr.get_generator(ansatz, index=3, op="ry")
    from adaptaqc_tpu.circuits.circuit import Instruction
    expected = Circuit(2)
    expected.cx(0, 1)
    expected.data.append(Instruction("y", (0,)))
    assert are_circuits_identical(generator, expected)


def test_degenerate_generators_counted():
    ansatz = Circuit(2)
    ansatz.rx(0, 0)
    ansatz.cx(0, 1)
    ansatz.ry(0, 1)
    ansatz.cx(0, 1)
    ansatz.rx(0, 0)

    from adaptaqc_tpu.circuits.circuit import Instruction
    gen_0 = Circuit(2)
    gen_0.data.append(Instruction("x", (0,)))
    gen_1 = Circuit(2)
    gen_1.cx(0, 1)
    gen_1.data.append(Instruction("y", (1,)))
    gen_1.cx(0, 1)

    generators, degeneracies = gr.get_generators_and_degeneracies(ansatz)
    assert _ident(generators, [gen_0, gen_1])
    assert degeneracies == [2, 1]


def test_default_ansatz_generator_counts():
    cases = [
        (ans.fully_dressed_cnot, 8, 12, 12, 36),
        (ans.heisenberg, 5, 5, 15, 15),
        (ans.identity_resolvable, 4, 6, 12, 18),
        (ans.thinly_dressed_cnot, 4, 4, 12, 12),
        (ans.u4, 11, 15, 21, 45),
    ]
    for ansatz_fn, n_plain, tot_plain, n_rsel, tot_rsel in cases:
        g, d = gr.get_generators_and_degeneracies(ansatz_fn(),
                                                  rotoselect=False)
        assert (len(g), sum(d)) == (n_plain, tot_plain), ansatz_fn.__name__
        g, d = gr.get_generators_and_degeneracies(ansatz_fn(),
                                                  rotoselect=True)
        assert (len(g), sum(d)) == (n_rsel, tot_rsel), ansatz_fn.__name__
