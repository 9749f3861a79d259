import numpy as np
import jax.numpy as jnp
import pytest

from adaptaqc_tpu.circuits import gates as G
from adaptaqc_tpu.circuits.circuit import Circuit, create_1q_gate
from adaptaqc_tpu.circuits.tape import compile_tape
from adaptaqc_tpu.backends import sv_core
from adaptaqc_tpu.ops import cplx
from adaptaqc_tpu.optim import sweeps
from adaptaqc_tpu.optim.sinusoidal import minimum_of_sinusoidal

from reference_sim import simulate


def random_circuit(n, depth, rng, twoq="cx"):
    qc = Circuit(n)
    for _ in range(depth):
        kind = rng.choice(["rx", "ry", "rz", twoq, "h"])
        if kind in ("cx", "cz"):
            a, b = rng.choice(n, 2, replace=False)
            getattr(qc, kind)(int(a), int(b))
        elif kind == "h":
            qc.h(int(rng.integers(n)))
        else:
            getattr(qc, kind)(float(rng.uniform(-np.pi, np.pi)), int(rng.integers(n)))
    return qc


def test_tape_apply_matches_dense_sim():
    rng = np.random.default_rng(0)
    for n in (2, 3, 5):
        qc = random_circuit(n, 20, rng)
        tape = compile_tape(qc)
        state = sv_core.apply_tape(sv_core.zero_state(n), tape.kinds, tape.q0,
                                   tape.q1, tape.angles)
        expected = simulate(qc)
        np.testing.assert_allclose(cplx.to_np(state), expected, atol=1e-10)


def test_tape_adjoint_inverts_tape():
    rng = np.random.default_rng(1)
    qc = random_circuit(4, 25, rng, twoq="cz")
    tape = compile_tape(qc)
    s0 = sv_core.state_from_vector(rng.normal(size=16) + 1j * rng.normal(size=16))
    s1 = sv_core.apply_tape(s0, tape.kinds, tape.q0, tape.q1, tape.angles)
    s2 = sv_core.apply_tape_adjoint(s1, tape.kinds, tape.q0, tape.q1, tape.angles)
    np.testing.assert_allclose(cplx.to_np(s2), cplx.to_np(s0), atol=1e-10)


def test_local_overlap_matrix():
    rng = np.random.default_rng(2)
    n = 3
    L = rng.normal(size=8) + 1j * rng.normal(size=8)
    R = rng.normal(size=8) + 1j * rng.normal(size=8)
    for q in range(n):
        C = cplx.to_np(sv_core.local_overlap_matrix(cplx.from_np(R, jnp.float64), cplx.from_np(L, jnp.float64), q))
        for theta in (0.3, -1.2):
            u = G.u1q_np("ry", theta)
            z_direct = np.vdot(R, simulate(Circuit(n).ry(theta, q), state=L))
            z_local = np.sum(u * C)
            assert abs(z_direct - z_local) < 1e-10


def test_z_expectations():
    qc = Circuit(3)
    qc.x(0)
    qc.h(2)
    tape = compile_tape(qc)
    s = sv_core.apply_tape(sv_core.zero_state(3), tape.kinds, tape.q0, tape.q1,
                           tape.angles)
    evs = np.asarray(sv_core.z_expectations(s, 3))
    np.testing.assert_allclose(evs, [-1.0, 1.0, 0.0], atol=1e-9)


def test_rdm2_bell_state():
    qc = Circuit(3)
    qc.h(0)
    qc.cx(0, 2)
    tape = compile_tape(qc)
    s = sv_core.apply_tape(sv_core.zero_state(3), tape.kinds, tape.q0, tape.q1,
                           tape.angles)
    rho = cplx.to_np(sv_core.rdm2(s, 0, 2))
    expected = np.zeros((4, 4), dtype=complex)
    expected[0, 0] = expected[0, 3] = expected[3, 0] = expected[3, 3] = 0.5
    np.testing.assert_allclose(rho, expected, atol=1e-9)


def brute_force_rotosolve(qc, sel_indices, rotoselect=False):
    """Oracle: sequential coordinate descent with full re-simulation per probe
    (mirrors cost_minimiser.py:267-368)."""
    qc = qc.copy()

    def cost():
        s = simulate(qc)
        return 1.0 - abs(s[0]) ** 2

    for i in sel_indices:
        instr = qc.data[i]
        if not instr.is_supported_1q_gate():
            continue
        names = ["rx", "ry", "rz"] if rotoselect else [instr.base_label]
        best = (None, None, np.inf)
        qc.data[i] = create_1q_gate(names[0], 0.0, instr.qubits[0])
        c0 = cost()
        for name in names:
            probes = []
            for th in (np.pi / 2, -np.pi / 2):
                qc.data[i] = create_1q_gate(name, th, instr.qubits[0])
                probes.append(cost())
            th_min, c_min = minimum_of_sinusoidal(c0, *probes)
            if c_min < best[2]:
                best = (name, th_min, c_min)
        qc.data[i] = create_1q_gate(best[0], best[1], instr.qubits[0])
    return qc, cost()


@pytest.mark.parametrize("rotoselect", [False, True])
def test_sweep_matches_bruteforce(rotoselect):
    rng = np.random.default_rng(3)
    n = 3
    qc = random_circuit(n, 18, rng)
    tape = compile_tape(qc)
    sel = tape.trainable.copy()

    engine = sv_core.sweep_engine()
    bl = sweeps.default_block_len(tape.padded_length)
    nk, na, cost, _, evals, _ = sweeps.sweep(
        engine, bl, rotoselect, sv_core.zero_state(n), sv_core.zero_state(n),
        jnp.asarray(tape.kinds), jnp.asarray(tape.q0), jnp.asarray(tape.q1),
        jnp.asarray(tape.angles), jnp.asarray(sel))

    sel_indices = [i for i, (off, cnt) in enumerate(tape.data_index_map)
                   if cnt == 1 and tape.trainable[off]]
    qc_ref, cost_ref = brute_force_rotosolve(qc, sel_indices, rotoselect)

    assert abs(float(cost) - cost_ref) < 1e-8
    # The device-reported cost must equal the cost of actually simulating the
    # circuit with the written-back angles (self-consistency).
    qc_dev = qc.copy()
    for i, (off, cnt) in enumerate(tape.data_index_map):
        if cnt == 1 and tape.trainable[off]:
            qc_dev.data[i] = create_1q_gate(G.KIND_NAMES[int(nk[off])],
                                            float(na[off]),
                                            qc.data[i].qubits[0])
    s_dev = simulate(qc_dev)
    assert abs((1.0 - abs(s_dev[0]) ** 2) - float(cost)) < 1e-10
    assert int(evals) == len(sel_indices) * (7 if rotoselect else 3)


def test_sweep_recovers_tiny_overlap_f32():
    """Tiny-overlap regime (the 50q random-MPS workload in miniature): the
    prefix state's overlap with |0...0> is ~1e-6, so the reference's cost
    1 - |z|^2 rounds to exactly 1.0 in f32 and carries no signal. The sweep
    probes work in the |z|^2 domain and must still recover the state."""
    n = 12
    theta = 2 * np.arccos(10 ** (-0.5))  # cos(theta/2)^n = 1e-6
    qc = Circuit(n)
    for q in range(n):
        qc.ry(theta, q)
    ttape = compile_tape(qc)
    prefix = sv_core.apply_tape(
        sv_core.zero_state(n, jnp.float32),
        jnp.asarray(ttape.kinds), jnp.asarray(ttape.q0),
        jnp.asarray(ttape.q1), jnp.asarray(ttape.angles, jnp.float32))
    ov0 = float(sv_core.overlap(sv_core.zero_state(n, jnp.float32),
                                prefix).abs2())
    assert ov0 < 1e-10                                  # overlap^2 ~ 1e-12
    assert np.float32(1.0) - np.float32(ov0) == 1.0     # f32 cost is pinned

    ansatz = Circuit(n)
    for q in range(n):
        ansatz.ry(0.0, q)
    atape = compile_tape(ansatz)
    engine = sv_core.sweep_engine()
    bl = sweeps.default_block_len(atape.padded_length)
    _, _, cost, _, _, ov2 = sweeps.sweep(
        engine, bl, False, prefix, sv_core.zero_state(n, jnp.float32),
        jnp.asarray(atape.kinds), jnp.asarray(atape.q0),
        jnp.asarray(atape.q1), jnp.asarray(atape.angles, jnp.float32),
        jnp.asarray(atape.trainable))
    assert float(ov2) > 0.99
    assert float(cost) < 0.01
