import numpy as np
import jax.numpy as jnp
import pytest

from adaptaqc_tpu.circuits.circuit import Circuit
from adaptaqc_tpu.circuits.tape import compile_tape
from adaptaqc_tpu.backends import mps_core, sv_core
from adaptaqc_tpu.ops import cplx
from adaptaqc_tpu.optim import sweeps

from reference_sim import simulate
from test_sv_core import random_circuit

THR = 1e-12


def run_mps(qc, chi):
    tape = compile_tape(qc)
    st = mps_core.zero_mps(qc.num_qubits, chi)
    return mps_core.apply_tape(st, tape.kinds, tape.q0, tape.q1, tape.angles, THR)


def test_mps_matches_dense_random():
    rng = np.random.default_rng(0)
    for n, chi in ((2, 2), (3, 4), (5, 8)):
        qc = random_circuit(n, 24, rng)
        st = run_mps(qc, chi)
        dense = mps_core.to_dense(st)
        expected = simulate(qc)
        # global phase must match too (MPS evolution tracks exact state)
        np.testing.assert_allclose(dense, expected, atol=1e-5)


def test_mps_nonadjacent_gates():
    rng = np.random.default_rng(1)
    qc = Circuit(5)
    qc.h(0)
    qc.cx(0, 4)      # long-range, swap-routed
    qc.ry(0.7, 2)
    qc.cx(4, 1)      # reversed control/target (CXR path)
    qc.cz(3, 0)
    st = run_mps(qc, 8)
    np.testing.assert_allclose(mps_core.to_dense(st), simulate(qc), atol=1e-5)


def test_mps_overlaps_and_amplitudes():
    rng = np.random.default_rng(2)
    qc = random_circuit(4, 20, rng)
    st = run_mps(qc, 8)
    sv = simulate(qc)
    # <0|psi>
    ov = cplx.to_np(mps_core.overlap_with_zero(st))
    assert abs(ov - sv[0]) < 1e-5
    # amplitude of arbitrary basis state 0b1011 (bits little-endian)
    bits = jnp.asarray([1, 1, 0, 1], jnp.int32)
    amp = cplx.to_np(mps_core.amplitude(st, bits))
    assert abs(amp - sv[0b1011]) < 1e-5
    # hamming-1 overlaps
    h1 = np.asarray(mps_core.hamming1_overlaps(st))
    for i in range(4):
        assert abs(h1[i] - abs(sv[2 ** i]) ** 2) < 1e-5
    # z expectations match SV engine
    evs = np.asarray(mps_core.z_expectations(st))
    tape = compile_tape(qc)
    svst = sv_core.apply_tape(sv_core.zero_state(4), tape.kinds, tape.q0,
                              tape.q1, tape.angles)
    np.testing.assert_allclose(evs, np.asarray(sv_core.z_expectations(svst, 4)),
                               atol=1e-5)


def test_mps_dot_cross_circuits():
    rng = np.random.default_rng(3)
    qa = random_circuit(4, 15, rng)
    qb = random_circuit(4, 15, rng)
    sta, stb = run_mps(qa, 8), run_mps(qb, 8)
    dot = cplx.to_np(mps_core.mps_dot(sta, stb))
    expected = np.vdot(simulate(qa), simulate(qb))
    assert abs(dot - expected) < 1e-5


def test_mps_truncation_ghz_degenerate():
    # GHZ has exactly degenerate Schmidt values everywhere — the hard case
    # for the real-embedding SVD.
    n = 6
    qc = Circuit(n)
    qc.h(0)
    for q in range(n - 1):
        qc.cx(q, q + 1)
    st = run_mps(qc, 4)
    dense = mps_core.to_dense(st)
    expected = simulate(qc)
    np.testing.assert_allclose(np.abs(np.vdot(dense, expected)), 1.0, atol=1e-5)


def test_all_pair_rdms_match_sv():
    rng = np.random.default_rng(4)
    n = 4
    qc = random_circuit(n, 18, rng)
    st = run_mps(qc, 8)
    rhos = mps_core.all_pair_rdms(st)
    tape = compile_tape(qc)
    svst = sv_core.apply_tape(sv_core.zero_state(n), tape.kinds, tape.q0,
                              tape.q1, tape.angles)
    for i in range(n):
        for j in range(i + 1, n):
            rho_mps = cplx.to_np(rhos[i, j])
            rho_sv = cplx.to_np(sv_core.rdm2(svst, i, j))
            np.testing.assert_allclose(rho_mps, rho_sv, atol=1e-5)


@pytest.mark.parametrize("rotoselect", [False, True])
def test_env_cached_sweep_matches_full_chain(rotoselect):
    """The incremental-environment probe path must reproduce the full-chain
    sweep bit-for-bit semantics across block boundaries, swap-routed 2q
    gates and NOP padding."""
    rng = np.random.default_rng(41)
    n, chi = 5, 8
    target = random_circuit(n, 10, rng)
    prefix = run_mps(target, chi)
    ref = mps_core.zero_mps(n, chi)
    ansatz = Circuit(n)
    for _ in range(8):
        a, b = map(int, rng.choice(n, size=2, replace=False))
        ansatz.ry(float(rng.uniform(-3, 3)), a)
        ansatz.cx(a, b)  # arbitrary order/distance
        ansatz.rz(float(rng.uniform(-3, 3)), b)
    tape = compile_tape(ansatz)
    args = (jnp.asarray(tape.kinds), jnp.asarray(tape.q0),
            jnp.asarray(tape.q1), jnp.asarray(tape.angles),
            jnp.asarray(tape.trainable))
    eng_env = mps_core.sweep_engine(THR, allow_env_cache=True)
    eng_plain = mps_core.sweep_engine(THR, allow_env_cache=False)
    assert eng_env.env_ops is not None and eng_plain.env_ops is None
    for bl in (tape.padded_length, 8):  # single- and multi-block
        out_env = sweeps.sweep(eng_env, bl, rotoselect, prefix, ref, *args)
        out_plain = sweeps.sweep(eng_plain, bl, rotoselect, prefix, ref,
                                 *args)
        np.testing.assert_allclose(np.asarray(out_env[0]),
                                   np.asarray(out_plain[0]))  # kinds
        np.testing.assert_allclose(np.asarray(out_env[1]),
                                   np.asarray(out_plain[1]), atol=1e-9)
        np.testing.assert_allclose(float(out_env[5]), float(out_plain[5]),
                                   atol=1e-9)


def test_pair_op_overlaps_matches_batched_chains():
    """The env-cached pair scorer must agree with the sequential full-chain
    contraction for ascending, descending, adjacent and distant pairs."""
    rng = np.random.default_rng(31)
    n = 6
    bra = run_mps(random_circuit(n, 14, rng), 8)
    ket = run_mps(random_circuit(n, 14, rng), 8)
    k_n, m_n = 3, 4
    ops_a = cplx.from_np(rng.normal(size=(k_n, m_n, 2, 2))
                         + 1j * rng.normal(size=(k_n, m_n, 2, 2)))
    ops_b = cplx.from_np(rng.normal(size=(k_n, m_n, 2, 2))
                         + 1j * rng.normal(size=(k_n, m_n, 2, 2)))
    pairs = np.array([[0, 1], [2, 3], [4, 5], [1, 4], [5, 2], [0, 5]],
                     dtype=np.int32)
    old = cplx.to_np(mps_core.batched_op_overlaps(
        bra, ket, ops_a, ops_b, jnp.asarray(pairs)))
    new = cplx.to_np(mps_core.pair_op_overlaps(
        bra, ket, ops_a, ops_b, jnp.asarray(pairs),
        int(np.max(np.abs(pairs[:, 1] - pairs[:, 0])))))
    np.testing.assert_allclose(new, old, atol=1e-5)


def test_local_overlap_matrix_mps():
    rng = np.random.default_rng(5)
    n = 4
    qa = random_circuit(n, 12, rng)
    qb = random_circuit(n, 12, rng)
    R, L = run_mps(qa, 8), run_mps(qb, 8)
    svR, svL = simulate(qa), simulate(qb)
    for q in range(n):
        C_mps = cplx.to_np(mps_core.local_overlap_matrix(R, L, q))
        C_sv = cplx.to_np(sv_core.local_overlap_matrix(
            sv_core.state_from_vector(svR), sv_core.state_from_vector(svL), q))
        np.testing.assert_allclose(C_mps, C_sv, atol=1e-5)


@pytest.mark.parametrize("rotoselect", [False, True])
def test_mps_sweep_matches_sv_sweep(rotoselect):
    rng = np.random.default_rng(6)
    n = 4
    qc = random_circuit(n, 16, rng)
    tape = compile_tape(qc)
    sel = tape.trainable.copy()
    args = (jnp.asarray(tape.kinds), jnp.asarray(tape.q0),
            jnp.asarray(tape.q1), jnp.asarray(tape.angles), jnp.asarray(sel))
    bl = sweeps.default_block_len(tape.padded_length)

    nk_sv, na_sv, cost_sv, _, _, _ = sweeps.sweep(
        sv_core.sweep_engine(), bl, rotoselect,
        sv_core.zero_state(n), sv_core.zero_state(n), *args)
    nk_m, na_m, cost_m, _, _, _ = sweeps.sweep(
        mps_core.sweep_engine(THR), bl, rotoselect,
        mps_core.zero_mps(n, 8), mps_core.zero_mps(n, 8), *args)

    assert abs(float(cost_sv) - float(cost_m)) < 1e-4
    np.testing.assert_array_equal(np.asarray(nk_sv), np.asarray(nk_m))
    # Angles may differ on flat sinusoids (degenerate minima) — compare the
    # physical outcome: re-simulate the MPS-swept circuit densely and check
    # it reproduces the SV-swept cost.
    from adaptaqc_tpu.circuits.circuit import create_1q_gate
    from adaptaqc_tpu.circuits import gates as G
    qc_m = qc.copy()
    for i, (off, cnt) in enumerate(tape.data_index_map):
        if cnt == 1 and tape.trainable[off]:
            qc_m.data[i] = create_1q_gate(G.KIND_NAMES[int(nk_m[off])],
                                          float(na_m[off]), qc.data[i].qubits[0])
    sv = simulate(qc_m)
    assert abs((1.0 - abs(sv[0]) ** 2) - float(cost_m)) < 1e-4


def test_qiskit_mps_roundtrip():
    rng = np.random.default_rng(7)
    qc = random_circuit(4, 18, rng)
    st = run_mps(qc, 8)
    qmps = mps_core.to_qiskit_mps(st)
    st2 = mps_core.from_qiskit_mps(qmps, 8)
    dot = cplx.to_np(mps_core.mps_dot(st, st2))
    assert abs(abs(dot) - 1.0) < 1e-6


class TestTruncationObservability:
    """MPS.trunc accumulates relative discarded Schmidt weight (VERDICT r1:
    the reference's Aer default is unbounded chi; a binding cap must not be
    silent — aer_mps_backend.py:27-42 / mps_log_data)."""

    def _deep_random_circuit(self, n, layers=4, seed=0):
        from adaptaqc_tpu.circuits.circuit import Circuit
        rng = np.random.default_rng(seed)
        qc = Circuit(n)
        for _ in range(layers):
            for q in range(n):
                qc.ry(float(rng.uniform(-3, 3)), q)
            for q in range(n - 1):
                qc.cx(q, q + 1)
        return qc

    def test_ghz_degenerate_spectrum_no_truncation(self):
        # GHZ needs exactly chi=2; its degenerate Schmidt values must be
        # kept, not mixed/truncated (CLAUDE.md degenerate-spectrum caveat)
        from adaptaqc_tpu.backends.backend import MPSBackend
        from adaptaqc_tpu.circuits.circuit import Circuit
        from adaptaqc_tpu.circuits.tape import compile_tape
        n = 4
        qc = Circuit(n)
        qc.h(0)
        for i in range(n - 1):
            qc.cx(i, i + 1)
        backend = MPSBackend(max_chi=2)
        state = backend.run_tape(mps_core.zero_mps(n, 2),
                                 compile_tape(qc, (0, len(qc.data))))
        assert backend.truncated_weight(state) < 1e-12
        assert float(mps_core.overlap_with_zero(state).abs2()) == \
            pytest.approx(0.5)

    def test_binding_chi_cap_reports_nonzero_weight(self):
        from adaptaqc_tpu.backends.backend import MPSBackend
        from adaptaqc_tpu.circuits.tape import compile_tape
        n = 4
        qc = self._deep_random_circuit(n)
        tape = compile_tape(qc, (0, len(qc.data)))
        capped = MPSBackend(max_chi=2)
        state = capped.run_tape(mps_core.zero_mps(n, 2), tape)
        assert capped.truncated_weight(state) > 1e-3
        ample = MPSBackend(max_chi=8)
        state8 = ample.run_tape(mps_core.zero_mps(n, 8), tape)
        assert ample.truncated_weight(state8) < 1e-12

    def test_compile_result_carries_truncated_weight(self):
        from adaptaqc_tpu.backends.backend import MPSBackend
        from adaptaqc_tpu.compilers.adapt_compiler import AdaptCompiler
        np.random.seed(5)
        target = self._deep_random_circuit(3, layers=1, seed=2)
        result = AdaptCompiler(target, backend=MPSBackend()).compile()
        assert result.mps_truncated_weight is not None
        assert result.mps_truncated_weight < 1e-8


def test_eigh_top_degenerate_clusters_full_rank():
    """The shortened candidate scan (2*keep+margin of the 2k real-embedding
    vectors) must still extract `keep` orthonormal complex eigenvectors on
    maximally degenerate spectra — the worst case for J-pair mixing
    (cplx.eigh_top; CLAUDE.md degenerate-spectrum caveat)."""
    import jax.numpy as jnp
    from adaptaqc_tpu.ops import cplx

    rng = np.random.default_rng(0)
    cases = []
    cases.append(("flat", np.eye(64, dtype=np.complex64), 32))
    A = rng.normal(size=(64, 64)) + 1j * rng.normal(size=(64, 64))
    Q, _ = np.linalg.qr(A)
    w = np.repeat(np.linspace(1, 0.1, 8), 8)
    cases.append(("clusters", (Q * w) @ Q.conj().T, 32))
    cases.append(("full", np.eye(16, dtype=np.complex64), 16))
    for name, H, keep in cases:
        hc = cplx.C(jnp.asarray(H.real, jnp.float32),
                    jnp.asarray(H.imag, jnp.float32))
        _, V = cplx.eigh_top(hc, keep)
        Vn = np.asarray(V.re) + 1j * np.asarray(V.im)
        gram = Vn @ Vn.conj().T
        assert (np.linalg.norm(Vn, axis=1) > 0.5).all(), name
        assert np.abs(gram - np.eye(keep)).max() < 1e-2, name


def test_regauge_grow_exact_and_shrink_truncates():
    """regauge: growing is exact zero-padding; shrinking keeps the top
    Schmidt values per bond (the chi-schedule hands engine-MPS targets to
    stages of different working chi through this). Degenerate-spectrum
    probes are mandatory for anything touching truncation (CLAUDE.md):
    GHZ has bond rank 2, so chi 4 -> 2 is EXACT; two cross Bell pairs have
    four EQUAL Schmidt values on the middle bond, so chi 4 -> 2 keeps
    exactly half the weight (overlap 0.5 after renormalisation)."""
    import jax.numpy as jnp

    def state_of(qc, chi):
        t = compile_tape(qc)
        return mps_core.apply_tape(
            mps_core.zero_mps(qc.num_qubits, chi), jnp.asarray(t.kinds),
            jnp.asarray(t.q0), jnp.asarray(t.q1), jnp.asarray(t.angles),
            1e-16)

    def norm_overlap(a, b):
        na = float(mps_core.mps_dot(a, a).re)
        nb = float(mps_core.mps_dot(b, b).re)
        return float(mps_core.mps_dot(a, b).abs2() / (na * nb))

    # GHZ(4): bond rank 2 everywhere -> shrink 4->2 exact
    ghz = Circuit(4)
    ghz.h(0)
    for q in range(3):
        ghz.cx(q, q + 1)
    s4 = state_of(ghz, 4)
    s2 = mps_core.regauge(s4, 2)
    assert s2.chi == 2
    assert norm_overlap(s2, state_of(ghz, 2)) > 1 - 1e-5
    # grow is exact
    s8 = mps_core.regauge(s2, 8)
    assert s8.chi == 8
    assert norm_overlap(s8, mps_core.pad_chi(s4, 8)) > 1 - 1e-5
    # two cross Bell pairs: middle bond has 4 equal Schmidt values; keeping
    # 2 of 4 retains half the weight -> overlap 0.5 with the true state
    bell2 = Circuit(4)
    bell2.h(0)
    bell2.h(1)
    bell2.cx(0, 2)
    bell2.cx(1, 3)
    b4 = state_of(bell2, 4)
    b2 = mps_core.regauge(b4, 2)
    assert abs(norm_overlap(mps_core.pad_chi(b2, 4), b4) - 0.5) < 5e-2
    # unit norm after shrink (from_qiskit_mps renormalises)
    assert abs(float(mps_core.mps_dot(b2, b2).re) - 1.0) < 1e-4
