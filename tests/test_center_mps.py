"""Center-gauge (ITensor-style) second engine + CenterMPSBackend.

The reference cross-checks its primary MPS simulator with an independent
ITensor engine (/root/reference/adaptaqc/backends/itensor_backend.py:17-62);
these tests pin our analogue the same way: against exact dense simulation,
against the primary Hastings B-form engine, and end-to-end through
AdaptCompiler.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from adaptaqc_tpu.circuits.circuit import Circuit
from adaptaqc_tpu.circuits.tape import compile_tape
from adaptaqc_tpu.backends import center_mps, mps_core
from adaptaqc_tpu.backends.backend import CenterMPSBackend, SVBackend
from adaptaqc_tpu.ops import cplx

from reference_sim import simulate
from test_sv_core import random_circuit

CUT = 1e-12


def run_cmps(qc, chi):
    tape = compile_tape(qc)
    st = center_mps.zero_cmps(qc.num_qubits, chi)
    return center_mps.apply_tape(st, tape.kinds, tape.q0, tape.q1,
                                 tape.angles, CUT)


def test_cmps_matches_dense_random():
    rng = np.random.default_rng(0)
    for n, chi in ((2, 2), (3, 4), (5, 8)):
        qc = random_circuit(n, 24, rng)
        st = run_cmps(qc, chi)
        np.testing.assert_allclose(center_mps.to_dense(st), simulate(qc),
                                   atol=1e-5)


def test_cmps_nonadjacent_and_reversed_gates():
    qc = Circuit(5)
    qc.h(0)
    qc.cx(0, 4)      # long-range, swap-routed
    qc.ry(0.7, 2)
    qc.cx(4, 1)      # reversed control/target (CXR path)
    qc.cz(3, 0)
    st = run_cmps(qc, 8)
    np.testing.assert_allclose(center_mps.to_dense(st), simulate(qc),
                               atol=1e-5)


def test_center_moves_are_pure_gauge():
    rng = np.random.default_rng(3)
    qc = random_circuit(4, 20, rng)
    st = run_cmps(qc, 8)
    dense = center_mps.to_dense(st)
    for k in (3, 0, 2, 1):
        st = center_mps.move_center_to(st, k)
        assert int(st.center) == k
        np.testing.assert_allclose(center_mps.to_dense(st), dense, atol=1e-5)


def test_degenerate_schmidt_spectra():
    # Bell/GHZ probes: exactly degenerate Schmidt values are the classic
    # truncation-bug trap (CLAUDE.md hard constraints)
    for n in (2, 4, 6):
        qc = Circuit(n)
        qc.h(0)
        for q in range(n - 1):
            qc.cx(q, q + 1)
        st = run_cmps(qc, max(2, 2 ** (n // 2)))
        dense = center_mps.to_dense(st)
        expected = np.zeros(2 ** n, complex)
        expected[0] = expected[-1] = 1 / np.sqrt(2)
        np.testing.assert_allclose(np.abs(dense), np.abs(expected), atol=1e-5)
        assert abs(center_mps.norm_sq(st) - 1.0) < 1e-5


def test_truncation_tracks_discarded_weight():
    rng = np.random.default_rng(4)
    qc = random_circuit(6, 60, rng)
    full = run_cmps(qc, 8)
    assert float(full.trunc) < 1e-6
    capped = run_cmps(qc, 2)   # chi=2 must truncate a 6q random circuit
    assert float(capped.trunc) > 1e-4
    # norm decays by exactly the discarded weight (no renormalisation):
    assert float(center_mps.norm_sq(capped)) < 1.0 + 1e-5


def test_observables_match_dense():
    rng = np.random.default_rng(5)
    qc = random_circuit(4, 20, rng)
    st = run_cmps(qc, 8)
    sv = simulate(qc)
    # overlap with zero / global cost
    assert abs(cplx.to_np(center_mps.overlap_with_zero(st)) - sv[0]) < 1e-5
    gc = float(center_mps.global_cost_normalized(st))
    assert abs(gc - (1 - abs(sv[0]) ** 2)) < 1e-5
    # z expectations
    z = np.asarray(center_mps.z_expectations(st))
    probs = np.abs(sv) ** 2
    for q in range(4):
        signs = np.array([1 if not (i >> q) & 1 else -1 for i in range(16)])
        assert abs(z[q] - np.sum(signs * probs)) < 1e-5


def test_all_pair_rdms_match_dense():
    rng = np.random.default_rng(6)
    qc = random_circuit(4, 20, rng)
    st = run_cmps(qc, 8)
    sv = simulate(qc)
    rhos = center_mps.all_pair_rdms(st)
    psi = sv.reshape([2] * 4)  # axes (q3, q2, q1, q0)
    for i in range(4):
        for j in range(i + 1, 4):
            # rho with qubit i as LSB: basis index 2*q_j + q_i
            m = np.moveaxis(psi, [3 - j, 3 - i], [0, 1]).reshape(4, -1)
            rho_exact = m @ m.conj().T
            got = cplx.to_np(rhos[i, j])
            np.testing.assert_allclose(got, rho_exact, atol=1e-5)


def test_from_bform_conversion_exact():
    rng = np.random.default_rng(7)
    qc = random_circuit(5, 30, rng)
    tape = compile_tape(qc)
    b = mps_core.apply_tape(mps_core.zero_mps(5, 8), tape.kinds, tape.q0,
                            tape.q1, tape.angles, 1e-12)
    c = center_mps.from_bform(b)
    np.testing.assert_allclose(center_mps.to_dense(c), mps_core.to_dense(b),
                               atol=1e-6)


def test_cross_engine_global_cost_agreement():
    # the raison d'etre of the second engine: an independent check of the
    # primary engine's cost numbers
    rng = np.random.default_rng(8)
    qc = random_circuit(6, 40, rng)
    tape = compile_tape(qc)
    b = mps_core.apply_tape(mps_core.zero_mps(6, 8), tape.kinds, tape.q0,
                            tape.q1, tape.angles, 1e-12)
    c = run_cmps(qc, 8)
    gb = float(mps_core.global_cost_normalized(b))
    gc = float(center_mps.global_cost_normalized(c))
    assert abs(gb - gc) < 1e-5


def test_backend_end_to_end_compile():
    from adaptaqc_tpu import AdaptCompiler, AdaptConfig
    rng = np.random.default_rng(9)
    qc = random_circuit(3, 10, rng)
    backend = CenterMPSBackend(chi=4)
    cfg = AdaptConfig(sufficient_cost=0.01, max_layers=30)
    result = AdaptCompiler(qc, backend=backend, adapt_config=cfg).compile()
    assert result.overlap > 0.99
    # cross-check the claimed overlap on the exact statevector engine
    sv_sol = simulate(result.circuit)
    sv_tgt = simulate(qc)
    assert abs(np.vdot(sv_sol, sv_tgt)) ** 2 > 0.98


def test_backend_parity_scope():
    # itensor_backend.py:35-38 — softened global cost raises
    from adaptaqc_tpu import AdaptCompiler
    rng = np.random.default_rng(10)
    qc = random_circuit(3, 6, rng)
    backend = CenterMPSBackend(chi=4)
    compiler = AdaptCompiler(qc, backend=backend, soften_global_cost=True)
    with pytest.raises(NotImplementedError):
        backend.evaluate_global_cost(compiler)
    # MPS targets are rejected (compiler requires the primary MPSBackend)
    mps_target = mps_core.zero_mps(3, 4)
    with pytest.raises(Exception):
        AdaptCompiler(mps_target, backend=backend)


def test_cross_engine_overlap_verifier():
    """utils.verification.cross_engine_overlap re-simulates target and
    solution in the center-gauge engine (the reference keeps ITensorBackend
    for exactly this cross-check, itensor_backend.py:17-62): identical
    circuits give 1, and the verdict agrees with the B-form engine's
    independent overlap on a random pair to f32 tolerance."""
    import jax.numpy as jnp
    from adaptaqc_tpu.backends import mps_core
    from adaptaqc_tpu.circuits.tape import compile_tape
    from adaptaqc_tpu.utils.verification import cross_engine_overlap

    rng = np.random.default_rng(7)
    qc = random_circuit(4, 8, rng)
    assert abs(cross_engine_overlap(qc, qc, chi=8) - 1.0) < 1e-4

    other = random_circuit(4, 6, np.random.default_rng(8))
    got = cross_engine_overlap(qc, other, chi=8)
    # B-form engine independent verdict on the same pair
    def bform(c):
        t = compile_tape(c)
        return mps_core.apply_tape(
            mps_core.zero_mps(4, 8), jnp.asarray(t.kinds),
            jnp.asarray(t.q0), jnp.asarray(t.q1), jnp.asarray(t.angles),
            1e-16)
    a, b = bform(qc), bform(other)
    want = float(mps_core.mps_dot(a, b).abs2()
                 / (float(mps_core.mps_dot(a, a).re)
                    * float(mps_core.mps_dot(b, b).re)))
    assert abs(got - want) < 1e-3

    # engine-MPS and qiskit-format targets run through the same verifier
    assert abs(cross_engine_overlap(a, qc, chi=8) - 1.0) < 1e-4
    assert abs(cross_engine_overlap(mps_core.to_qiskit_mps(a), qc, chi=8)
               - 1.0) < 1e-4


def _prepared_center_compiler(seed, n=4, depth=16, **kwargs):
    """Mirrors test_full_cost_sweep._prepared_compiler, incl. the ry-only
    dressed layer: rz probes are cost-flat sinusoids whose minimiser angle
    is an fp-noise tie between host and device."""
    from adaptaqc_tpu import AdaptCompiler
    from test_full_cost_sweep import _ry_dressed_layer
    rng = np.random.default_rng(seed)
    qc = random_circuit(n, depth, rng)
    comp = AdaptCompiler(qc, backend=CenterMPSBackend(chi=8),
                         custom_layer_2q_gate=_ry_dressed_layer(), **kwargs)
    layer_indexes = comp._add_entangling_layer(0)
    return comp, layer_indexes


@pytest.mark.parametrize("rotoselect", [False, True])
def test_center_sweep_device_matches_host(rotoselect):
    """The center-gauge SweepEngine (device O(G) probe sweep — the fast
    path the reference's ITensorBackend never had) reproduces the host
    probe loop's cost and angles on identical compilers."""
    from adaptaqc_tpu.circuits import operations as co
    from adaptaqc_tpu.utils import constants as vconstants

    def minimize(comp, idx, force_host):
        if force_host:
            comp.minimizer._can_fast_sweep = lambda *_a, **_k: False
            comp.minimizer._can_full_sweep = lambda *_a, **_k: False
        alg = (vconstants.ALG_ROTOSELECT if rotoselect
               else vconstants.ALG_ROTOSOLVE)
        cost = comp.minimizer.minimize_cost(
            algorithm_kind=alg, max_cycles=1, stop_val=-np.inf, tol=1e-10,
            indexes_to_modify=idx)
        angles = co.find_angles_in_circuit(comp.full_circuit,
                                           comp.variational_circuit_range())
        return cost, np.asarray(angles)

    ca, idx_a = _prepared_center_compiler(41)
    cb, idx_b = _prepared_center_compiler(41)
    assert idx_a == idx_b
    assert ca.minimizer._can_fast_sweep()
    cost_dev, ang_dev = minimize(ca, idx_a, force_host=False)
    cost_host, ang_host = minimize(cb, idx_b, force_host=True)
    assert abs(cost_dev - cost_host) < 1e-6
    if cost_host > 1e-10:
        np.testing.assert_allclose(ang_dev, ang_host, atol=1e-6)


def test_center_local_cost_sweep_matches_host():
    """The center engine's cost_terms drive the chunked full-cost sweep
    (local-cost mode) to the same result as the host probe loop."""
    from adaptaqc_tpu.circuits import operations as co
    from adaptaqc_tpu.utils import constants as vconstants

    def minimize(comp, idx, force_host):
        if force_host:
            comp.minimizer._can_full_sweep = lambda *_a, **_k: False
        cost = comp.minimizer.minimize_cost(
            algorithm_kind=vconstants.ALG_ROTOSOLVE, max_cycles=1,
            stop_val=-np.inf, tol=1e-10, indexes_to_modify=idx)
        angles = co.find_angles_in_circuit(comp.full_circuit,
                                           comp.variational_circuit_range())
        return cost, np.asarray(angles)

    ca, idx_a = _prepared_center_compiler(43, optimise_local_cost=True)
    cb, idx_b = _prepared_center_compiler(43, optimise_local_cost=True)
    assert ca.minimizer._can_full_sweep(False)
    cost_dev, ang_dev = minimize(ca, idx_a, force_host=False)
    cost_host, ang_host = minimize(cb, idx_b, force_host=True)
    assert abs(cost_dev - cost_host) < 1e-6
    if cost_host > 1e-10:
        np.testing.assert_allclose(ang_dev, ang_host, atol=1e-6)


def test_backend_compile_uses_device_sweep():
    """End-to-end CenterMPSBackend compile goes through the device sweep
    (no silent host fallback) and converges."""
    from adaptaqc_tpu import AdaptCompiler, AdaptConfig
    import adaptaqc_tpu.optim.sweeps as sweeps

    calls = {"n": 0}
    orig = sweeps.sweep_until_converged

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    rng = np.random.default_rng(44)
    qc = random_circuit(3, 10, rng)
    comp = AdaptCompiler(qc, backend=CenterMPSBackend(chi=8),
                         adapt_config=AdaptConfig(max_layers=30,
                                                  sufficient_cost=1e-2))
    import unittest.mock as mock
    with mock.patch.object(sweeps, "sweep_until_converged", counting):
        result = comp.compile()
    assert calls["n"] > 0
    assert result.overlap > 0.97
