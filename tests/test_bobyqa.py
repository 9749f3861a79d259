"""Native BOBYQA (optim/bobyqa.py) and its minimiser wiring.

The reference's perform_final_minimisation and use_roto_algos=False paths
call pybobyqa.solve (cost_minimiser.py:160-193, adapt_compiler.py:405-409);
pybobyqa is not installed here, so those paths must run the native
trust-region BOBYQA — a real quadratic-model method, not a scipy shim.
"""

import numpy as np
import pytest

from adaptaqc_tpu import AdaptCompiler
from adaptaqc_tpu.optim import bobyqa
from adaptaqc_tpu.utils import constants as vconstants

from test_sv_core import random_circuit


def test_sphere_converges_to_machine_precision():
    def f(x):
        return float(np.sum((x - 0.3) ** 2))

    r = bobyqa.solve(f, np.zeros(5), bounds=([-np.pi] * 5, [np.pi] * 5))
    assert r.f < 1e-10
    np.testing.assert_allclose(r.x, 0.3, atol=1e-5)


def test_bound_constrained_optimum_on_boundary():
    def f(x):
        return float(np.sum(x))

    r = bobyqa.solve(f, np.zeros(3), bounds=([-1] * 3, [1] * 3))
    np.testing.assert_allclose(r.x, -1.0, atol=1e-6)


def test_coupled_quadratic_30d():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((30, 30))
    a = a @ a.T / 30 + np.eye(30)
    xstar = rng.uniform(-1, 1, 30)

    def f(x):
        return float((x - xstar) @ a @ (x - xstar))

    r = bobyqa.solve(f, np.zeros(30), bounds=([-np.pi] * 30, [np.pi] * 30))
    assert r.f < 0.1  # from f(0) ~ 30


def test_seek_global_minimum_escapes_local_well():
    def f(x):
        return float((x[0] ** 2 - 1) ** 2 + 0.3 * x[0] + x[1] ** 2)

    local = bobyqa.solve(f, np.array([0.9, 0.0]), bounds=([-2, -2], [2, 2]))
    assert abs(local.f - 0.294) < 0.01  # stays in the starting well
    glob = bobyqa.solve(f, np.array([0.9, 0.0]), bounds=([-2, -2], [2, 2]),
                        seek_global_minimum=True)
    assert glob.f < -0.30
    assert glob.nrestarts > 0


def test_stopval_halts_early():
    calls = {"n": 0}

    def f(x):
        calls["n"] += 1
        return float(np.sum((x - 0.3) ** 2))

    r = bobyqa.solve(f, np.zeros(4), bounds=([-np.pi] * 4, [np.pi] * 4),
                     stopval=1e-2)
    assert r.f <= 1e-2
    assert r.nf < 100


def test_periodic_cost_profile():
    """Circuit-like cost: sum of shifted sinusoids."""
    rng = np.random.default_rng(2)
    ph = rng.uniform(-3, 3, 6)

    def f(x):
        return float(np.sum(1 - np.cos(x - ph)))

    r = bobyqa.solve(f, np.zeros(6), bounds=([-np.pi] * 6, [np.pi] * 6),
                     maxfun=2500)
    assert r.f < 1e-4  # optimum ~2.4 away per coordinate; endgame is slow


def _small_compiler(seed=3, **kwargs):
    rng = np.random.default_rng(seed)
    qc = random_circuit(3, 8, rng)
    return AdaptCompiler(qc, **kwargs)


def test_final_minimisation_runs_native_bobyqa(monkeypatch):
    """perform_final_minimisation=True must call the real BOBYQA (the
    native solve, pybobyqa being absent) and not regress the cost
    (adapt_compiler.py:405-409)."""
    calls = {"n": 0}
    orig = bobyqa.solve

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(bobyqa, "solve", counting)
    comp = _small_compiler(perform_final_minimisation=True)
    result = comp.compile()
    assert calls["n"] >= 1
    assert result.overlap > 0.99


def test_pybobyqa_path_restores_angles_on_exception():
    """cost_minimiser.py:188-193: when the objective raises mid-run the
    original angles are restored and the pre-existing cost returned."""
    from adaptaqc_tpu.circuits import operations as co

    comp = _small_compiler(4)
    comp._add_entangling_layer(0)
    rng_range = comp.variational_circuit_range()
    before = np.asarray(co.find_angles_in_circuit(comp.full_circuit,
                                                  rng_range))
    cost_before = comp.minimizer.cost_finder()

    calls = {"n": 0}
    orig = comp.minimizer._find_cost_with_angles

    def exploding(angles, grad=None):
        calls["n"] += 1
        if calls["n"] > 5:
            raise RuntimeError("boom")
        return orig(angles)

    comp.minimizer._find_cost_with_angles = exploding
    cost = comp.minimizer.minimize_cost(
        algorithm_kind=vconstants.ALG_PYBOBYQA,
        alg_kwargs={"seek_global_minimum": False})
    after = np.asarray(co.find_angles_in_circuit(comp.full_circuit,
                                                 rng_range))
    np.testing.assert_allclose(after, before, atol=1e-12)
    assert abs(cost - cost_before) < 1e-9


def test_nlopt_string_identifier_maps_to_native_bobyqa():
    comp = _small_compiler(5)
    comp._add_entangling_layer(0)
    cost = comp.minimizer.minimize_cost(
        algorithm_kind=vconstants.ALG_NLOPT,
        algorithm_identifier="LN_BOBYQA", tol=1e-8)
    assert cost <= comp.minimizer.cost_finder() + 1e-9


def test_nlopt_unknown_identifier_raises():
    comp = _small_compiler(6)
    with pytest.raises(ModuleNotFoundError):
        comp.minimizer.minimize_cost(algorithm_kind=vconstants.ALG_NLOPT,
                                     algorithm_identifier=1234)
