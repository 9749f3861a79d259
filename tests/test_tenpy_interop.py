"""TenPy interop layout logic, tested against a minimal object implementing
the TenPy MPS protocol (L / sites / canonical_form / get_B / get_SR /
get_theta) — the conversion code never needs the tenpy package for the
TenPy -> Qiskit direction."""

import numpy as np
import pytest

from adaptaqc_tpu.backends import mps_core
from adaptaqc_tpu.ops import cplx
from adaptaqc_tpu.utils import tenpy_interop as ti


class _Labelled:
    def __init__(self, arr, labels):
        self.arr = np.asarray(arr)
        self.labels = list(labels)

    def itranspose(self, labels):
        perm = [self.labels.index(l) for l in labels]
        return _Labelled(self.arr.transpose(perm), labels)

    def to_ndarray(self):
        return self.arr


class _Site:
    def __init__(self, flipped):
        self._sz = np.diag([-0.5, 0.5]) if flipped else np.diag([0.5, -0.5])

    def get_op(self, name):
        assert name == "Sz"
        return _Labelled(self._sz, ["a", "b"])


class FakeTenpyMPS:
    """TenPy-protocol view of (gammas (n,2,dl,dr), lambdas) numpy data."""

    def __init__(self, gammas, lambdas, flipped):
        self.L = len(gammas)
        self._g = gammas          # site i: (2, dl_i, dr_i), qiskit basis order
        self._lam = lambdas       # bond i (between sites i, i+1)
        self._flip = flipped
        self.sites = [_Site(f) for f in flipped]

    def canonical_form(self):
        pass

    def _phys(self, i, arr):
        return arr[::-1] if self._flip[i] else arr

    def get_B(self, i, form):
        g = self._g[i]
        if form == "B":
            lam_r = self._lam[i] if i < self.L - 1 else np.ones(1)
            g = g * lam_r[None, None, :]
        else:
            assert form == "G"
        return _Labelled(self._phys(i, g), ["p", "vL", "vR"])

    def get_SR(self, i):
        return self._lam[i]

    def get_theta(self, start, length):
        assert start == 0 and length == self.L
        acc = self._g[0] * (self._lam[0][None, None, :]
                            if self.L > 1 else 1.0)  # (2, 1, dr)
        acc = acc[:, 0, :]  # (p0, dr)
        for i in range(1, self.L):
            b = self._g[i]
            if i < self.L - 1:
                b = b * self._lam[i][None, None, :]
            acc = np.einsum("...c,pcd->...pd", acc, b)
        theta = acc[..., 0]  # axes (p0, ..., p_{n-1})
        for i in range(self.L):
            if self._flip[i]:
                theta = np.flip(theta, axis=i)
        return _Labelled(theta, [f"p{i}" for i in range(self.L)])


def _random_vidal(n, seed, shuffle_bond=None):
    """Vidal-form numpy (gammas, lambdas) of a random state, optionally with
    one bond's spectrum deliberately permuted out of order."""
    rng = np.random.default_rng(seed)
    vec = rng.normal(size=2 ** n) + 1j * rng.normal(size=2 ** n)
    vec /= np.linalg.norm(vec)
    chi = 2 ** ((n + 1) // 2)
    state = mps_core.from_dense(vec, chi)
    qgams, qlams = mps_core.to_qiskit_mps(state)
    dims = [1] + [v.size for v in qlams] + [1]
    gammas = [np.stack([qgams[i][0], qgams[i][1]]) for i in range(n)]
    lambdas = [np.asarray(v) for v in qlams]
    if shuffle_bond is not None and dims[shuffle_bond + 1] > 1:
        k = shuffle_bond
        perm = rng.permutation(dims[k + 1])
        lambdas[k] = lambdas[k][perm]
        gammas[k] = gammas[k][:, :, perm]
        gammas[k + 1] = gammas[k + 1][:, perm, :]
    return gammas, lambdas, vec


@pytest.mark.parametrize("flipped", [[False] * 4, [True] * 4,
                                     [True, False, True, False]])
def test_tenpy_to_qiskit_roundtrip(flipped):
    gammas, lambdas, vec = _random_vidal(4, seed=3)
    fake = FakeTenpyMPS(gammas, lambdas, flipped)
    qmps = ti.tenpy_to_qiskit_mps(fake)
    state = mps_core.from_qiskit_mps(qmps, 4)
    assert np.abs(mps_core.to_dense(state) - vec).max() < 1e-10


def test_unsorted_bond_spectrum_gets_sorted(flipped=None):
    gammas, lambdas, vec = _random_vidal(4, seed=9, shuffle_bond=1)
    fake = FakeTenpyMPS(gammas, lambdas, [False] * 4)
    qmps = ti.tenpy_to_qiskit_mps(fake)
    for spectrum in qmps[1]:
        assert np.all(np.diff(spectrum) <= 1e-14)  # descending
    state = mps_core.from_qiskit_mps(qmps, 4)
    assert np.abs(mps_core.to_dense(state) - vec).max() < 1e-10


def test_tenpy_mps_to_statevector():
    gammas, lambdas, vec = _random_vidal(5, seed=11)
    for flipped in ([False] * 5, [True, False, False, True, True]):
        fake = FakeTenpyMPS(gammas, lambdas, flipped)
        assert np.abs(ti.tenpy_mps_to_statevector(fake) - vec).max() < 1e-10


def test_chi1_mps_to_circuit():
    rng = np.random.default_rng(13)
    n = 3
    amps = rng.normal(size=(n, 2)) + 1j * rng.normal(size=(n, 2))
    amps /= np.linalg.norm(amps, axis=1, keepdims=True)
    gammas = [amps[i].reshape(2, 1, 1) for i in range(n)]
    lambdas = [np.ones(1) for _ in range(n - 1)]
    fake = FakeTenpyMPS(gammas, lambdas, [False] * n)
    qc = ti.tenpy_chi_1_mps_to_circuit(fake)

    from adaptaqc_tpu.backends import sv_core
    from adaptaqc_tpu.circuits.tape import compile_tape
    tape = compile_tape(qc)
    sv = cplx.to_np(sv_core.apply_tape(
        sv_core.zero_state(n),
        *(np.asarray(x) for x in (tape.kinds, tape.q0, tape.q1, tape.angles))))
    target = np.array([1.0])
    for i in range(n - 1, -1, -1):
        target = np.kron(target, amps[i])  # little-endian kron order
    # preparation circuits drop per-qubit global phases: compare overlap
    assert abs(np.vdot(target, sv)) == pytest.approx(1.0, abs=1e-9)


def test_chi1_rejects_entangled(
):
    gammas, lambdas, _ = _random_vidal(4, seed=3)
    fake = FakeTenpyMPS(gammas, lambdas, [False] * 4)
    with pytest.raises(Exception, match="bond dimension 1"):
        ti.tenpy_chi_1_mps_to_circuit(fake)


def test_qiskit_to_tenpy_requires_tenpy():
    gammas, lambdas, _ = _random_vidal(3, seed=5)
    tenpy_installed = True
    try:
        import tenpy  # noqa: F401
    except ModuleNotFoundError:
        tenpy_installed = False
    if tenpy_installed:  # pragma: no cover - tenpy not in this image
        mps = ti.qiskit_to_tenpy_mps((gammas, lambdas))
        assert mps.L == 3
    else:
        with pytest.raises(ImportError, match="tenpy"):
            ti.qiskit_to_tenpy_mps((gammas, lambdas))


def test_b_tensor_preprocessing_shapes():
    gammas, lambdas, vec = _random_vidal(4, seed=7)
    tensors = ti._qiskit_mps_to_b_tensors((gammas, lambdas))
    assert [t.shape[0] for t in tensors] == [2] * 4
    # contracting the B chain reproduces the state
    acc = tensors[0][:, 0, :]
    for b in tensors[1:]:
        acc = np.einsum("...c,pcd->...pd", acc, b)
    theta = acc[..., 0]
    sv = theta.transpose(range(4)[::-1]).ravel()
    assert np.abs(sv - vec).max() < 1e-10
