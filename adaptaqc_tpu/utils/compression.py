"""chi=1 variational compression: best product-state approximation.

Replaces the reference's TenPy variational compression for
starting_circuit="tenpy_product_state" (approximate_compiler.py:219-246):
alternating single-site optimisation, where the optimal local vector given
all others is the (conjugated, normalised) single-site environment of
<s|psi>. Runs as device scans; the sweep loop is host-driven.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..backends import mps_core
from ..circuits.circuit import Circuit
from ..ops import cplx
from ..ops.cplx import C

logger = logging.getLogger(__name__)


def _sequential_sweep(target: mps_core.MPS, s_amps: C):
    """One left-to-right Gauss-Seidel compression sweep of <s|psi>.

    Each site takes the (conjugated, normalised) single-site environment
    built from the ALREADY-UPDATED sites to its left and the previous
    iteration's sites to its right — the same sequential update TenPy's
    variational compression performs (simultaneous Jacobi updates oscillate
    and converge to poor fixed points on generic MPS).

    Returns (new_amps C (n, 2), |<s_new|psi>|).
    """
    bt = mps_core.b_tensors(target)  # (n, 2, chi, chi)
    chi = target.chi
    dt = target.lam.dtype

    # suffix environments with the OLD amplitudes:
    # suffixes[i] = (prod_{k>i} M_k) e0, with M_k = sum_p conj(s_k[p]) B_k[p]
    m_old = cplx.einsum("ip,ipab->iab", s_amps.conj(), bt)
    v0 = cplx.zeros((chi,), dt)
    v0 = C(v0.re.at[0].set(1.0), v0.im)

    def bwd(v, mi):
        return cplx.einsum("ab,b->a", mi, v), v

    _, suf_rev = jax.lax.scan(bwd, v0,
                              jax.tree.map(lambda x: jnp.flip(x, 0), m_old))
    suffixes = jax.tree.map(lambda x: jnp.flip(x, 0), suf_rev)

    def fwd(prefix, x):
        bt_i, suf_i = x
        env = cplx.einsum("a,pab,b->p", prefix, bt_i, suf_i)  # E_i[p]
        nrm = jnp.sqrt(jnp.sum(env.abs2()))
        inv = jnp.where(nrm > 1e-30, 1.0 / jnp.maximum(nrm, 1e-30), 0.0)
        # <s|psi> = sum_p conj(s_i[p]) E_i[p], so the optimal unit vector is
        # E/||E|| (NOT its conjugate — that maximises only when E is real)
        new_amp = C(env.re * inv, env.im * inv)
        m_new = cplx.einsum("p,pab->ab", new_amp.conj(), bt_i)
        return cplx.einsum("a,ab->b", prefix, m_new), new_amp

    prefix_end, new_amps = jax.lax.scan(fwd, v0, (bt, suffixes))
    return new_amps, prefix_end[0].abs()


def _site_rdm_eigvecs(target: mps_core.MPS) -> np.ndarray:
    """(n, 2) dominant eigenvector of every single-site RDM — the natural
    mean-field initial guess for the compression sweep."""
    bt = mps_core.b_tensors(target)
    lam2 = target.lam[:-1] ** 2
    rho = cplx.einsum("ia,ipab,iqab->ipq", lam2, bt, bt.conj())  # (n, 2, 2)
    rho_np = cplx.to_np(rho)
    amps = np.empty((target.n, 2), dtype=complex)
    for i in range(target.n):
        w, v = np.linalg.eigh(rho_np[i])
        amps[i] = v[:, -1]
    return amps


def best_product_state(target: mps_core.MPS, sweeps: int = 50,
                       min_sweeps: int = 5, tol: float = 1e-10,
                       restarts: int = 2, seed: int = 0) -> np.ndarray:
    """(n, 2) complex product-state amplitudes maximising |<s|psi>|.

    Variational compression is a local optimisation; the sweep is run from
    the mean-field (single-site RDM) initial guess, from |0...0>, and from
    `restarts` random product states, keeping the best."""
    n = target.n
    sweep_fn = jax.jit(_sequential_sweep)
    rng = np.random.default_rng(seed)

    zero_init = np.zeros((n, 2), dtype=complex)
    zero_init[:, 0] = 1.0
    inits = [_site_rdm_eigvecs(target), zero_init]
    for _ in range(restarts):
        r = rng.normal(size=(n, 2)) + 1j * rng.normal(size=(n, 2))
        inits.append(r / np.linalg.norm(r, axis=1, keepdims=True))

    best_amps, best_overlap = None, -1.0
    for init in inits:
        amps = init
        prev = 0.0
        for it in range(sweeps):
            new_amps, overlap_dev = sweep_fn(
                target, cplx.from_np(amps, target.lam.dtype))
            amps = cplx.to_np(new_amps)
            overlap = float(overlap_dev)
            if it + 1 >= min_sweeps and abs(overlap - prev) < tol:
                break
            prev = overlap
        if overlap > best_overlap:
            best_amps, best_overlap = amps, overlap
    logger.info(f"chi=1 compression overlap |<s|psi>| = {best_overlap:.6f}")
    return best_amps


def product_state_to_circuit(amps: np.ndarray, variant: int = 0) -> Circuit:
    """Per-qubit Rz(phi)Ry(theta)|0> preparation (the reference transpiles
    the TenPy chi=1 tensors to rx/ry/rz, utilityfunctions.py:329-353).

    `variant` selects the angle of the leading Rz of each triple. It acts on
    |0> so it is pure per-qubit global phase for ANY angle — the prepared
    state is physically identical across variants — but the 50q ADAPT
    trajectory is chaotically sensitive to the starting circuit's f32 bit
    patterns, so distinct variants explore independent trajectories of the
    same compilation problem. Variant 0 (default) pins the angle to 0 so the
    state is reproducible across phase-split conventions; variant k > 0
    draws the angles from rng(k) (the multi-start retry knob)."""
    n = amps.shape[0]
    qc = Circuit(n)
    lead = np.zeros(n)
    if variant:
        lead = np.random.default_rng(int(variant)).uniform(-np.pi, np.pi, n)
    for q in range(n):
        a, b = amps[q]
        # ZYZ decomposition of the unitary whose first column is (a, b):
        # state = Rz(phi) Ry(theta) Rz(lam) |0>; the reference's solutions
        # carry the full rz-ry-rz triple per qubit (the transpiled chi=1
        # unitary, utilityfunctions.py:329-353) so we emit it too.
        theta = 2 * np.arctan2(abs(b), abs(a))
        phi = float(np.angle(b) - np.angle(a))
        qc.rz(float(lead[q]), q)
        qc.ry(float(theta), q)
        qc.rz(phi, q)
    return qc


def best_product_state_circuit(compiler) -> Circuit:
    """starting_circuit='tenpy_product_state' entry point."""
    from ..backends.backend import MPSBackend
    if isinstance(compiler.backend, MPSBackend):
        qc = compiler.circuit_to_compile
        target = compiler.backend.initial_state(qc, qc.num_qubits)
        start = 1 if (qc.data and qc.data[0].name == "set_mps") else 0
        if len(qc.data) > start:
            from ..circuits.tape import compile_tape
            tape = compile_tape(qc, (start, len(qc.data)))
            target = compiler.backend.run_tape(target, tape)
    else:
        # build an MPS view of the target via a temporary MPS backend
        tmp = MPSBackend()
        target = tmp.mps_from_compiler_target(compiler.circuit_to_compile)
    amps = best_product_state(target)
    return product_state_to_circuit(amps,
                                    getattr(compiler, "start_variant", 0))
