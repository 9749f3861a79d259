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


def _environments(target: mps_core.MPS, s_amps: C):
    """Single-site environments E_i[p] of <s|psi> for all sites at once.

    s_amps: C (n, 2) product-state amplitudes of |s>.
    Returns C (n, 2): E_i[p] = (prefix_i) B_i[p] (suffix_i).
    """
    bt = mps_core.b_tensors(target)  # (n, 2, chi, chi)
    chi = target.chi
    dt = target.lam.dtype

    # contracted site vectors: M_i = sum_p conj(s_i[p]) B_i[p]  (chi, chi)
    m = cplx.einsum("ip,ipab->iab", s_amps.conj(), bt)

    v0 = cplx.zeros((chi,), dt)
    v0 = C(v0.re.at[0].set(1.0), v0.im)

    def fwd(v, mi):
        nv = cplx.einsum("a,ab->b", v, mi)
        return nv, v

    _, prefixes = jax.lax.scan(fwd, v0, m)

    def bwd(v, mi):
        nv = cplx.einsum("ab,b->a", mi, v)
        return nv, v

    _, suf_rev = jax.lax.scan(bwd, v0, jax.tree.map(lambda x: jnp.flip(x, 0), m))
    suffixes = jax.tree.map(lambda x: jnp.flip(x, 0), suf_rev)

    # E_i[p] = prefix_i . B_i[p] . suffix_i
    env = cplx.einsum("ia,ipab,ib->ip", prefixes, bt, suffixes)
    return env


def best_product_state(target: mps_core.MPS, sweeps: int = 50,
                       min_sweeps: int = 10, tol: float = 1e-10) -> np.ndarray:
    """(n, 2) complex product-state amplitudes maximising |<s|psi>|."""
    n = target.n
    amps = np.zeros((n, 2), dtype=complex)
    amps[:, 0] = 1.0
    env_fn = jax.jit(_environments)
    prev = 0.0
    for it in range(sweeps):
        env = env_fn(target, cplx.from_np(amps, target.lam.dtype))
        env_np = cplx.to_np(env)  # (n, 2); E_i computed with OLD s everywhere
        # Jacobi-style update: each site takes its conjugated environment.
        norms = np.linalg.norm(env_np, axis=1, keepdims=True)
        nz = norms[:, 0] > 1e-30
        amps[nz] = np.conj(env_np[nz]) / norms[nz]
        overlap = float(np.abs(cplx.to_np(
            mps_core.mps_dot(mps_core.product_mps(amps, target.chi), target))))
        if it + 1 >= min_sweeps and abs(overlap - prev) < tol:
            break
        prev = overlap
    logger.info(f"chi=1 compression overlap |<s|psi>| = {prev:.6f}")
    return amps


def product_state_to_circuit(amps: np.ndarray) -> Circuit:
    """Per-qubit Rz(phi)Ry(theta)|0> preparation (the reference transpiles
    the TenPy chi=1 tensors to rx/ry/rz, utilityfunctions.py:329-353)."""
    n = amps.shape[0]
    qc = Circuit(n)
    for q in range(n):
        a, b = amps[q]
        theta = 2 * np.arctan2(abs(b), abs(a))
        phi = float(np.angle(b) - np.angle(a))
        if abs(theta) > 1e-12:
            qc.ry(float(theta), q)
        if abs(phi) > 1e-12 and abs(theta) > 1e-12:
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
    return product_state_to_circuit(amps)
