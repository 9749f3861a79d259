"""Split-complex arithmetic layer: complex tensors as (re, im) real pairs.

The TPU backend in this environment does not implement complex dtypes at all
(every c64 op fails with UNIMPLEMENTED), and even where XLA supports c64 the
MXU operates on real tiles. All engine math therefore runs on a `C` pytree of
two real arrays. Complex matmul lowers to 4 real MXU matmuls; gates, overlaps
and SVDs are expressed in this representation throughout.

Complex SVD (needed for MPS bond truncation) is implemented via the
real-embedding eigendecomposition of theta^dagger theta: the embedding
R(H) = [[A, -B], [B, A]] of a Hermitian H = A + iB is real-symmetric with
every eigenvalue doubled; each real eigenvector [x; y] maps to a complex
eigenvector x + iy. A tiny diagonal epsilon-split keeps physically degenerate
Schmidt values (e.g. Bell/GHZ) from mixing across J-pairs. See svd().
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util


@tree_util.register_pytree_node_class
class C:
    """Complex tensor as a (re, im) pair of equal-shape real arrays."""

    __slots__ = ("re", "im")

    def __init__(self, re, im):
        self.re = re
        self.im = im

    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # ---------------------------------------------------------- properties
    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return self.re.dtype

    @property
    def ndim(self):
        return self.re.ndim

    # ---------------------------------------------------------- arithmetic
    def __add__(self, o):
        if isinstance(o, C):
            return C(self.re + o.re, self.im + o.im)
        return C(self.re + o, self.im)

    def __sub__(self, o):
        if isinstance(o, C):
            return C(self.re - o.re, self.im - o.im)
        return C(self.re - o, self.im)

    def __neg__(self):
        return C(-self.re, -self.im)

    def __mul__(self, o):
        if isinstance(o, C):
            return C(self.re * o.re - self.im * o.im,
                     self.re * o.im + self.im * o.re)
        if isinstance(o, complex):
            return self * scalar(o, self.dtype)
        return C(self.re * o, self.im * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, C):
            d = o.re * o.re + o.im * o.im
            return C((self.re * o.re + self.im * o.im) / d,
                     (self.im * o.re - self.re * o.im) / d)
        return C(self.re / o, self.im / o)

    def __matmul__(self, o):
        return matmul(self, o)

    def __getitem__(self, idx):
        return C(self.re[idx], self.im[idx])

    def conj(self):
        return C(self.re, -self.im)

    def mul_i(self):
        """Multiply by i."""
        return C(-self.im, self.re)

    @property
    def T(self):
        return C(self.re.T, self.im.T)

    @property
    def H(self):
        return C(self.re.T, -self.im.T)

    def abs2(self):
        return self.re * self.re + self.im * self.im

    def abs(self):
        return jnp.sqrt(self.abs2())

    def reshape(self, *shape):
        return C(self.re.reshape(*shape), self.im.reshape(*shape))

    def transpose(self, *axes):
        return C(self.re.transpose(*axes), self.im.transpose(*axes))

    def astype(self, dtype):
        return C(self.re.astype(dtype), self.im.astype(dtype))

    def sum(self, axis=None):
        return C(self.re.sum(axis), self.im.sum(axis))

    def __repr__(self):
        return f"C(shape={self.shape}, dtype={self.dtype})"


# ------------------------------------------------------------- constructors

def scalar(z, dtype=jnp.float32):
    return C(jnp.asarray(np.real(z), dtype), jnp.asarray(np.imag(z), dtype))


def from_np(arr, dtype=jnp.float32):
    arr = np.asarray(arr)
    return C(jnp.asarray(arr.real.copy(), dtype), jnp.asarray(arr.imag.copy(), dtype))


def to_np(c: C) -> np.ndarray:
    return np.asarray(c.re) + 1j * np.asarray(c.im)


def zeros(shape, dtype=jnp.float32):
    return C(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def eye(n, dtype=jnp.float32):
    return C(jnp.eye(n, dtype=dtype), jnp.zeros((n, n), dtype))


def stack(cs, axis=0):
    return C(jnp.stack([c.re for c in cs], axis),
             jnp.stack([c.im for c in cs], axis))


def concatenate(cs, axis=0):
    return C(jnp.concatenate([c.re for c in cs], axis),
             jnp.concatenate([c.im for c in cs], axis))


def where(cond, a: C, b: C):
    return C(jnp.where(cond, a.re, b.re), jnp.where(cond, a.im, b.im))


def expi(theta):
    """e^{i theta} elementwise."""
    return C(jnp.cos(theta), jnp.sin(theta))


# --------------------------------------------------------------- operations

def _mm(a, b):
    # TPU f32 matmuls default to bf16 passes (~1e-4 error) — quantum overlap
    # and SVD math needs true f32 accumulation.
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def matmul(a: C, b: C) -> C:
    """Complex matmul via 4 real matmuls (3 with Karatsuba would trade adds;
    4 plain matmuls pipeline better on the MXU)."""
    if isinstance(a, C) and isinstance(b, C):
        return C(_mm(a.re, b.re) - _mm(a.im, b.im),
                 _mm(a.re, b.im) + _mm(a.im, b.re))
    if isinstance(a, C):
        return C(_mm(a.re, b), _mm(a.im, b))
    return C(_mm(a, b.re), _mm(a, b.im))


def einsum(spec, *ops):
    """Complex einsum over C / real operands (2^k real einsums)."""
    res_re = None
    res_im = None
    # expand product of (re + i*im) terms
    terms = [(op.re, op.im) if isinstance(op, C) else (op, None) for op in ops]

    def rec(i, acc_ops, phase):
        nonlocal res_re, res_im
        if i == len(terms):
            val = jnp.einsum(spec, *acc_ops,
                             precision=jax.lax.Precision.HIGHEST)
            # phase: 0 -> +re, 1 -> +im, 2 -> -re, 3 -> -im
            if phase % 2 == 0:
                sgn = 1.0 if phase == 0 else -1.0
                res_re = val * sgn if res_re is None else res_re + val * sgn
            else:
                sgn = 1.0 if phase == 1 else -1.0
                res_im = val * sgn if res_im is None else res_im + val * sgn
            return
        re, im = terms[i]
        rec(i + 1, acc_ops + [re], phase)
        if im is not None:
            rec(i + 1, acc_ops + [im], (phase + 1) % 4)

    rec(0, [], 0)
    if res_im is None:
        res_im = jnp.zeros_like(res_re)
    return C(res_re, res_im)


def vdot(a: C, b: C) -> C:
    """<a|b> = sum conj(a) * b."""
    re = jnp.sum(a.re * b.re + a.im * b.im)
    im = jnp.sum(a.re * b.im - a.im * b.re)
    return C(re, im)


def kron(a: C, b: C) -> C:
    if not isinstance(a, C):
        a = C(a, jnp.zeros_like(a))
    if not isinstance(b, C):
        b = C(b, jnp.zeros_like(b))
    return C(jnp.kron(a.re, b.re) - jnp.kron(a.im, b.im),
             jnp.kron(a.re, b.im) + jnp.kron(a.im, b.re))


def norm(a: C):
    return jnp.sqrt(jnp.sum(a.abs2()))


# ---------------------------------------------------------------- linalg

def embed_hermitian(h: C):
    """R(H) = [[A, -B], [B, A]] for Hermitian H = A + iB (real-symmetric)."""
    a, b = h.re, h.im
    top = jnp.concatenate([a, -b], axis=1)
    bot = jnp.concatenate([b, a], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def eigh_top(h: C, keep: int):
    """Top-`keep` eigenpairs of a complex Hermitian matrix via real embedding.

    R(H) is real-symmetric with every eigenvalue of H doubled (the J-pair
    [x;y] ~ [-y;x] corresponds to the phase freedom of one complex
    eigenvector x+iy). Any real eigenvector of R(H) complexifies to an exact
    complex eigenvector, but for *degenerate* eigenvalues (e.g. the equal
    Schmidt values of a Bell pair) the solver may return a real basis whose
    complexifications are not complex-orthogonal. We therefore extract an
    orthonormal complex basis by greedy complex Gram-Schmidt over all 2k
    candidates in descending-eigenvalue order: candidates are processed
    cluster-by-cluster, so every accepted vector stays inside its eigenspace,
    and the 2k candidates always span the full complex space.

    Returns (w (keep,), V as C (keep, k) rows) with eigenvalues descending.
    """
    k = h.shape[-1]
    r = embed_hermitian(h)
    w2, v2 = jnp.linalg.eigh(r)  # ascending
    w2 = w2[::-1]
    v2 = v2[:, ::-1]
    # Scanning all 2k candidates is safe but wasteful: every complex
    # eigenvector contributes exactly 2 real candidates (its J-pair), and
    # greedy CGS over the first t descending-ordered candidates accepts at
    # least ceil(t/2) vectors (the complex span of t real candidates has
    # dimension >= t/2). The first 2*keep candidates therefore always yield
    # >= keep accepted vectors; a small margin absorbs f32 near-dependence
    # rejections inside degenerate clusters. Halves the sequential-scan
    # length at keep = k/2 (the bond-truncation case).
    n_cand = min(2 * keep + 8, 2 * k)
    w2 = w2[:n_cand]
    cand = C(v2[:k, :n_cand].T, v2[k:, :n_cand].T)  # (n_cand, k) rows

    dt = h.dtype

    def step(carry, x):
        basis_re, basis_im, eig_out, count = carry
        v, wj = x  # v: C row (k,)
        basis = C(basis_re, basis_im)

        def project_out(u):
            # subtract the projection onto accepted basis vectors
            # (unaccepted rows are zero)
            ov = C(_mm(basis.re, u.re) + _mm(basis.im, u.im),
                   _mm(basis.re, u.im) - _mm(basis.im, u.re))  # <basis_m|u>
            return u - C(_mm(ov.re, basis.re) - _mm(ov.im, basis.im),
                         _mm(ov.re, basis.im) + _mm(ov.im, basis.re))

        # classical Gram-Schmidt re-orthogonalised ("twice is enough",
        # Giraud et al.): a single CGS pass loses orthogonality in f32 for
        # near-degenerate clusters, and non-orthonormal Schmidt vectors make
        # repeated MPS bond updates drift off norm.
        v_res = project_out(project_out(v))
        nrm = jnp.sqrt(jnp.sum(v_res.abs2()))
        accept = (nrm > 1e-3) & (count < keep)
        inv = jnp.where(accept, 1.0 / jnp.maximum(nrm, 1e-30), 0.0)
        row = jnp.where(accept, count, keep - 1)  # dummy write when full
        onehot = (jnp.arange(keep) == row) & accept
        basis_re = jnp.where(onehot[:, None], v_res.re * inv, basis_re)
        basis_im = jnp.where(onehot[:, None], v_res.im * inv, basis_im)
        eig_out = jnp.where(onehot, wj, eig_out)
        return (basis_re, basis_im, eig_out, count + accept.astype(count.dtype)), None

    init = (jnp.zeros((keep, k), dt), jnp.zeros((keep, k), dt),
            jnp.zeros((keep,), dt), jnp.zeros((), jnp.int32))
    (basis_re, basis_im, eig_out, _), _ = jax.lax.scan(step, init, (cand, w2))
    return eig_out, C(basis_re, basis_im)


def svd_trunc(theta: C, chi_keep: int, threshold: float):
    """Truncated SVD of complex theta (m x n), top chi_keep singular values.

    Returns (U (m, chi_keep), s (chi_keep,), Vh (chi_keep, n)), singular
    values descending; values below `threshold` are zeroed (Aer's
    matrix_product_state_truncation_threshold semantics,
    /root/reference/adaptaqc/backends/aer_mps_backend.py:27-42).

    Computed from eigh(theta^H theta) in split-complex arithmetic:
    V rows = eigenvectors, s = sqrt(eigenvalues), U = theta V^H / s.
    """
    m, n = theta.shape
    h = theta.H @ theta  # (n, n) Hermitian PSD
    w, vrows = eigh_top(h, chi_keep)  # descending; vrows[i] = eigenvector v_i
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    keep = s > threshold
    s_k = jnp.where(keep, s, 0.0)
    inv_s = jnp.where(s > 1e-30, 1.0 / jnp.maximum(s, 1e-30), 0.0)
    # theta = U S V^H with V columns v_i: U = theta V / s, Vh rows = conj(v_i)
    u = theta @ vrows.T  # (m, chi_keep); columns theta v_i have norm s_i
    u = C(u.re * (inv_s * keep), u.im * (inv_s * keep))
    vh = vrows.conj()
    vh = C(vh.re * keep[:, None], vh.im * keep[:, None])
    return u, s_k, vh
