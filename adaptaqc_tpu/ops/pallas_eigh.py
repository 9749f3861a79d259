"""Pallas TPU kernels: complex Householder tridiagonalization + eigenvector
back-transform (the sequential halves of cplx.eigh_top_tridiag).

The tridiagonalization is inherently sequential (each reflector depends on
the updated matrix), so a pure-XLA lax.scan pays per-step kernel-dispatch
latency ~127 times per 2q apply. These kernels keep the matrix VMEM-resident
and run the whole reflector loop inside one kernel launch, all on the VPU in
exact f32 (no MXU bf16 passes anywhere — reflector orthonormality needs
~1e-6, see CLAUDE.md "TPU f32 matmuls default to bf16").

Layout tricks (TPU has no cheap in-kernel vector transpose):
- column k of the Hermitian work matrix is read as conj(row k) — a dynamic
  SUBLANE slice, which Mosaic supports (dynamic lane indexing is not).
- row->column vector relayout is a masked broadcast-reduce:
  col_i = sum_j [i == j] row_j (one (n, n) VPU op).

Combined with the native real eigh on the half-size tridiagonal T this
replaces the 2n real-embedding eigh of cplx.eigh_top (the ~n^3.5 native
Eigh call: 1.6 ms at 256 vs 0.11 ms at 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cplx import C

_VMEM_BUDGET = 12 * 2 ** 20


def supported(n: int, dtype) -> bool:
    if dtype != jnp.float32 or n % 8 != 0 or n < 8:
        return False
    return 10 * n * n * 4 <= _VMEM_BUDGET


def _row_to_col(row, n):
    """(1, n) -> (n, 1) via masked broadcast-reduce (no transpose op)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.sum(jnp.where(r == c, row, 0.0), axis=1, keepdims=True)


def _col_to_row(col, n):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.sum(jnp.where(r == c, col, 0.0), axis=0, keepdims=True)


def _tridiag_kernel(hre, him, vrow_re, vrow_im, vcol_re, vcol_im, packed,
                    ar, ai):
    """packed rows: 0 = tau_re, 1 = tau_im, 2 = e (subdiag), 3 = d (diag)."""
    n = hre.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, n), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, n), 0)

    # inputs are pre-Hermitized by the caller (in-kernel transpose is a
    # Mosaic relayout risk); the update preserves Hermiticity, which the
    # column-as-conjugate-row read relies on
    ar[:] = hre[:]
    ai[:] = him[:]
    vrow_re[:] = jnp.zeros((n, n), jnp.float32)
    vrow_im[:] = jnp.zeros((n, n), jnp.float32)
    vcol_re[:] = jnp.zeros((n, n), jnp.float32)
    vcol_im[:] = jnp.zeros((n, n), jnp.float32)
    packed[:] = jnp.zeros((8, n), jnp.float32)

    def body(k, _):
        # column k of A as (1, n) rows: A[:, k] = conj(A[k, :])
        colr = ar[pl.ds(k, 1), :]
        coli = -ai[pl.ds(k, 1), :]
        m2 = lane > k + 1
        sel1 = (lane == k + 1).astype(jnp.float32)
        alpha_r = jnp.sum(sel1 * colr)
        alpha_i = jnp.sum(sel1 * coli)
        xnorm2 = jnp.sum(jnp.where(m2, colr * colr + coli * coli, 0.0))
        nrm = jnp.sqrt(alpha_r * alpha_r + alpha_i * alpha_i + xnorm2)
        active = nrm > 0
        inv = jnp.where(active, 1.0 / jnp.where(active, nrm, 1.0), 0.0)
        ahr = alpha_r * inv
        ahi = alpha_i * inv
        bh = jnp.where(ahr >= 0, -1.0, 1.0)
        beta = jnp.where(active, bh * nrm, 0.0)
        tau_r = jnp.where(active, 1.0 - ahr * bh, 0.0)
        tau_i = jnp.where(active, -ahi * bh, 0.0)
        dr = ahr - bh
        di = ahi
        dn = dr * dr + di * di
        sdn = jnp.where(active, dn, 1.0)
        vr = jnp.where(m2, (colr * dr + coli * di) * inv / sdn, 0.0) + sel1
        vi = jnp.where(m2, (coli * dr - colr * di) * inv / sdn, 0.0)

        vrc = _row_to_col(vr, n)
        vic = _row_to_col(vi, n)
        # u = A v (lane-reduce against the row layout of v)
        ur = jnp.sum(ar[:] * vr - ai[:] * vi, axis=1, keepdims=True)
        ui = jnp.sum(ar[:] * vi + ai[:] * vr, axis=1, keepdims=True)
        s_r = jnp.sum(vrc * ur + vic * ui)
        s_i = jnp.sum(vrc * ui - vic * ur)
        # w = tau (u - (conj(tau) s / 2) v)
        t2r = (tau_r * s_r + tau_i * s_i) * 0.5
        t2i = (tau_r * s_i - tau_i * s_r) * 0.5
        pr = ur - (t2r * vrc - t2i * vic)
        pi = ui - (t2r * vic + t2i * vrc)
        wr = tau_r * pr - tau_i * pi
        wi = tau_r * pi + tau_i * pr
        wrr = _col_to_row(wr, n)
        wir = _col_to_row(wi, n)
        # A <- A - v w^H - w v^H
        ar[:] = ar[:] - (vrc * wrr + vic * wir + wr * vr + wi * vi)
        ai[:] = ai[:] - (vic * wrr - vrc * wir + wi * vr - wr * vi)

        vrow_re[pl.ds(k, 1), :] = vr
        vrow_im[pl.ds(k, 1), :] = vi
        vcol_re[:] = jnp.where(colm == k, vrc, vcol_re[:])
        vcol_im[:] = jnp.where(colm == k, vic, vcol_im[:])
        upd = jnp.where(row8 == 0, tau_r,
                        jnp.where(row8 == 1, tau_i, beta))
        packed[:] = jnp.where((lane8 == k) & (row8 < 3), upd, packed[:])
        return 0

    jax.lax.fori_loop(0, n - 1, body, 0)
    d = jnp.sum(jnp.where(rowm == colm, ar[:], 0.0), axis=0, keepdims=True)
    packed[:] = jnp.where(row8 == 3, d, packed[:])


def _backtransform_kernel(vcol_re, vcol_im, packed, z, out_re, out_im):
    """out = Q z = H_0 H_1 ... H_{n-2} z with H_k = I - tau_k v_k v_k^H."""
    n = vcol_re.shape[0]
    colm = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out_re[:] = z[:]
    out_im[:] = jnp.zeros_like(z[:])

    def body(i, _):
        k = n - 2 - i
        sel = (colm == k).astype(jnp.float32)
        vrc = jnp.sum(vcol_re[:] * sel, axis=1, keepdims=True)
        vic = jnp.sum(vcol_im[:] * sel, axis=1, keepdims=True)
        lsel = (lane == k).astype(jnp.float32)
        tau_r = jnp.sum(packed[0:1, :] * lsel)
        tau_i = jnp.sum(packed[1:2, :] * lsel)
        zr = out_re[:]
        zi = out_im[:]
        # y = v^H z (1, m) via sublane-reduce
        yr = jnp.sum(vrc * zr + vic * zi, axis=0, keepdims=True)
        yi = jnp.sum(vrc * zi - vic * zr, axis=0, keepdims=True)
        cvr = tau_r * vrc - tau_i * vic
        cvi = tau_r * vic + tau_i * vrc
        out_re[:] = zr - (cvr * yr - cvi * yi)
        out_im[:] = zi - (cvr * yi + cvi * yr)
        return 0

    jax.lax.fori_loop(0, n - 1, body, 0)


@functools.partial(jax.jit, static_argnums=(2,))
def _tridiag_call(hre, him, interpret):
    n = hre.shape[0]
    shp = jax.ShapeDtypeStruct((n, n), jnp.float32)
    return pl.pallas_call(
        _tridiag_kernel,
        out_shape=[shp, shp, shp, shp,
                   jax.ShapeDtypeStruct((8, n), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32) for _ in range(2)],
        interpret=interpret,
    )(hre, him)


@functools.partial(jax.jit, static_argnums=(4,))
def _backtransform_call(vcol_re, vcol_im, packed, z, interpret):
    n, m = z.shape
    shp = jax.ShapeDtypeStruct((n, m), jnp.float32)
    return pl.pallas_call(
        _backtransform_kernel,
        out_shape=[shp, shp],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )(vcol_re, vcol_im, packed, z)


def _teig_kernel(packed, b0, w_out, z, du, u1, u2, mrow, swp, bb, dbc, ebc):
    """Top-n eigenpairs of the REAL symmetric tridiagonal T carried in
    `packed` (row 3 = diagonal d, row 2 = subdiagonal e, e[n-1] unused):
    Sturm-count bisection for every eigenvalue (descending by lane) +
    two rounds of partial-pivoted inverse iteration (dlagtf-style single
    fill-in superdiagonal) + in-kernel CGS2. Validated against
    numpy.linalg.eigh on Gram-spectrum edge cases (decades-spanning values,
    exact degeneracies, decoupled zero bonds, flat spectra) in
    benchmarks/teig_proto.py before kernelization.

    Replaces the dense native eigh of T, which the apply-phase microprofile
    measured at 0.28 ms of the 0.61 ms 2q apply (chi=64, TPU v5e) — the
    single largest piece of the sweep wall.

    Outputs: w_out (8, n) row 0 = eigenvalues descending; z (n, n) columns =
    matching eigenvectors (all n computed; callers slice the top-keep).
    Scratch: du/u1/u2 = U bands, mrow = multipliers, swp = pivot flags,
    bb = rhs/solution, dbc/ebc = d and e broadcast to (n, n) rows for
    dynamic-sublane reads (dynamic lane indexing is unsupported)."""
    n = z.shape[0]
    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    d_row = packed[3:4, :]
    e_row = jnp.where(lane < n - 1, packed[2:3, :], 0.0)
    # broadcast d / e across lanes, indexed by sublane (dbc[i, :] == d[i])
    dbc[:] = jnp.sum(jnp.where(rowm == colm, d_row, 0.0), axis=1,
                     keepdims=True) + jnp.zeros((n, n), f32)
    ebc[:] = jnp.sum(jnp.where(rowm == colm, e_row, 0.0), axis=1,
                     keepdims=True) + jnp.zeros((n, n), f32)

    # Gershgorin interval; the Gram input is PSD so 0 is a valid floor, but
    # keep the general lower bound for safety against f32 noise.
    # e[j-1] at lane j needs a LANE shift: element [r, c] of ebc is e[r], so
    # masking r == c-1 and reducing over rows lands e[c-1] at lane c.
    e_left = jnp.sum(jnp.where(rowm == colm - 1, ebc[:], 0.0), axis=0,
                     keepdims=True)
    radius = jnp.abs(e_row) + jnp.abs(e_left)
    lo0 = jnp.min(d_row - radius)
    hi0 = jnp.max(d_row + radius)
    scale = jnp.maximum(jnp.maximum(jnp.abs(lo0), jnp.abs(hi0)), 1e-30)
    pivmin = jnp.maximum(1e-35, (1.2e-7 * scale) ** 2)

    # ---- Sturm bisection: lane j converges onto the j-th LARGEST eigenvalue
    los = jnp.zeros((1, n), f32) + lo0
    his = jnp.zeros((1, n), f32) + hi0
    target = (n - 1 - lane).astype(f32)

    def bisect_round(_, carry):
        los, his = carry
        mid = 0.5 * (los + his)
        q = dbc[0:1, :] - mid
        q = jnp.where(jnp.abs(q) < pivmin, -pivmin, q)
        cnt = (q < 0.0).astype(f32)

        def sturm_step(i, qc):
            q, cnt = qc
            di = dbc[pl.ds(i, 1), :]
            ei = ebc[pl.ds(i - 1, 1), :]
            q = di - mid - (ei * ei) / q
            q = jnp.where(jnp.abs(q) < pivmin, -pivmin, q)
            return q, cnt + (q < 0.0).astype(f32)

        _, cnt = jax.lax.fori_loop(1, n, sturm_step, (q, cnt))
        above = cnt > target
        return jnp.where(above, los, mid), jnp.where(above, mid, his)

    los, his = jax.lax.fori_loop(0, 30, bisect_round, (los, his))
    w = 0.5 * (los + his)
    w_out[:] = jnp.zeros((8, n), f32) + w  # row 0 (all rows equal)

    # ---- cluster separation for the inverse-iteration shifts -------------
    # lam[j] = min_{l<=j} (w[l] - (j-l)*eps): coincident shifts split by ulps
    eps = 1.2e-7 * scale
    wcol = jnp.sum(jnp.where(rowm == colm, w, 0.0), axis=1, keepdims=True)
    sepm = jnp.where(rowm <= colm,
                     wcol - (colm - rowm).astype(f32) * eps, hi0 + scale)
    lam = jnp.min(sepm, axis=0, keepdims=True)

    def guard(v):
        return jnp.where(jnp.abs(v) < pivmin,
                         jnp.where(v >= 0, pivmin, -pivmin), v)

    # ---- partial-pivoted LU of (T - lam I), vectorized over lanes ---------
    def lu_step(i, carry):
        a_i, s1_i = carry
        a_next = dbc[pl.ds(i + 1, 1), :] - lam
        s1_next = ebc[pl.ds(i + 1, 1), :]  # ebc row n-1 is zero-padded
        r2_0 = ebc[pl.ds(i, 1), :]
        swap = jnp.abs(r2_0) > jnp.abs(a_i)
        top0 = guard(jnp.where(swap, r2_0, a_i))
        top1 = jnp.where(swap, a_next, s1_i)
        top2 = jnp.where(swap, s1_next, 0.0)
        bot0 = jnp.where(swap, a_i, r2_0)
        bot1 = jnp.where(swap, s1_i, a_next)
        bot2 = jnp.where(swap, 0.0, s1_next)
        m = bot0 / top0
        du[pl.ds(i, 1), :] = top0
        u1[pl.ds(i, 1), :] = top1
        u2[pl.ds(i, 1), :] = top2
        mrow[pl.ds(i, 1), :] = m
        swp[pl.ds(i, 1), :] = swap.astype(f32)
        return bot1 - m * top1, bot2 - m * top2

    a_last, _ = jax.lax.fori_loop(
        0, n - 1, lu_step, (dbc[0:1, :] - lam, ebc[0:1, :]))
    du[pl.ds(n - 1, 1), :] = guard(a_last)

    def solve_inplace():
        """bb <- (T - lam I)^{-1} bb using the stored factors."""
        def fwd(i, _):
            m = mrow[pl.ds(i, 1), :]
            sw = swp[pl.ds(i, 1), :] > 0.5
            bi = bb[pl.ds(i, 1), :]
            bi1 = bb[pl.ds(i + 1, 1), :]
            bt = jnp.where(sw, bi1, bi)
            bo = jnp.where(sw, bi, bi1)
            bb[pl.ds(i, 1), :] = bt
            bb[pl.ds(i + 1, 1), :] = bo - m * bt
            return 0

        jax.lax.fori_loop(0, n - 1, fwd, 0)
        xn = bb[pl.ds(n - 1, 1), :] / du[pl.ds(n - 1, 1), :]
        bb[pl.ds(n - 1, 1), :] = xn
        xn1 = (bb[pl.ds(n - 2, 1), :] - u1[pl.ds(n - 2, 1), :] * xn) \
            / du[pl.ds(n - 2, 1), :]
        bb[pl.ds(n - 2, 1), :] = xn1

        def back(t, _):
            i = n - 3 - t
            xi = (bb[pl.ds(i, 1), :]
                  - u1[pl.ds(i, 1), :] * bb[pl.ds(i + 1, 1), :]
                  - u2[pl.ds(i, 1), :] * bb[pl.ds(i + 2, 1), :]) \
                / du[pl.ds(i, 1), :]
            bb[pl.ds(i, 1), :] = xi
            return 0

        jax.lax.fori_loop(0, n - 2, back, 0)
        # normalise columns (sum over sublanes)
        nrm2 = jnp.sum(bb[:] * bb[:], axis=0, keepdims=True)
        bb[:] = bb[:] * jax.lax.rsqrt(jnp.maximum(nrm2, 1e-30))

    bb[:] = b0[:]
    solve_inplace()
    solve_inplace()

    # ---- CGS2 across columns (descending order keeps clusters contiguous) -
    def cgs_step(j, _):
        selj = (colm == j).astype(f32)
        xj = jnp.sum(bb[:] * selj, axis=1, keepdims=True)
        prevm = (colm < j).astype(f32)

        def project(v):
            ov = jnp.sum(bb[:] * v, axis=0, keepdims=True) * prevm
            return v - jnp.sum(bb[:] * ov, axis=1, keepdims=True)

        v = project(project(xj))
        nrm2 = jnp.sum(v * v)
        v = v * jax.lax.rsqrt(jnp.maximum(nrm2, 1e-30))
        bb[:] = jnp.where(colm == j, v, bb[:])
        return 0

    jax.lax.fori_loop(1, n, cgs_step, 0)
    z[:] = bb[:]


@functools.partial(jax.jit, static_argnums=(2,))
def _teig_call(packed, b0, interpret):
    n = b0.shape[0]
    shp = jax.ShapeDtypeStruct((n, n), jnp.float32)
    return pl.pallas_call(
        _teig_kernel,
        out_shape=[jax.ShapeDtypeStruct((8, n), jnp.float32), shp],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32) for _ in range(8)],
        interpret=interpret,
    )(packed, b0)


@functools.lru_cache(maxsize=16)
def _teig_b0(n: int):
    """Fixed random inverse-iteration rhs. Cached as NUMPY: caching a jnp
    array created during a jit trace leaks that trace's tracer into later
    traces (UnexpectedTracerError, seen 2026-08-19 in apply_profile)."""
    rng = np.random.default_rng(181818)
    return rng.normal(size=(n, n)).astype(np.float32)


def eigh_top_pallas_teig(h: C, keep: int, interpret: bool = False):
    """eigh_top via Pallas tridiagonalization + the in-kernel tridiagonal
    eigensolver (no dense native eigh anywhere). Same contract as
    cplx.eigh_top: (w descending (keep,), V rows C (keep, n))."""
    n = h.shape[-1]
    hre = (h.re + h.re.T) * 0.5
    him = (h.im - h.im.T) * 0.5
    _, _, vcr, vci, packed = _tridiag_call(hre, him, interpret)
    wp, z = _teig_call(packed, _teig_b0(n), interpret)
    w = wp[0, :keep]
    zk = z[:, :keep]
    vr, vi = _backtransform_call(vcr, vci, packed, zk, interpret)
    return w, C(vr.T, vi.T)


def eigh_top_pallas(h: C, keep: int, interpret: bool = False):
    """cplx.eigh_top via the Pallas tridiagonalization kernels + the native
    real eigh at size n. Same contract as cplx.eigh_top / eigh_top_tridiag:
    (w descending (keep,), V rows C (keep, n))."""
    n = h.shape[-1]
    hre = (h.re + h.re.T) * 0.5
    him = (h.im - h.im.T) * 0.5
    _, _, vcr, vci, packed = _tridiag_call(hre, him, interpret)
    d = packed[3]
    e = packed[2, : n - 1]
    t = jnp.diag(d) + jnp.diag(e, 1) + jnp.diag(e, -1)
    w, z = jnp.linalg.eigh(t)  # ascending
    w = w[::-1][:keep]
    zk = z[:, ::-1][:, :keep]
    vr, vi = _backtransform_call(vcr, vci, packed, zk, interpret)
    return w, C(vr.T, vi.T)
