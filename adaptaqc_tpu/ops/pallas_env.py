"""Pallas TPU kernel: fused MPS transfer-environment chain for sweep probes.

The Rotosolve/Rotoselect probe needs C[i,j] = <R| |i><j|_q |L>, built from
prefix and suffix transfer environments of the two MPS (mps_core.
local_overlap_matrix). The pure-XLA version runs a lax.scan whose every step
dispatches ~8 small (chi x chi) kernels — per-step dispatch latency dominates
the whole sweep. This kernel keeps both environment chains AND all site
tensors resident in VMEM and walks the n sites in one fori_loop: one kernel
launch per probe, MXU-fed matmuls back to back.

Memory: the 4 input tensors are (n, 2, chi, chi) f32 — 4 * n * 2 * chi^2 * 4
bytes (6.6 MB at n=50, chi=64). `supported()` gates on a VMEM budget and the
caller falls back to the XLA path otherwise.

Complex arithmetic is split-complex like the rest of the engine:
  forward:  e' = sum_p tr_p^H  e tl_p
  backward: f' = sum_p conj(tr_p) f tl_p^T
  combine:  C[i,j] = sum_{a,b,x,y} conj(brq[i][a,x]) e_q[a,b] blq[j][b,y] f_q[x,y]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cplx import C

# input budget for keeping all site tensors VMEM-resident (bytes)
_VMEM_INPUT_BUDGET = 10 * 2 ** 20


def supported(n: int, chi: int, dtype) -> bool:
    if dtype != jnp.float32 or chi % 8 != 0 or chi < 8:
        return False
    return 4 * n * 2 * chi * chi * 4 <= _VMEM_INPUT_BUDGET


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _env_kernel(q_ref, brre, brim, blre, blim, out,
                er, ei, fr, fi, eqr, eqi, fqr, fqi):
    n, _, chi, _ = brre.shape
    q = q_ref[0, 0]

    zero = jnp.zeros((chi, chi), jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (chi, chi), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chi, chi), 1)
    boundary = jnp.where((row == 0) & (col == 0), 1.0, 0.0)
    er[:] = boundary
    ei[:] = zero
    fr[:] = boundary
    fi[:] = zero
    # default snapshots cover q == 0 (forward) and q == n-1 (backward)
    eqr[:] = boundary
    eqi[:] = zero
    fqr[:] = boundary
    fqi[:] = zero

    def body(i, _):
        @pl.when(i == q)
        def _snap_e():
            eqr[:] = er[:]
            eqi[:] = ei[:]

        j = n - 1 - i

        @pl.when(j == q)
        def _snap_f():
            fqr[:] = fr[:]
            fqi[:] = fi[:]

        # ---- forward chain: site i --------------------------------------
        e_r, e_i = er[:], ei[:]
        acc_r = zero
        acc_i = zero
        for p in range(2):
            ar = brre[i, p]
            ai = brim[i, p]
            br_ = blre[i, p]
            bi_ = blim[i, p]
            # M = e @ B
            mr = _mm(e_r, br_) - _mm(e_i, bi_)
            mi = _mm(e_r, bi_) + _mm(e_i, br_)
            # A^H @ M
            acc_r = acc_r + _mm(ar.T, mr) + _mm(ai.T, mi)
            acc_i = acc_i + _mm(ar.T, mi) - _mm(ai.T, mr)
        er[:] = acc_r
        ei[:] = acc_i

        # ---- backward chain: site j -------------------------------------
        f_r, f_i = fr[:], fi[:]
        acc_r = zero
        acc_i = zero
        for p in range(2):
            ar = brre[j, p]
            ai = brim[j, p]
            br_ = blre[j, p]
            bi_ = blim[j, p]
            # N = f @ B^T
            nr = _mm(f_r, br_.T) - _mm(f_i, bi_.T)
            ni = _mm(f_r, bi_.T) + _mm(f_i, br_.T)
            # conj(A) @ N
            acc_r = acc_r + _mm(ar, nr) + _mm(ai, ni)
            acc_i = acc_i + _mm(ar, ni) - _mm(ai, nr)
        fr[:] = acc_r
        fi[:] = acc_i
        return 0

    jax.lax.fori_loop(0, n, body, 0)

    # ---- combine at site q: C[i,j] --------------------------------------
    # G = e_q @ blq[j] (chi,chi);  H[j] = G @ f_q^T;  C[i,j] = tr(brq[i]^H H[j])
    out_block = jnp.zeros((8, 128), jnp.float32)
    orow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    ocol = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    for jj in range(2):
        br_ = blre[q, jj]
        bi_ = blim[q, jj]
        gr = _mm(eqr[:], br_) - _mm(eqi[:], bi_)
        gi = _mm(eqr[:], bi_) + _mm(eqi[:], br_)
        # H = G @ f_q^T (f legs: f[x, y], contraction over y with G[a, y])
        hr = _mm(gr, fqr[:].T) - _mm(gi, fqi[:].T)
        hi = _mm(gr, fqi[:].T) + _mm(gi, fqr[:].T)
        for ii in range(2):
            ar = brre[q, ii]
            ai = brim[q, ii]
            # tr(A^H H) = sum(conj(A) * H)
            c_re = jnp.sum(ar * hr) + jnp.sum(ai * hi)
            c_im = jnp.sum(ar * hi) - jnp.sum(ai * hr)
            out_block = jnp.where((orow == ii) & (ocol == jj), c_re,
                                  out_block)
            out_block = jnp.where((orow == ii + 2) & (ocol == jj), c_im,
                                  out_block)
    out[:] = out_block


@functools.partial(jax.jit, static_argnums=(4,))
def _env_chain_call(brre, brim, blre, blim, interpret, q):
    n, _, chi, _ = brre.shape
    out = pl.pallas_call(
        _env_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((chi, chi), jnp.float32)
                        for _ in range(8)],
        interpret=interpret,
    )(q.reshape(1, 1).astype(jnp.int32), brre, brim, blre, blim)
    return out


def env_chain(br: C, bl: C, q, interpret: bool = False) -> C:
    """Fused local-overlap environment chain: returns the 2x2 complex matrix
    C[i,j] = <R| |i><j|_q |L> given the B-form tensors of both states."""
    out = _env_chain_call(br.re, br.im, bl.re, bl.im, interpret,
                          jnp.asarray(q))
    return C(out[0:2, 0:2], out[2:4, 0:2])
