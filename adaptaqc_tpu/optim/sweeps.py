"""On-device Rotosolve / Rotoselect sweep, generic over simulation engine.

This is the performance core of the TPU build. The reference's hot loop
re-simulates the entire circuit 2-3 times per angle update
(/root/reference/adaptaqc/utils/cost_minimiser.py:344-368 ->
approximate_compiler.py:514-527), i.e. O(3*G^2) gate applications per sweep
over G gates. Here a sweep costs O(G) gate applications:

 - Left states L_k (gates < k applied to the cached prefix) advance
   incrementally during the forward sweep.
 - Right environments R_k = (U_{k+1}...U_G)^dagger |0..0> are produced by a
   block-checkpointed backward pass (sqrt-style: NB checkpoints + per-block
   regeneration), so memory is O((G/BL + BL) * state) instead of O(G * state).
 - For a rotation on qubit q, all probe costs follow from the 2x2 local
   overlap matrix C[i,j] = <R_k| (|i><j|_q) |L_{k-1}>: with
   z(theta) = cos(theta/2) * tr(C) - i sin(theta/2) * tr(P_axis C),
   cost(theta) = 1 - |z|^2. One local contraction replaces 3 (Rotosolve) or 7
   (Rotoselect) full re-simulations; the closed-form sinusoidal minimum
   (utilityfunctions.py:34-57) is evaluated on device.

Gate updates are sequential (exactly matching the reference's coordinate
descent: gate k's probes see gates < k already updated, gates > k at old
values), but each step is O(1) engine work instead of O(G).

The engine interface makes the same sweep work for the statevector and MPS
engines (and, in the multi-chip case, their sharded variants).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..circuits import gates as G
from ..ops import cplx
from .sinusoidal import minimum_of_sinusoidal_dev


class SweepEngine(NamedTuple):
    """Pure functions the sweep needs from a simulation engine."""
    name: str
    # (state, kind, q0, q1, angle) -> state
    apply: Callable[..., Any]
    # (state, kind, q0, q1, angle) -> state   -- applies the gate's adjoint
    apply_adjoint: Callable[..., Any]
    # (r_state, l_state, q) -> complex 2x2  C[i,j] = <R| |i><j|_q |L>
    local_overlap: Callable[..., Any]
    # (a, b) -> complex  <a|b>
    overlap: Callable[..., Any]


def _probe_and_update(engine, r_state, l_state, kind, q0, rotoselect: bool):
    """Closed-form best (kind, angle) for trainable gate k; returns
    (new_kind, new_angle, cost_min, n_evals).

    For U(theta) = cos(theta/2) I - i sin(theta/2) P_axis:
    z(theta) = cos(theta/2) tr(C) - i sin(theta/2) tr(P_axis C), and
    cost(theta) = 1 - |z|^2 is the reference's sinusoid — its 3-point probes
    are evaluated from the 2x2 local matrix C instead of re-simulating.
    """
    Cm = engine.local_overlap(r_state, l_state, q0)  # cplx.C 2x2
    t_i = Cm[0, 0] + Cm[1, 1]
    t_x = Cm[0, 1] + Cm[1, 0]
    t_y = (Cm[1, 0] - Cm[0, 1]).mul_i()
    t_z = Cm[0, 0] - Cm[1, 1]
    t_paulis = cplx.stack([t_x, t_y, t_z])

    cost0 = 1.0 - t_i.abs2()

    def axis_min(t_p):
        # theta = +-pi/2: z = (t_i -+ i t_p)/sqrt(2)
        half = 0.5
        ip = t_p.mul_i()
        cp = 1.0 - (t_i - ip).abs2() * half
        cm = 1.0 - (t_i + ip).abs2() * half
        return minimum_of_sinusoidal_dev(cost0, cp, cm)

    if rotoselect:
        thetas, costs = jax.vmap(axis_min)(t_paulis)
        best = jnp.argmin(costs)
        new_kind = (G.RX + best).astype(kind.dtype)
        new_angle = thetas[best]
        cost_min = costs[best]
        n_evals = jnp.int32(7)  # 1 identity + 2 per axis (cost_minimiser.py:318-342)
    else:
        axis = jnp.clip(kind - G.RX, 0, 2)
        theta, cost_min = axis_min(t_paulis[axis])
        new_kind = kind
        new_angle = theta
        n_evals = jnp.int32(3)
    return new_kind, new_angle, cost_min, n_evals


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def sweep(engine: SweepEngine, block_len: int, rotoselect: bool,
          prefix_state, ref_state, kinds, q0s, q1s, angles, select):
    """One Rotosolve/Rotoselect cycle over the tape. Returns
    (new_kinds, new_angles, final_cost, final_state, n_evals)."""
    Gp = kinds.shape[0]
    BL = min(block_len, Gp)
    assert Gp % BL == 0, f"padded tape length {Gp} not a multiple of {BL}"
    NB = Gp // BL

    def reshape_blocks(x):
        return x.reshape((NB, BL) + x.shape[1:])

    bk, bq0, bq1, bang = (reshape_blocks(x) for x in (kinds, q0s, q1s, angles))
    bsel = reshape_blocks(select)

    # ---- phase A: backward pass producing NB block checkpoints ------------
    # ckpts[b] = R state with adjoints of all gates in blocks > b applied,
    # i.e. R_upto[(b+1)*BL].
    def block_back(state, xs):
        ck = state

        def gate_back(s, x):
            k, a, b, th = x
            return engine.apply_adjoint(s, k, a, b, th), None

        rev = jax.tree.map(lambda v: jnp.flip(v, 0), xs)
        state, _ = lax.scan(gate_back, state, rev)
        return state, ck

    blocks_rev = jax.tree.map(lambda v: jnp.flip(v, 0), (bk, bq0, bq1, bang))
    _, cks = lax.scan(block_back, ref_state, blocks_rev)
    ckpts = jax.tree.map(lambda v: jnp.flip(v, 0), cks)  # ckpts[b]

    # ---- phase B: forward sweep -------------------------------------------
    def block_fwd(carry, xs):
        l_state, cost_last, evals = carry
        ck, xk, xq0, xq1, xang, xsel = xs

        # regenerate the BL right-states of this block from its checkpoint
        def gate_back(s, x):
            k, a, b, th = x
            return engine.apply_adjoint(s, k, a, b, th), s

        rev = jax.tree.map(lambda v: jnp.flip(v, 0), (xk, xq0, xq1, xang))
        _, r_rev = lax.scan(gate_back, ck, rev)
        r_buf = jax.tree.map(lambda v: jnp.flip(v, 0), r_rev)  # r_buf[i] = R for gate i

        def gate_fwd(c, x):
            l_state, cost_last, evals = c
            k, a, b, th, sel, r_state = x

            def probed():
                return _probe_and_update(engine, r_state, l_state, k, a,
                                         rotoselect)

            def skipped():
                return k, th, cost_last, jnp.int32(0)

            nk, na, cmin, ne = lax.cond(sel, probed, skipped)
            l_state = engine.apply(l_state, nk, a, b, na)
            return (l_state, cmin, evals + ne), (nk, na)

        (l_state, cost_last, evals), (nks, nas) = lax.scan(
            gate_fwd, (l_state, cost_last, evals),
            (xk, xq0, xq1, xang, xsel, r_buf))
        return (l_state, cost_last, evals), (nks, nas)

    init = (prefix_state, jnp.asarray(1.0, angles.dtype), jnp.int32(0))
    (l_state, cost_last, evals), (nks, nas) = lax.scan(
        block_fwd, init, (ckpts, bk, bq0, bq1, bang, bsel))

    new_kinds = nks.reshape(Gp)
    new_angles = nas.reshape(Gp)
    final_ov = engine.overlap(ref_state, l_state)
    final_cost = 1.0 - final_ov.abs2()
    return new_kinds, new_angles, final_cost, l_state, evals


def default_block_len(padded_len: int) -> int:
    """sqrt-ish block size; padded bucket lengths are powers of two times 3,
    so 8/16/32 divide them."""
    for bl in (32, 16, 8, 4, 2, 1):
        if padded_len % bl == 0 and bl * bl <= 4 * padded_len:
            return bl
    return 1


def _stopped_improving_dev(hist3, rel_tol):
    """Device version of has_stopped_improving for a 3-cost window
    (utilityfunctions.py:272-278): linear-fit slope over |mean|."""
    slope = (hist3[2] - hist3[0]) / 2.0
    mean = jnp.abs(hist3[0] + hist3[1] + hist3[2]) / 3.0
    return slope / jnp.maximum(mean, 1e-30) > -rel_tol


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def sweep_until_converged(engine: SweepEngine, block_len: int, rotoselect: bool,
                          max_cycles: int, prefix_state, ref_state, kinds,
                          q0s, q1s, angles, select, stop_val, tol):
    """Run Rotosolve/Rotoselect cycles to convergence entirely on device.

    Replicates CostMinimiser.minimize_cost's cycle loop
    (cost_minimiser.py:90-105): evaluate the current cost, then sweep while
    cost > stop_val, cycles < max_cycles, and the last-3-cost linear fit
    still improves by `tol`. One host<->device round trip per minimize_cost
    call instead of one per cycle.

    Returns (kinds, angles, final_cost, cycles, evals).
    """
    # initial cost of the unmodified tape (the reference's leading
    # cost_finder() call)
    def apply_all(state, k, a, b, th):
        def body(s, x):
            return engine.apply(s, *x), None
        s, _ = lax.scan(body, state, (k, a, b, th))
        return s

    init_state = apply_all(prefix_state, kinds, q0s, q1s, angles)
    init_ov = engine.overlap(ref_state, init_state)
    cost0 = 1.0 - init_ov.abs2()

    big = jnp.asarray(1e30, angles.dtype)

    def cond(carry):
        k, a, cost, hist, cycle, evals = carry
        not_done = (cost > stop_val) & (cycle < max_cycles)
        improving = jnp.where(cycle > 3,
                              ~_stopped_improving_dev(hist, tol), True)
        return not_done & improving

    def body(carry):
        k, a, cost, hist, cycle, evals = carry
        k, a, cost, _, ev = sweep(engine, block_len, rotoselect, prefix_state,
                                  ref_state, k, q0s, q1s, a, select)
        hist = jnp.stack([hist[1], hist[2], cost])
        return (k, a, cost, hist, cycle + 1, evals + ev)

    init = (kinds, angles, cost0, jnp.stack([big, big, big]),
            jnp.int32(0), jnp.int32(1))
    k, a, cost, hist, cycles, evals = lax.while_loop(cond, body, init)
    return k, a, cost, cycles, evals
