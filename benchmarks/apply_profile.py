"""Phase-level microprofile of the MPS 2q apply at the bench operating point
(n=50, chi=64, f32): where do the 45.6 ms/sweep actually go?

The 2q apply is the sweep's wall (docs/tpu_design_notes.md "the eigh inside
the 2q apply is the wall"); this measures its pieces separately so kernel
work targets the right one:

  gram          theta^H theta (4 HIGHEST matmuls at 2chi)
  tridiag       Pallas Householder kernel (ops/pallas_eigh._tridiag_call)
  eigh_T        native real eigh of the tridiagonal T (2chi, dense call)
  backxform     Pallas reflector back-transform of the kept columns
  svd_trunc     the full truncated SVD (all of the above + reconstruction)
  apply_2q      the full adjacent 2q apply (theta build + svd + scatter)
  apply_1q      1q apply (no eigh)
  probe         local_overlap through the sweep's env-ops path is excluded
                here (measured already at ~2 TF/s in pallas_env)

Method per CLAUDE.md microbenchmark rules: fuse k repetitions into ONE
jitted lax.scan with varying inputs (defeats the axon relay's identical-
execution memoization), measure wall for k1 and k2 > k1, report the slope
(cancels the ~33-70 ms per-call relay sync).

Pauses in-flight queue jobs exactly like bench.py (SIGSTOP descendants of
/tmp/*seed_queue*.pid / /tmp/ladder*.pid) and CONTs them on exit — safe to
run while the runner chain is mid-job; NEVER run next to an unpaused TPU
client.
"""

import contextlib
import glob
import json
import os
import signal
import sys
import time

import numpy as np


def _descendants(pid):
    out = []
    stack = [pid]
    while stack:
        p = stack.pop()
        for child_file in glob.glob(f"/proc/{p}/task/*/children"):
            try:
                with open(child_file) as f:
                    kids = [int(c) for c in f.read().split()]
            except OSError:
                continue
            out.extend(kids)
            stack.extend(kids)
    return out


def _own_tree():
    """This process, its ancestors, and its descendants — never SIGSTOP
    any of these (2026-08-19: the profiler ran as a queue stage, matched
    its own runner's pidfile, and froze itself + its timeout watchdog,
    deadlocking the whole queue)."""
    own = {os.getpid()}
    pid = os.getpid()
    while pid > 1:
        try:
            with open(f"/proc/{pid}/status") as f:
                ppid = next(int(l.split()[1]) for l in f
                            if l.startswith("PPid:"))
        except (OSError, StopIteration):
            break
        own.add(ppid)
        pid = ppid
    own.update(_descendants(os.getpid()))
    return own


@contextlib.contextmanager
def paused_queue_jobs():
    paused = []
    skip = _own_tree()
    for pf in (glob.glob("/tmp/*seed_queue*.pid")
               + glob.glob("/tmp/ladder*.pid")):
        try:
            with open(pf) as f:
                root = int(f.read().strip())
        except (OSError, ValueError):
            continue
        for pid in _descendants(root):
            if pid in skip:
                continue
            try:
                os.kill(pid, signal.SIGSTOP)
                paused.append(pid)
            except ProcessLookupError:
                pass
    try:
        yield paused
    finally:
        for pid in paused:
            try:
                os.kill(pid, signal.SIGCONT)
            except ProcessLookupError:
                pass


def slope_ms(fn, make_args, k1=50, k2=450, reps=3):
    """Wall-clock slope per iteration between k1 and k2 fused repetitions.
    The axon relay adds ~33-70 ms of per-call sync jitter AND memoizes
    byte-identical executions (CLAUDE.md), so every call gets fresh salted
    inputs from make_args(i) and the trip-count difference must represent
    >>100 ms of device work; the slope is the median over `reps` pairs."""
    import jax

    jax.block_until_ready(fn(k1, *make_args(0)))  # compile both trip counts
    jax.block_until_ready(fn(k2, *make_args(1)))
    slopes = []
    for i in range(reps):
        a1 = make_args(2 + 2 * i)
        a2 = make_args(3 + 2 * i)
        jax.block_until_ready(a1)
        jax.block_until_ready(a2)
        t0 = time.perf_counter()
        v1 = jax.block_until_ready(fn(k1, *a1))
        t1 = time.perf_counter()
        v2 = jax.block_until_ready(fn(k2, *a2))
        t2 = time.perf_counter()
        print(f"  rep{i}: k{k1} {1e3 * (t1 - t0):.1f}ms k{k2} "
              f"{1e3 * (t2 - t1):.1f}ms v {float(np.ravel(v1)[0]):.6g} "
              f"{float(np.ravel(v2)[0]):.6g}", file=sys.stderr)
        slopes.append(((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1e3)
    slopes.sort()
    return slopes[len(slopes) // 2]


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from adaptaqc_tpu.backends import mps_core
    from adaptaqc_tpu.ops import cplx, pallas_eigh
    from adaptaqc_tpu.ops.cplx import C

    chi = int(os.environ.get("PROFILE_CHI", 64))
    n = int(os.environ.get("PROFILE_N", 50))
    m = 2 * chi
    # UNSEEDED rng: the axon relay memoizes identical executions
    # PERSISTENTLY across processes, so deterministic inputs replay from the
    # worker's cache and measure nothing (observed 2026-08-19: fresh salts
    # 1e-6*i returned in 0.1 ms after an earlier run executed them)
    rng = np.random.default_rng()

    def rand_c(*shape):
        return C(jnp.asarray(rng.normal(size=shape), jnp.float32),
                 jnp.asarray(rng.normal(size=shape), jnp.float32))

    # a generic dense theta (worst-case spectrum is irrelevant for timing)
    theta0 = rand_c(m, m)
    herm0 = theta0.H @ theta0

    def salted(base):
        return lambda i: (C(base.re + np.float32(1e-6 * (i + 1)),
                            base.im),)

    results = {}

    # --- gram: theta^H theta --------------------------------------------
    def gram_k(k, t):
        def body(x, _):
            h = x.H @ x
            # feed back a cheap mix so iterations aren't memoized/hoisted
            return C(x.re + h.re[0, 0] * 1e-20, x.im), None
        x, _ = lax.scan(body, t, None, length=k)
        return x.re[0, 0]

    gk = jax.jit(gram_k, static_argnums=0)
    results["gram_ms"] = slope_ms(gk, salted(theta0))

    # --- pallas tridiag ---------------------------------------------------
    def tri_k(k, h):
        def body(x, _):
            _, _, vcr, vci, packed = pallas_eigh._tridiag_call(
                x.re, x.im, False)
            return C(x.re + packed[3, 0] * 1e-20, x.im), None
        x, _ = lax.scan(body, h, None, length=k)
        return x.re[0, 0]

    tk = jax.jit(tri_k, static_argnums=0)
    results["tridiag_ms"] = slope_ms(tk, salted(herm0))

    # --- native real eigh of dense T (m x m) ------------------------------
    d0 = jnp.asarray(rng.normal(size=m), jnp.float32)
    e0 = jnp.asarray(rng.normal(size=m - 1), jnp.float32)

    def eighT_k(k, d, e):
        t = jnp.diag(d) + jnp.diag(e, 1) + jnp.diag(e, -1)

        def body(x, _):
            w, z = jnp.linalg.eigh(x)
            return x + w[0] * 1e-20, z[0, 0]
        x, zs = lax.scan(body, t, None, length=k)
        return x[0, 0] + zs[-1]

    ek = jax.jit(eighT_k, static_argnums=0)
    results["eigh_T_ms"] = slope_ms(
        ek, lambda i: (d0 + np.float32(1e-6 * (i + 1)), e0))

    # --- pallas teig (in-kernel tridiagonal eigensolver) --------------------
    def teig_k(k, h):
        def body(x, _):
            _, _, vcr, vci, packed = pallas_eigh._tridiag_call(
                x.re, x.im, False)
            wp, z = pallas_eigh._teig_call(packed, pallas_eigh._teig_b0(m),
                                           False)
            return C(x.re + wp[0, 0] * 1e-20, x.im), None
        x, _ = lax.scan(body, h, None, length=k)
        return x.re[0, 0]

    qk = jax.jit(teig_k, static_argnums=0)
    results["tridiag_plus_teig_ms"] = slope_ms(qk, salted(herm0))

    # --- svd_trunc (full) --------------------------------------------------
    def svd_k(k, t):
        def body(x, _):
            u, s, vh = cplx.svd_trunc(x, chi, 1e-16)
            return C(x.re + s[0] * 1e-20, x.im), None
        x, _ = lax.scan(body, t, None, length=k)
        return x.re[0, 0]

    sk = jax.jit(svd_k, static_argnums=0)
    results["svd_trunc_ms"] = slope_ms(sk, salted(theta0))

    # --- full adjacent 2q apply -------------------------------------------
    state = mps_core.zero_mps(n, chi)
    u4_0 = rand_c(4, 4)

    def apply_k(k, st, u4):
        def body(x, i):
            return mps_core._apply_2q_adjacent(x, u4, i % (n - 1), 1e-16), None
        x, _ = lax.scan(body, st, jnp.arange(k))
        return x.lam[1, 0]

    ak = jax.jit(apply_k, static_argnums=0)
    results["apply_2q_ms"] = slope_ms(
        ak, lambda i: (state, C(u4_0.re + np.float32(1e-6 * (i + 1)),
                                u4_0.im)))

    # --- 1q apply ----------------------------------------------------------
    u2_0 = rand_c(2, 2)

    def apply1_k(k, st, u2):
        def body(x, i):
            return mps_core._apply_1q_at(x, u2, i % n), None
        x, _ = lax.scan(body, st, jnp.arange(k))
        return x.b.re[0, 0, 0, 0]

    a1 = jax.jit(apply1_k, static_argnums=0)
    results["apply_1q_ms"] = slope_ms(
        a1, lambda i: (state, C(u2_0.re + np.float32(1e-6 * (i + 1)),
                                u2_0.im)))

    results.update(chi=chi, n=n, platform=jax.default_backend(),
                   device=str(jax.devices()[0].device_kind
                              if hasattr(jax.devices()[0], "device_kind")
                              else jax.devices()[0]))
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    with paused_queue_jobs() as paused:
        print(f"paused {len(paused)} queue job pids", file=sys.stderr)
        time.sleep(2.0)  # let in-flight device ops drain
        main()
