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


@contextlib.contextmanager
def paused_queue_jobs():
    paused = []
    for pf in (glob.glob("/tmp/*seed_queue*.pid")
               + glob.glob("/tmp/ladder*.pid")):
        try:
            with open(pf) as f:
                root = int(f.read().strip())
        except (OSError, ValueError):
            continue
        for pid in _descendants(root):
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


def slope_ms(fn, args_a, args_b, k1=8, k2=40):
    """Wall-clock slope per iteration between k1 and k2 fused repetitions."""
    import jax

    fn(k1, *args_a)  # compile both trip counts
    fn(k2, *args_a)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(k1, *args_b))
    t1 = time.perf_counter()
    jax.block_until_ready(fn(k2, *args_b))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1e3


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
    rng = np.random.default_rng(0)

    def rand_c(*shape):
        return C(jnp.asarray(rng.normal(size=shape), jnp.float32),
                 jnp.asarray(rng.normal(size=shape), jnp.float32))

    # a generic dense theta (worst-case spectrum is irrelevant for timing)
    theta_a, theta_b = rand_c(m, m), rand_c(m, m)
    herm_a = theta_a.H @ theta_a
    herm_b = theta_b.H @ theta_b

    results = {}

    # --- gram: theta^H theta --------------------------------------------
    @jax.jit
    def gram_k(k, t):
        def body(x, _):
            h = x.H @ x
            # feed back a cheap mix so iterations aren't memoized/hoisted
            return C(x.re + h.re[0, 0] * 1e-20, x.im), None
        x, _ = lax.scan(body, t, None, length=k)
        return x.re[0, 0]

    gk = jax.jit(gram_k, static_argnums=0)
    results["gram_ms"] = slope_ms(gk, (theta_a,), (theta_b,))

    # --- pallas tridiag ---------------------------------------------------
    def tri_k(k, h):
        def body(x, _):
            _, _, vcr, vci, packed = pallas_eigh._tridiag_call(
                x.re, x.im, False)
            return C(x.re + packed[3, 0] * 1e-20, x.im), None
        x, _ = lax.scan(body, h, None, length=k)
        return x.re[0, 0]

    tk = jax.jit(tri_k, static_argnums=0)
    results["tridiag_ms"] = slope_ms(tk, (herm_a,), (herm_b,))

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
    results["eigh_T_ms"] = slope_ms(ek, (d0, e0), (d0 * 1.1, e0))

    # --- svd_trunc (full) --------------------------------------------------
    def svd_k(k, t):
        def body(x, _):
            u, s, vh = cplx.svd_trunc(x, chi, 1e-16)
            return C(x.re + s[0] * 1e-20, x.im), None
        x, _ = lax.scan(body, t, None, length=k)
        return x.re[0, 0]

    sk = jax.jit(svd_k, static_argnums=0)
    results["svd_trunc_ms"] = slope_ms(sk, (theta_a,), (theta_b,))

    # --- full adjacent 2q apply -------------------------------------------
    state = mps_core.zero_mps(n, chi)
    u4_a = rand_c(4, 4)
    u4_b = rand_c(4, 4)

    def apply_k(k, st, u4):
        def body(x, i):
            return mps_core._apply_2q_adjacent(x, u4, i % (n - 1), 1e-16), None
        x, _ = lax.scan(body, st, jnp.arange(k))
        return x.lam[1, 0]

    ak = jax.jit(apply_k, static_argnums=0)
    results["apply_2q_ms"] = slope_ms(ak, (state, u4_a), (state, u4_b))

    # --- 1q apply ----------------------------------------------------------
    u2_a, u2_b = rand_c(2, 2), rand_c(2, 2)

    def apply1_k(k, st, u2):
        def body(x, i):
            return mps_core._apply_1q_at(x, u2, i % n), None
        x, _ = lax.scan(body, st, jnp.arange(k))
        return x.b.re[0, 0, 0, 0]

    a1 = jax.jit(apply1_k, static_argnums=0)
    results["apply_1q_ms"] = slope_ms(a1, (state, u2_a), (state, u2_b))

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
