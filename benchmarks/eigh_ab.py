"""A/B the bond-truncation eigh implementations on TPU.

Usage: python benchmarks/eigh_ab.py {embed|tridiag|pallas} [chi]

Measures, for the chosen cplx.EIGH_IMPL (set via env before import so every
jitted engine program traces the right path):
  1. bare svd_trunc slope: a fused lax.scan over VARIED (2chi, 2chi) thetas
     (relay memoizes identical executions; per-call sync is ~33-70 ms, so
     only fused slopes are meaningful — docs/tpu_design_notes.md).
  2. the full bench.py Rotoselect sweep at n=50 (ms/sweep), the number the
     VERDICT "roughly halve sweep ms/cycle" target is judged on.

Run each impl in its own process:
  for i in embed tridiag pallas; do python benchmarks/eigh_ab.py $i 64; done

Prints one JSON line per measurement to stdout.
"""

import json
import os
import sys
import time

impl = sys.argv[1] if len(sys.argv) > 1 else "embed"
chi = int(sys.argv[2]) if len(sys.argv) > 2 else 64
os.environ["ADAPTAQC_EIGH"] = impl

import numpy as np  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def micro_svd(chi, iters):
    """ms per svd_trunc at theta (2chi, 2chi), keep=chi, from a fused scan
    slope between `iters` and 2*iters repetitions of varied inputs."""
    import jax
    import jax.numpy as jnp
    from adaptaqc_tpu.ops import cplx

    n = 2 * chi
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    u, _, vh = np.linalg.svd(a)
    th = (u * np.logspace(0, -6, n)) @ vh
    th_re = jnp.asarray(th.real, jnp.float32)
    th_im = jnp.asarray(th.imag, jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def fused(t_re, t_im, k):
        def body(carry, i):
            tr, ti = carry
            # vary the input each iteration (defeats relay memoization and
            # any CSE) by folding the previous output back in
            u, s, vvh = cplx.svd_trunc(cplx.C(tr, ti), chi, 1e-7)
            d = (u * s) @ vvh
            mix = 1e-3 * jnp.cos(i.astype(jnp.float32))
            return (tr + mix * d.re, ti + mix * d.im), s[0]

        (_, _), ss = jax.lax.scan(body, (t_re, t_im),
                                  jnp.arange(k, dtype=jnp.int32))
        return ss

    # Perturbed inputs prepared OUTSIDE the timed region: computing them
    # inline would put the one-off add-program compile (~100s of ms via the
    # relay) inside t1 and make the slope negative. DISTINCT inputs per
    # repeat — the relay memoizes identical executions, so min-of-N with one
    # input would time the memo, not the program.
    reps = 3  # min-of-3 damps relay latency jitter
    perturbed = [th_re + jnp.float32(1e-6 * (r + 1)) for r in range(reps)]
    jax.block_until_ready(perturbed)

    def timed(k):
        out = fused(th_re, th_im, k)  # warm/compile this trip count
        jax.block_until_ready(out)
        best = float("inf")
        for r in range(reps):
            t0 = time.time()
            out = fused(perturbed[r], th_im, k)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        return best

    t1 = timed(iters)
    t2 = timed(2 * iters)
    return (t2 - t1) / iters * 1e3


def main():
    import jax

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} impl={impl} chi={chi}")

    ms = micro_svd(chi, 50)
    print(json.dumps({"bench": "svd_trunc", "impl": impl, "chi": chi,
                      "ms_per_call": round(ms, 4)}), flush=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    evals_s, evals, dt, _ = bench.run_sweep_benchmark(50, chi, 25, 3)
    print(json.dumps({"bench": "sweep50", "impl": impl, "chi": chi,
                      "ms_per_sweep": round(dt * 1e3, 2),
                      "evals_per_sec": round(evals_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
