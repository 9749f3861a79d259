"""On-device attribution of the teig gate failure (2026-08-20): for the
7-decade-spectrum cases that failed benchmarks/teig_check.py, compare the
singular values from ALL THREE device eigh impls (embed, pallas, teig)
against f64 numpy truth of the SAME f32 Gram. pallas and teig share the
Pallas tridiagonalization kernel; if pallas is off by the same ~5e-3 the
tridiagonalization (device-side) is the culprit, not the in-kernel
tridiagonal eigensolver."""
import sys

import numpy as np

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from adaptaqc_tpu.ops import cplx


def main():
    rng = np.random.default_rng(99)
    for m in (64, 128):
        a = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
        u, _, vh = np.linalg.svd(a)
        th = (u * np.logspace(0, -7, m)) @ vh
        th = th / np.linalg.norm(th)
        tc = cplx.C(jnp.asarray(th.real, jnp.float32),
                    jnp.asarray(th.imag, jnp.float32))
        # f64 truth of the f32-rounded theta (same input the device sees)
        th32 = np.asarray(tc.re, np.float64) + 1j * np.asarray(tc.im, np.float64)
        s_true = np.linalg.svd(th32, compute_uv=False)[: m // 2]
        keep = m // 2
        row = [f"spec7_{m}:"]
        for impl in ("embed", "pallas", "teig"):
            cplx.set_eigh_impl(impl)
            _, s, _ = cplx.svd_trunc(tc, keep, 1e-9)
            err = np.abs(np.asarray(s, np.float64)[: len(s_true)]
                         - s_true[: len(s)]).max()
            row.append(f"{impl}_err={err:.2e}")
        cplx.set_eigh_impl("")
        print(" ".join(row), flush=True)


if __name__ == "__main__":
    main()
