"""On-device teig correctness gate: svd_trunc under ADAPTAQC_EIGH=teig vs
the embed reference impl on random + degenerate (Bell/GHZ-type) inputs at
the benchmark operating shapes. Exit 0 iff all checks pass (the default
eigh impl only flips to teig after this passes on the real chip)."""
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from adaptaqc_tpu.ops import cplx


def main():
    rng = np.random.default_rng(99)
    cases = []
    for m in (64, 128, 256):
        a = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
        cases.append(("rand%d" % m, a / np.linalg.norm(a)))
        u, _, vh = np.linalg.svd(a)
        th = (u * np.logspace(0, -7, m)) @ vh
        cases.append(("spec7_%d" % m, th / np.linalg.norm(th)))
    th = np.zeros((64, 64), complex)
    th[0, 0] = th[63, 63] = 1 / np.sqrt(2)  # Bell-type exact degeneracy
    cases.append(("bell64", th))

    failures = 0
    for name, th in cases:
        tc = cplx.C(jnp.asarray(th.real, jnp.float32),
                    jnp.asarray(th.imag, jnp.float32))
        keep = th.shape[0] // 2
        outs = {}
        for impl in ("embed", "teig"):
            cplx.set_eigh_impl(impl)
            u, s, vh = cplx.svd_trunc(tc, keep, 1e-7)
            U = np.asarray(u.re) + 1j * np.asarray(u.im)
            Vh = np.asarray(vh.re) + 1j * np.asarray(vh.im)
            outs[impl] = (U, np.asarray(s), Vh)
        cplx.set_eigh_impl("")
        s_err = np.abs(outs["embed"][1] - outs["teig"][1]).max()
        rec_e = (outs["embed"][0] * outs["embed"][1]) @ outs["embed"][2]
        rec_t = (outs["teig"][0] * outs["teig"][1]) @ outs["teig"][2]
        rec_err = np.abs(rec_e - rec_t).max()
        ok = s_err < 5e-5 and rec_err < 5e-4
        failures += not ok
        print(f"{name}: s_err={s_err:.2e} rec_err={rec_err:.2e} "
              f"{'OK' if ok else 'FAIL'}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
