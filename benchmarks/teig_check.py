"""On-device teig correctness gate, against f64 HOST TRUTH.

The first version of this gate compared teig's svd_trunc to the "embed"
impl and failed on 7-decade-spectrum inputs with s_err ~5e-3 — but the
attribution run (benchmarks/teig_diag.py) showed the reference baseline was
the inaccurate one: against numpy f64 SVD of the same f32 input, embed
loses the small singular values at ~2e-3 (the real 2n-embedding + CGS2
path), while the Pallas tridiagonalization paths sit at ~3e-5 (pallas) and
~3e-6 (teig). So the gate now scores every impl against f64 truth:

- s_err: max |s_impl - s_true| over the kept values;
- act_err: max |theta P_impl - theta P_true| where P = V_k V_k^H is the
  kept right-subspace projector. theta's action annihilates the numerical
  null space, so this is degeneracy-safe (Bell-type exactly repeated
  Schmidt values, rank < keep) while still catching subspace mixing.

Exit 0 iff teig passes everywhere (the default eigh impl only flips to
teig after this passes on the real chip). embed/pallas are reported for
reference on the same inputs."""
import sys

import numpy as np

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from adaptaqc_tpu.ops import cplx

TOL_S = 5e-4
TOL_ACT = 5e-4


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
        th32 = (np.asarray(tc.re, np.float64)
                + 1j * np.asarray(tc.im, np.float64))
        keep = th.shape[0] // 2
        _, s_true, vh_true = np.linalg.svd(th32)
        vk_true = vh_true[:keep].conj().T  # (n, keep) right singular basis
        act_true = th32 @ (vk_true @ vk_true.conj().T)
        for impl in ("embed", "pallas", "teig"):
            cplx.set_eigh_impl(impl)
            u, s, vh = cplx.svd_trunc(tc, keep, 1e-9)
            Vh = np.asarray(vh.re, np.float64) + 1j * np.asarray(vh.im,
                                                                 np.float64)
            s = np.asarray(s, np.float64)
            k = len(s)
            s_err = np.abs(s - s_true[:k]).max() if k else np.inf
            vk = Vh.conj().T
            act = th32 @ (vk @ vk.conj().T)
            # theta annihilates the numerical null space, so padding the
            # kept basis below the true rank is action-neutral
            act_err = np.abs(act - act_true).max()
            ok = s_err < TOL_S and act_err < TOL_ACT
            if impl == "teig":
                failures += not ok
            print(f"{name}/{impl}: s_err={s_err:.2e} act_err={act_err:.2e} "
                  f"{'OK' if ok else 'FAIL'}", flush=True)
        cplx.set_eigh_impl("")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
