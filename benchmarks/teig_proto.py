"""Numpy prototype of the top-k tridiagonal eigensolver (Sturm bisection +
pivoted inverse iteration) that will replace jnp.linalg.eigh(T) inside the
pallas eigh path. Validated here against numpy.linalg.eigh on the spectra
this workload actually produces (Gram matrices of MPS bond updates: decades-
spanning s^2, exact degeneracies from Bell/GHZ, exact zeros from product
bonds) before any kernel is written.

Algorithm (all f32, vectorized across the k candidates exactly as the
Pallas kernel will be):
  1. Gershgorin bounds for the spectrum.
  2. Sturm-count bisection for the j-th largest eigenvalue, j = 0..k-1
     (count(sigma) = #eigs < sigma via the dlaebz-guarded recurrence).
  3. Cluster separation: perturb coincident converged eigenvalues by a few
     ulps so inverse iteration sees distinct shifts.
  4. Inverse iteration with partial-pivoted tridiagonal LU (dlagtf-style,
     one fill-in superdiagonal), fixed b0, two rounds.
  5. CGS2 re-orthonormalization across the k vectors (handles clusters).
"""
import numpy as np


def sturm_count(d, e, sigma, pivmin):
    """#eigenvalues of T strictly below each sigma (vectorized over sigma)."""
    n = d.shape[0]
    sigma = np.asarray(sigma)
    q = d[0] - sigma
    q = np.where(np.abs(q) < pivmin, -pivmin, q)
    count = (q < 0).astype(np.int32)
    for i in range(1, n):
        q = d[i] - sigma - (e[i - 1] * e[i - 1]) / q
        q = np.where(np.abs(q) < pivmin, -pivmin, q)
        count += q < 0
    return count


def topk_eigvals(d, e, k, iters=40):
    n = d.shape[0]
    r = np.zeros(n, np.float32)
    r[:-1] += np.abs(e)
    r[1:] += np.abs(e)
    lo = np.float32((d - r).min())
    hi = np.float32((d + r).max())
    scale = max(abs(lo), abs(hi), 1e-30)
    pivmin = np.float32(max(1e-30, (np.float32(1.2e-7) * scale) ** 2))
    # j-th largest eigenvalue: find sigma with count(sigma) = n - 1 - j,
    # converging onto the eigenvalue from below/above
    j = np.arange(k)
    target = n - 1 - j  # want count <= target => sigma below eig_j's upper edge
    los = np.full(k, lo, np.float32)
    his = np.full(k, hi, np.float32)
    for _ in range(iters):
        mid = (los + his) * np.float32(0.5)
        c = sturm_count(d, e, mid, pivmin)
        # if count(mid) > target, mid is above the j-th largest -> move hi
        above = c > target
        his = np.where(above, mid, his)
        los = np.where(above, los, mid)
    return ((los + his) * 0.5).astype(np.float32)


def separate_clusters(w, scale):
    """Perturb equal/near-equal converged eigenvalues so the inverse-
    iteration shifts are distinct (LAPACK stein perturbs by ulps)."""
    w = w.copy()
    eps = np.float32(1.2e-7) * scale
    for i in range(1, len(w)):
        if w[i] > w[i - 1] - eps:      # descending order: too close
            w[i] = w[i - 1] - eps
    return w


def tridiag_lu_solve(d, e, lam, b, pivmin):
    """Solve (T - lam I) x = b by partial-pivoted elimination (dlagtf
    semantics: one fill-in superdiagonal), vectorized over the lam axis.
    d (n,), e (n-1,), lam (k,), b (n, k) -> x (n, k).

    Row triples carried per step i: pivot row (du, u1, u2) stored, next row
    (a, s1) carried forward; fill-in enters the second superdiagonal only
    through a swap."""
    n = d.shape[0]
    k = lam.shape[0]

    def guard(v):
        return np.where(np.abs(v) < pivmin,
                        np.where(v >= 0, pivmin, -pivmin), v)

    du = np.zeros((n, k), np.float32)
    u1 = np.zeros((n, k), np.float32)
    u2 = np.zeros((n, k), np.float32)
    bb = b.astype(np.float32).copy()
    a_i = d[0] - lam                        # (k,) current diagonal at row i
    s1_i = np.broadcast_to(e[0] if n > 1 else 0.0, (k,)).astype(np.float32)
    for i in range(n - 1):
        a_next = d[i + 1] - lam
        s1_next = (np.broadcast_to(e[i + 1], (k,)).astype(np.float32)
                   if i + 1 < n - 1 else np.zeros(k, np.float32))
        # row i: [a_i, s1_i, 0(+fill)] over cols (i, i+1, i+2); the fill
        # column of the CARRIED row is always zero before this step
        r1 = (a_i, s1_i, np.zeros(k, np.float32))
        r2 = (np.full(k, e[i], np.float32), a_next, s1_next)
        swap = np.abs(r2[0]) > np.abs(r1[0])
        top = tuple(np.where(swap, y, x) for x, y in zip(r1, r2))
        bot = tuple(np.where(swap, x, y) for x, y in zip(r1, r2))
        t0 = guard(top[0])
        m = bot[0] / t0
        du[i], u1[i], u2[i] = t0, top[1], top[2]
        a_i = bot[1] - m * top[1]
        s1_i = bot[2] - m * top[2]
        bt = np.where(swap, bb[i + 1], bb[i])
        bo = np.where(swap, bb[i], bb[i + 1])
        bb[i] = bt
        bb[i + 1] = bo - m * bt
    du[n - 1] = guard(a_i)
    # back substitution with two bands
    x = np.zeros((n, k), np.float32)
    x[n - 1] = bb[n - 1] / du[n - 1]
    if n >= 2:
        x[n - 2] = (bb[n - 2] - u1[n - 2] * x[n - 1]) / du[n - 2]
    for i in range(n - 3, -1, -1):
        x[i] = (bb[i] - u1[i] * x[i + 1] - u2[i] * x[i + 2]) / du[i]
    return x


def topk_teig(d, e, k, rounds=2, rng=None):
    """Top-k eigenpairs of symmetric tridiagonal (d, e), descending."""
    d = d.astype(np.float32)
    e = e.astype(np.float32)
    n = d.shape[0]
    scale = np.float32(max(np.abs(d).max(), np.abs(e).max() if n > 1 else 0,
                           1e-30))
    pivmin = np.float32(max(1e-35, (1.2e-7 * scale) ** 2))
    w = topk_eigvals(d, e, k)
    lam = separate_clusters(w, scale)
    if rng is None:
        rng = np.random.default_rng(12345)
    x = rng.normal(size=(n, k)).astype(np.float32)
    for _ in range(rounds):
        x = tridiag_lu_solve(d, e, lam, x, pivmin)
        x = x / np.maximum(np.linalg.norm(x, axis=0, keepdims=True), 1e-30)
    # CGS2 across candidates (descending eigenvalue order keeps clusters
    # contiguous; "twice is enough")
    for _ in range(2):
        q, _ = np.linalg.qr(x)  # prototype stand-in for the CGS2 pass
        x = q.astype(np.float32)
    return w, x


def check(name, d, e, k):
    t = np.diag(d.astype(np.float64)) + np.diag(e.astype(np.float64), 1) \
        + np.diag(e.astype(np.float64), -1)
    w_all, v_all = np.linalg.eigh(t)
    w_all = w_all[::-1]
    v_all = v_all[:, ::-1]
    w_ref = w_all[:k]
    w, v = topk_teig(d, e, k)
    scale = max(abs(w_ref[0]), 1e-30)
    dw = np.abs(w - w_ref).max() / scale
    # per-vector residual ||T v - v w|| and orthonormality
    res = np.abs(t @ v - v * w[None, :]).max() / scale
    gram = v.T @ v
    orth = np.abs(gram - np.eye(k)).max()
    # projector distance onto the reference top-m subspace, tie-extended at
    # the k boundary (within a degenerate cluster any basis is valid)
    m = k
    while m < t.shape[0] and w_all[m] > w_ref[k - 1] - 1e-5 * scale:
        m += 1
    vr = v_all[:, :m]
    proj = np.linalg.norm(v - vr @ (vr.T @ v)) / np.sqrt(k)
    print(f"{name:28s} dw={dw:.2e} res={res:.2e} orth={orth:.2e} "
          f"proj={proj:.2e} (m={m})")
    return dw < 5e-6 and orth < 1e-2 and proj < 1e-2


def main():
    rng = np.random.default_rng(0)
    ok = True
    n, k = 128, 64

    # 1. generic random Gram spectrum (decades)
    s = (10.0 ** rng.uniform(-7, 0, n)).astype(np.float64)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    h = (q * s) @ q.T
    # Lanczos in f64 to build T
    d_, e_ = gram_tridiag_from_theta_real(h)
    ok &= check("random decades", d_, e_, k)

    # 2. exact degeneracies (Bell-like: blocks of equal values)
    s2 = np.repeat([1.0, 0.25, 1e-3, 1e-6], n // 4)
    h2 = (q * s2) @ q.T
    d2, e2 = gram_tridiag_from_theta_real(h2)
    ok &= check("degenerate blocks", d2, e2, k)

    # 3. exact zeros / decoupled (product-state bonds): e has zeros
    d3 = np.sort(rng.uniform(0, 1, n))[::-1].astype(np.float32).copy()
    e3 = rng.uniform(-0.1, 0.1, n - 1).astype(np.float32)
    e3[::3] = 0.0
    ok &= check("decoupled zeros", d3, e3, k)

    # 4. all-equal diagonal, tiny couplings
    d4 = np.ones(n, np.float32)
    e4 = np.full(n - 1, 1e-6, np.float32)
    ok &= check("flat spectrum", d4, e4, k)

    # 5. GHZ-type: two exactly-equal dominant values, rest ~0
    s5 = np.zeros(n)
    s5[:2] = 0.5
    h5 = (q * s5) @ q.T
    d5, e5 = gram_tridiag_from_theta_real(h5)
    ok &= check("GHZ two-equal", d5, e5, k)

    print("ALL OK" if ok else "FAILURES")


def gram_tridiag_from_theta_real(h, rng=None):
    """Lanczos with full reorthogonalization + breakdown restart (rank-
    deficient inputs hit beta = 0; restart with a fresh orthogonal vector,
    which keeps T block-structured with an exact zero coupling — exactly
    the decoupled-bond structure the solver must survive)."""
    if rng is None:
        rng = np.random.default_rng(99)
    n = h.shape[0]
    q = np.zeros((n, n))
    alpha = np.zeros(n)
    beta = np.zeros(n - 1)
    v = np.zeros(n)
    v[0] = 1.0
    for j in range(n):
        q[:, j] = v
        wv = h @ v
        alpha[j] = v @ wv
        wv = wv - alpha[j] * v - (beta[j - 1] * q[:, j - 1] if j else 0)
        wv -= q[:, : j + 1] @ (q[:, : j + 1].T @ wv)
        if j < n - 1:
            beta[j] = np.linalg.norm(wv)
            if beta[j] < 1e-12:
                beta[j] = 0.0
                v = rng.normal(size=n)
                v -= q[:, : j + 1] @ (q[:, : j + 1].T @ v)
                v /= np.linalg.norm(v)
            else:
                v = wv / beta[j]
    return alpha.astype(np.float32), beta.astype(np.float32)


if __name__ == "__main__":
    main()
