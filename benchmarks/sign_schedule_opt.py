"""Offline optimizer for the composite polynomial sign-filter schedules.

Produces the coefficient tables hard-coded in cuadmm_tpu/ops/polyfilter.py.
Method (cf. arXiv:2507.09165 / arXiv:2505.16932; this implementation is
independent): greedily compose odd degree-5 polynomials
p(y) = a y + b y^3 + c y^5.

- While the tracked lower bound l < 0.5, each step solves the LP
    maximize m  s.t.  p(y) >= m on [l, u],  0 <= p(y) <= U on [0, u]
  (inflation: push the smallest resolvable eigenvalue toward 1 while the
  whole [0, u] image stays bounded -- values below l can never escape).
- Afterwards, polish steps solve the minimax LP
    minimize t  s.t.  |p(y) - 1| <= t on [l, u].

Both are linear in (a, b, c), so scipy's HiGHS solves them exactly; the
attained interval is re-measured on a fine grid rather than trusted from
the LP (this matters -- composite filters amplify any unmodeled overshoot
catastrophically).

Usage: python benchmarks/sign_schedule_opt.py [l0] [tol] [U]
"""

import sys

import numpy as np
from scipy.optimize import linprog


def _grid(l, u, n=3000):
    lo = max(l * 1e-3, 1e-12)
    g = np.concatenate([np.logspace(np.log10(lo), np.log10(u), n), np.linspace(lo, u, n)])
    return np.unique(g)


def _vand(y):
    return np.stack([y, y**3, y**5], axis=1)


def inflate_step(l, u, U):
    y_all = _grid(l, u)
    y_core = y_all[y_all >= l]
    Va, Vc = _vand(y_all), _vand(y_core)
    A_ub = np.vstack(
        [
            np.hstack([-Vc, np.ones((len(Vc), 1))]),  # m - p <= 0 on [l,u]
            np.hstack([Va, np.zeros((len(Va), 1))]),  # p <= U on [0,u]
            np.hstack([-Va, np.zeros((len(Va), 1))]),  # p >= 0 on [0,u]
        ]
    )
    b_ub = np.concatenate([np.zeros(len(Vc)), np.full(len(Va), U), np.zeros(len(Va))])
    res = linprog(
        np.array([0, 0, 0, -1.0]),
        A_ub=A_ub,
        b_ub=b_ub,
        bounds=[(None, None)] * 4,
        method="highs",
    )
    assert res.success, (l, u)
    a, b, c, _ = res.x
    yf = _grid(l, u, 20000)
    p = a * yf[yf >= l] + b * yf[yf >= l] ** 3 + c * yf[yf >= l] ** 5
    return (a, b, c), p.min(), p.max()


def polish_step(l, u):
    y = np.linspace(l, u, 4000)
    V = _vand(y)
    A_ub = np.block([[V, -np.ones((len(y), 1))], [-V, -np.ones((len(y), 1))]])
    b_ub = np.concatenate([np.ones(len(y)), -np.ones(len(y))])
    res = linprog(
        np.array([0, 0, 0, 1.0]),
        A_ub=A_ub,
        b_ub=b_ub,
        bounds=[(None, None)] * 3 + [(0, None)],
        method="highs",
    )
    assert res.success
    a, b, c, _ = res.x
    yf = np.linspace(l, u, 20000)
    p = a * yf + b * yf**3 + c * yf**5
    return (a, b, c), p.min(), p.max()


def schedule(l0, tol=1e-13, U=1.2, max_steps=40):
    l, u = l0, 1.0
    out = []
    for _ in range(max_steps):
        co, l, u = inflate_step(l, u, U) if l < 0.5 else polish_step(l, u)
        out.append(co)
        if max(u - 1, 1 - l) < tol:
            break
    return out


def validate(sched, l0, dtype):
    y = np.unique(
        np.concatenate([np.logspace(-12, 0, 6000), np.linspace(0, 1, 6000)])
    ).astype(dtype)
    s = y.copy()
    for a, b, c in sched:
        s = (dtype(a) * s + dtype(b) * s**3 + dtype(c) * s**5).astype(dtype)
    m = y >= l0
    return np.abs(s[m] - 1).max(), np.abs(y * (s - 1) / 2).max()


if __name__ == "__main__":
    l0 = float(sys.argv[1]) if len(sys.argv) > 1 else 1e-6
    tol = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-13
    U = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    sched = schedule(l0, tol, U)
    sign_err, proj_err = validate(sched, l0, np.float64)
    print(f"# l0={l0:g} tol={tol:g} U={U}: {len(sched)} steps, "
          f"sign err {sign_err:.2e}, proj err {proj_err:.2e}")
    for co in sched:
        print("    (%.17f, %.17f, %.17f)," % co)
