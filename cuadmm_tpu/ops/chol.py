"""Normal-equation solver for (A A^T) y = rhs.

The reference factorizes AA^T once with CHOLMOD on the CPU and then ships
the right-hand side device->host->device **twice per iteration** for the
triangular solves (reference: include/cuadmm/cholesky_cpu.h:33-155,
src/solver.cu:487-500 and :704-717). On TPU that host round-trip would
serialize the whole pipeline, so everything here is device-resident:

- ``dense`` (default): AA^T is *built and Cholesky-factorized on device*
  in one jitted program -- only the COO triplets of A ever cross the
  host->TPU link. Each solve is two triangular solves plus optional
  iterative-refinement steps (cheap sparse matvecs) that recover the
  accuracy lost to a float32 factor.
- ``cg``: Jacobi-preconditioned conjugate gradient using only the sparse
  A matvecs (for con_num too large to hold a dense factor).
- ``host``: scipy sparse LU factorization once, host callback per solve --
  the reference-style fallback, kept for parity/debugging.

All three expose ``solve(rhs, warm)`` usable inside jit.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from cuadmm_tpu.ops.sparse import SparseA, spmv_a, spmv_at


@dataclasses.dataclass
class NormalEqSolver:
    mode: str
    # dense: lower Cholesky factor (device array), else None.
    chol_l: Optional[jax.Array]
    # cg: inverse diagonal preconditioner (device array), else None.
    inv_diag: Optional[jax.Array]
    sparse_a: Optional[SparseA]
    cg_tol: float
    cg_max_iter: int
    refine_steps: int = 0
    # host: callable rhs(np) -> y(np)
    host_solve: Optional[Callable] = None
    eps_used: float = 0.0
    # inv: explicit (AA^T + eps I)^{-1} (device array), else None.
    inv_m: Optional[jax.Array] = None

    def _apply_factor(self, rhs: jax.Array) -> jax.Array:
        if self.mode == "inv":
            # One dense matvec on the MXU. Triangular solves on TPU are
            # latency-bound sequential chains (~n/128 dependent steps);
            # the explicit inverse turns each solve into bandwidth-bound
            # work, and iterative refinement restores the accuracy.
            return self.inv_m @ rhs
        return jax.scipy.linalg.cho_solve((self.chol_l, True), rhs)

    def solve(self, rhs: jax.Array, warm: Optional[jax.Array] = None) -> jax.Array:
        if self.mode in ("dense", "inv"):
            y = self._apply_factor(rhs)
            # Iterative refinement: each step costs two sparse matvecs +
            # one factor application and squares away the float32
            # factorization/inversion error (the reference gets f64
            # accuracy from CHOLMOD; we recover it on device).
            for _ in range(self.refine_steps):
                r = rhs - _aat_matvec(self.sparse_a, y)
                y = y + self._apply_factor(r)
            return y
        if self.mode == "cg":
            return _pcg(
                self.sparse_a,
                rhs,
                self.inv_diag,
                rhs if warm is None else warm,
                self.cg_tol,
                self.cg_max_iter,
            )
        if self.mode == "host":
            return jax.pure_callback(
                lambda r: np.asarray(self.host_solve(np.asarray(r, dtype=np.float64))).astype(r.dtype),
                jax.ShapeDtypeStruct(rhs.shape, rhs.dtype),
                rhs,
                vmap_method="sequential",
            )
        raise ValueError(self.mode)


jax.tree_util.register_dataclass(
    NormalEqSolver,
    data_fields=["chol_l", "inv_diag", "sparse_a", "inv_m"],
    meta_fields=["mode", "cg_tol", "cg_max_iter", "refine_steps", "host_solve", "eps_used"],
)


def _aat_matvec(sa: SparseA, v: jax.Array) -> jax.Array:
    return spmv_a(sa, spmv_at(sa, v))


def _pcg(sa, rhs, inv_diag, x0, tol, max_iter):
    """Jacobi-preconditioned CG on AA^T, fixed-shape while_loop (jit-safe)."""
    rhs_nsq = jnp.dot(rhs, rhs)

    def cond(carry):
        _, r, _, _, rz, it = carry
        return jnp.logical_and(it < max_iter, jnp.dot(r, r) > tol * tol * rhs_nsq)

    def body(carry):
        x, r, z, p, rz, it = carry
        ap = _aat_matvec(sa, p)
        alpha = rz / jnp.dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = r * inv_diag
        rz_new = jnp.dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return x, r, z, p, rz_new, it + 1

    r0 = rhs - _aat_matvec(sa, x0)
    z0 = r0 * inv_diag
    init = (x0, r0, z0, z0, jnp.dot(r0, z0), jnp.array(0, jnp.int32))
    x, *_ = jax.lax.while_loop(cond, body, init)
    return x


def build_aat_host(
    at_svec_idx: np.ndarray,
    at_con_idx: np.ndarray,
    vals: np.ndarray,
    con_num: int,
    vec_len: int,
) -> sp.csr_matrix:
    """Host-side sparse AA^T (con_num x con_num) from A^T triplets."""
    a = sp.csr_matrix(
        (vals, (at_con_idx, at_svec_idx)), shape=(con_num, vec_len)
    )
    return (a @ a.T).tocsr()


def _device_factorize(
    at_svec_idx, at_con_idx, vals, con_num, vec_len, dtype, eps: float,
    dense_a_build_limit: int = 6 * 1024**3,
    out_dtype=None,
):
    """Build AA^T and its Cholesky factor on device.

    Preferred path: scatter A dense on device (COO triplets are the only
    host->device transfer) and form AA^T on the MXU. If dense A would not
    fit, fall back to a host sparse AA^T product (cheap) and ship the dense
    AA^T once.

    ``dtype`` is the factorization arithmetic; ``out_dtype`` (default the
    same) is what the factor is cast to for downstream solves -- used to
    factorize in f32 on TPU (f64 Cholesky is software-emulated there and
    needs ~5x the memory) while iterating in f64.
    """
    out_dtype = dtype if out_dtype is None else out_dtype
    itemsize = jnp.dtype(dtype).itemsize
    rows = jnp.asarray(at_con_idx, jnp.int32)
    cols = jnp.asarray(at_svec_idx, jnp.int32)
    v = jnp.asarray(vals, dtype)

    if con_num * vec_len * itemsize <= dense_a_build_limit:

        @jax.jit
        def fac(rows, cols, v, eps_arr):
            a = jnp.zeros((con_num, vec_len), dtype).at[rows, cols].add(v)
            aat = jax.lax.dot_general(
                a, a, (((1,), (1,)), ((), ())), precision="highest"
            )
            scale = jnp.maximum(jnp.trace(aat) / con_num, 1.0)
            aat = aat + (eps_arr * scale) * jnp.eye(con_num, dtype=dtype)
            l = jnp.linalg.cholesky(aat)
            return l, jnp.isfinite(l[-1, -1])

        make = lambda e: fac(rows, cols, v, jnp.asarray(e, dtype))
    else:
        aat_host = build_aat_host(at_svec_idx, at_con_idx, vals, con_num, vec_len)
        aat_dev = jnp.asarray(np.asarray(aat_host.todense()), dtype)
        tr = float(max(aat_host.diagonal().sum() / con_num, 1.0))

        @jax.jit
        def fac2(aat, eps_arr):
            aat = aat + (eps_arr * tr) * jnp.eye(con_num, dtype=dtype)
            l = jnp.linalg.cholesky(aat)
            return l, jnp.isfinite(l[-1, -1])

        make = lambda e: fac2(aat_dev, jnp.asarray(e, dtype))

    # Adaptive jitter: the reference's CHOLMOD LDLt tolerates semidefinite
    # AA^T with eps=1e-15 (cholesky_cpu.h:50); plain Cholesky needs the
    # diagonal safely positive. Escalate until the factor is finite.
    cur = max(eps, 1e-7 if jnp.dtype(dtype) == jnp.float32 else eps)
    while True:
        l, ok = make(cur)
        if bool(ok):
            return l.astype(out_dtype), cur
        cur = max(cur * 1e3, 1e-12 if jnp.dtype(dtype) == jnp.float64 else 1e-6)
        if cur > 1e-2:
            raise RuntimeError("AA^T Cholesky failed even with jitter 1e-2")


def _blocked_tri_inv(L: jax.Array, base: int = 512) -> jax.Array:
    """Explicit inverse of a lower-triangular matrix by recursive blocking.

    inv([[A,0],[B,C]]) = [[inv(A),0],[-inv(C) B inv(A), inv(C)]] -- all
    matmuls, so the MXU does the work. XLA's solve_triangular on a large
    (n, n) identity RHS unrolls into O(n/128) full-width temporaries and
    OOMs around n~17k; this stays at O(n^2) memory.
    """
    n = L.shape[0]
    if n <= base:
        return jax.scipy.linalg.solve_triangular(
            L, jnp.eye(n, dtype=L.dtype), lower=True
        )
    m = ((n // 2) + 127) // 128 * 128
    if m >= n:
        m = n // 2
    a_inv = _blocked_tri_inv(L[:m, :m], base)
    c_inv = _blocked_tri_inv(L[m:, m:], base)
    off = -c_inv @ (L[m:, :m] @ a_inv)
    top = jnp.concatenate([a_inv, jnp.zeros((m, n - m), L.dtype)], axis=1)
    bot = jnp.concatenate([off, c_inv], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@functools.partial(jax.jit, donate_argnums=0)
def _spd_inv_from_chol(L: jax.Array) -> jax.Array:
    """inv(L L^T) = L^{-T} L^{-1}, built without giant TRSM temporaries."""
    li = _blocked_tri_inv(L)
    return jax.lax.dot_general(
        li, li, (((0,), (0,)), ((), ())), precision="highest"
    )


def build_normal_solver(
    at_svec_idx: np.ndarray,
    at_con_idx: np.ndarray,
    vals: np.ndarray,
    con_num: int,
    vec_len: int,
    sparse_a: SparseA,
    mode: str,
    dtype,
    eps: float = 1e-15,
    dense_chol_max: int = 32768,
    cg_tol: float = 1e-12,
    cg_max_iter: int = 400,
    refine_steps: Optional[int] = None,
) -> NormalEqSolver:
    """Factorize once at init (reference: src/solver.cu:91-96) and return a
    device-resident solver."""
    on_tpu = jax.default_backend() == "tpu"
    if mode == "auto":
        if con_num <= dense_chol_max:
            # Explicit inverse on TPU (matvec beats TPU triangular solves,
            # and f64 Cholesky/TRSM are emulated there); classic Cholesky
            # solves on CPU (the reference-parity path).
            mode = "inv" if (jnp.dtype(dtype) == jnp.float32 or on_tpu) else "dense"
        else:
            mode = "cg"
    # f64 on TPU: factorize in f32 (emulated f64 Cholesky needs ~5x the
    # memory and OOMs around con_num ~ 12k); refinement below restores the
    # accuracy against the exact sparse AA^T matvec.
    fac_dtype = jnp.float32 if (on_tpu and jnp.dtype(dtype) == jnp.float64) else dtype
    if refine_steps is None:
        refine_steps = 0
        if jnp.dtype(dtype) == jnp.float32:
            refine_steps = 1
        if jnp.dtype(fac_dtype) != jnp.dtype(dtype):
            refine_steps = 3

    if mode in ("dense", "inv"):
        # For "inv", invert at factorization precision (all matmuls) and
        # cast only the final inverse; for "dense", cast the factor.
        l, eps_used = _device_factorize(
            at_svec_idx, at_con_idx, vals, con_num, vec_len, fac_dtype, eps,
            out_dtype=fac_dtype if mode == "inv" else dtype,
        )
        inv_m = None
        if mode == "inv":
            inv_m = _spd_inv_from_chol(l).astype(dtype)
            l = None
        return NormalEqSolver(
            mode=mode,
            chol_l=l,
            inv_diag=None,
            sparse_a=sparse_a,
            cg_tol=cg_tol,
            cg_max_iter=cg_max_iter,
            refine_steps=refine_steps,
            eps_used=eps_used,
            inv_m=inv_m,
        )

    if mode == "cg":
        sq = np.zeros(con_num, dtype=np.float64)
        np.add.at(sq, at_con_idx, vals * vals)
        inv_diag = 1.0 / np.maximum(sq + eps, 1e-30)
        return NormalEqSolver(
            mode="cg",
            chol_l=None,
            inv_diag=jnp.asarray(inv_diag, dtype=dtype),
            sparse_a=sparse_a,
            cg_tol=cg_tol,
            cg_max_iter=cg_max_iter,
        )

    if mode == "host":
        aat = build_aat_host(at_svec_idx, at_con_idx, vals, con_num, vec_len)
        aat = aat + eps * sp.eye(con_num, format="csr")
        lu = spla.factorized(aat.tocsc())
        return NormalEqSolver(
            mode="host",
            chol_l=None,
            inv_diag=None,
            sparse_a=None,
            cg_tol=cg_tol,
            cg_max_iter=cg_max_iter,
            host_solve=lu,
        )

    raise ValueError(mode)
