"""On-chip diagnostics for TPU divergence (VERDICT r2 item #1).

Builds the real solver on the default backend and probes every stage the
iteration depends on, printing one JSON line per probe:

  1. matmul-precision canary (explicit + ambient)
  2. f64-emulation canary
  3. spmv_a / spmv_at vs host scipy
  4. normal-solve residual on a consistent rhs (rhs = AA^T v)
  5. projection idempotency check on the real first Xb
  6. five single iterations with per-iteration errRp/errRd printed

Usage: python benchmarks/tpu_probe.py [problem_dir]
"""

import json
import os
import sys

import jax

jax.config.update("jax_enable_x64", True)
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
if jax.default_backend() in ("tpu", "axon"):
    jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from cuadmm_tpu import Problem, SDPSolver, SolverConfig
from cuadmm_tpu.ops.sparse import spmv_a, spmv_at

DEFAULT = "/root/reference/examples/SPOT/data/TXT/PushT_N=10_MOMENT"


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    backend = jax.default_backend()
    emit(probe="backend", backend=backend, dtype=dtype)

    # --- canaries -------------------------------------------------------
    rng = np.random.default_rng(0)
    n = 512
    A = rng.standard_normal((n, n)).astype(np.float32)
    ref = A.astype(np.float64) @ A.astype(np.float64)
    f_hi = jax.jit(
        lambda x: jax.lax.dot_general(
            x, x, (((1,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
        )
    )
    err_hi = float(
        np.abs(np.asarray(f_hi(jnp.asarray(A)), np.float64) - ref).max()
        / np.abs(ref).max()
    )
    with jax.default_matmul_precision("highest"):
        f_amb = jax.jit(lambda x: x @ x)
        err_amb = float(
            np.abs(np.asarray(f_amb(jnp.asarray(A)), np.float64) - ref).max()
            / np.abs(ref).max()
        )
    A64 = rng.standard_normal((128, 128))
    err64 = float(
        np.abs(np.asarray(jax.jit(lambda x: x @ x)(jnp.asarray(A64))) - A64 @ A64).max()
    )
    emit(
        probe="canaries",
        matmul_explicit_highest=err_hi,
        matmul_ambient_highest=err_amb,
        f64_matmul_abs_err=err64,
        matmul_ok=err_hi < 1e-5 and err_amb < 1e-5,
        f64_ok=err64 < 1e-10,
    )

    # --- build solver ----------------------------------------------------
    prob = Problem.from_txt(path)
    cfg = SolverConfig(
        dtype=dtype, verbose=False, check_every=1, switch_admm=0, stop_tol=0.0
    )
    solver = SDPSolver(prob, cfg)
    p = solver.params
    emit(
        probe="solver_built",
        neq_mode=p.neq.mode,
        eps_used=p.neq.eps_used,
        projection=str(solver._projection),
        con_num=prob.con_num,
        vec_len=prob.vec_len,
    )

    # --- spmv vs host -----------------------------------------------------
    Ah = solver._A_host  # normalized A, host csr
    x = rng.standard_normal(prob.vec_len)
    y = rng.standard_normal(prob.con_num)
    # state vectors live in pool coordinates
    xp = solver._to_pool(jnp.asarray(x, solver.dtype))
    ax_dev = np.asarray(spmv_a(p.sparse_a, xp), np.float64)
    ax_host = Ah @ x
    aty_dev = np.asarray(
        solver._from_pool(spmv_at(p.sparse_a, jnp.asarray(y, solver.dtype))),
        np.float64,
    )
    aty_host = Ah.T @ y
    emit(
        probe="spmv",
        ax_rel_err=float(
            np.linalg.norm(ax_dev - ax_host) / np.linalg.norm(ax_host)
        ),
        aty_rel_err=float(
            np.linalg.norm(aty_dev - aty_host) / np.linalg.norm(aty_host)
        ),
    )

    # --- normal solve on a consistent rhs --------------------------------
    hp = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    v = jnp.asarray(rng.standard_normal(prob.con_num), hp)
    from cuadmm_tpu.ops.chol import _aat_matvec

    rhs = _aat_matvec(p.neq.sparse_a, v)
    # NB: neq must be a jit *argument* -- closing over it embeds the 1.2 GB
    # factor as an HLO constant, which the axon remote-compile service
    # rejects with HTTP 413.
    with jax.default_matmul_precision("highest"):
        sol = jax.jit(lambda neq, r: neq.solve(r))(p.neq, rhs.astype(solver.dtype))
        rn = float(
            jax.jit(lambda neq, r, y: neq.residual_norm(r, y))(
                p.neq, rhs.astype(solver.dtype), sol
            )
        )
    emit(probe="normal_solve", residual_norm=rn, ok=rn < 1e-5)

    # --- single iterations -----------------------------------------------
    state = solver._initial_state(*solver._initial_scaled, float(cfg.sig))
    emit(
        probe="initial_state",
        errRp=float(state.errRp),
        errRd=float(state.errRd),
        pobj=float(state.pobj),
        dobj=float(state.dobj),
    )
    from cuadmm_tpu.solver.step import make_step

    step = make_step(
        stop_tol=0.0,
        switch_admm=cfg.switch_admm,
        sig_update_threshold=cfg.sig_update_threshold,
        sig_update_stage_1=cfg.sig_update_stage_1,
        sig_min=cfg.sig_min,
        sig_max=cfg.sig_max,
        eigh_by_bucket=None,
        mesh=None,
        eig_rank=None,
        projection=solver._projection,
    )
    with jax.default_matmul_precision("highest"):
        jstep = jax.jit(step)
        for i in range(6):
            state, info = jstep(state, p)
            jax.block_until_ready(info)
            row = np.asarray(info, np.float64)
            emit(
                probe="iter",
                i=i,
                pobj=row[0],
                dobj=row[1],
                errRp=row[2],
                errRd=row[3],
                relgap=row[4],
                sig=row[5],
                y_norm=float(jnp.linalg.norm(state.y)),
                X_norm=float(jnp.linalg.norm(state.X)),
                S_norm=float(jnp.linalg.norm(state.S)),
            )


if __name__ == "__main__":
    main()
