"""Per-stage wall-clock breakdown of one ADMM iteration on the live chip.

Times each stage of the iteration (normal solve, poly projection, sparse
matvecs, residual norms) by running it N times inside a jitted fori_loop
(amortizes dispatch; the carried dependency defeats hoisting) and compares
against the full-step rate from bench.py. The counterpart of the
reference's per-stage cudaEvent pairs (reference: src/solver.cu:435-466).

Usage: python benchmarks/tpu_stage_timing.py [problem_dir] [reps]
"""

import json
import os
import sys
import time

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
from cuadmm_tpu.ops.projection import psd_project_pool
from cuadmm_tpu.ops.sparse import spmv_a, spmv_at

DEFAULT = "/root/reference/examples/SPOT/data/TXT/PushT_N=10_MOMENT"


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, *args, reps_outer=3):
    out = jax.block_until_ready(fn(*args))  # compile
    best = np.inf
    for _ in range(reps_outer):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    cfg = SolverConfig(
        dtype=dtype, verbose=False, normal_solver="precond",
        projection="poly", pack_to=128, switch_admm=0, stop_tol=0.0,
    )
    prob = Problem.from_txt(path)
    solver = SDPSolver(prob, cfg)
    p = solver.params
    state = solver._initial_state(*solver._initial_scaled, float(cfg.sig))
    emit(backend=jax.default_backend(), reps=reps,
         neq_mode=p.neq.mode, applies=p.neq.applies)

    rhs0 = np.asarray(state.Rp, np.float64)
    rhs = jnp.asarray(rhs0, solver.dtype)
    xb = state.X

    def loop(body, x0):
        @jax.jit
        def run(x, params):
            with jax.default_matmul_precision("highest"):
                return jax.lax.fori_loop(
                    0, reps, lambda i, c: body(c, params), x0
                )
        return run

    # 1. normal solve (2 refinement sweeps: 1 cho_solve + 2 hp spmv each)
    t, _ = timed(loop(lambda y, pp: pp.neq.solve(rhs + 1e-12 * y, warm=y), rhs), rhs, p)
    emit(stage="neq_solve", ms_per=1e3 * t / reps)

    # 1b. factor application alone (cho_solve, no refinement spmvs)
    if p.neq.chol_l is not None:
        t, _ = timed(
            loop(lambda y, pp: pp.neq._apply_factor(rhs + 1e-12 * y), rhs), rhs, p
        )
        emit(stage="cho_solve_only", ms_per=1e3 * t / reps)

    # 2. PSD projection (poly, packed pool)
    t, _ = timed(
        loop(
            lambda x, pp: psd_project_pool(
                xb + 1e-12 * x, pp.maps, None, method="poly"
            ),
            xb,
        ),
        xb,
        p,
    )
    emit(stage="proj_poly", ms_per=1e3 * t / reps)

    # 2b. eigh projection for comparison
    t, _ = timed(
        loop(
            lambda x, pp: psd_project_pool(
                xb + 1e-12 * x, pp.maps, None, method="eigh"
            ),
            xb,
        ),
        xb,
        p,
    )
    emit(stage="proj_eigh", ms_per=1e3 * t / reps)

    # 3. sparse matvecs (state dtype)
    t, _ = timed(
        loop(lambda v, pp: spmv_a(pp.sparse_a, spmv_at(pp.sparse_a, v)), rhs), rhs, p
    )
    emit(stage="spmv_pair", ms_per=1e3 * t / reps)

    # 3a. compact composed normal-equation operator
    from cuadmm_tpu.ops.sparse import aat_matvec

    t, _ = timed(
        loop(lambda v, pp: aat_matvec(pp.neq.sparse_a, v), rhs), rhs, p
    )
    emit(stage="aat_compact", ms_per=1e3 * t / reps)

    # 3b. sparse matvecs in the high-precision dtype (f64 emulation cost)
    rhs_hp = jnp.asarray(rhs0, jnp.float64)
    t, _ = timed(
        loop(
            lambda v, pp: spmv_a(pp.neq.sparse_a, spmv_at(pp.neq.sparse_a, v)), rhs_hp
        ),
        rhs_hp,
        p,
    )
    emit(stage="spmv_pair_f64", ms_per=1e3 * t / reps)

    # 4. residual norms + objectives (step 5 of the iteration)
    def norms_body(x, pp):
        Rp = pp.b - spmv_a(pp.sparse_a, x[: pp.b.shape[0]] * 0 + rhs)
        errRp = jnp.linalg.norm(pp.normA * Rp) * pp.bscale / pp.norm_borg
        return x + 1e-12 * errRp

    t, _ = timed(loop(norms_body, xb), xb, p)
    emit(stage="residual_norms", ms_per=1e3 * t / reps)

    # 5. full step chunk for reference
    from cuadmm_tpu.solver.step import make_chunk_runner, make_step

    step = make_step(
        stop_tol=0.0, switch_admm=0, sig_update_threshold=0,
        sig_update_stage_1=50, sig_min=1e-3, sig_max=1e3,
        projection="poly",
    )
    runner = make_chunk_runner(step, reps)
    t0 = time.perf_counter()
    state2, info = runner(state, p)
    jax.block_until_ready(info)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state3, info = runner(state2, p)
    jax.block_until_ready(info)
    t = time.perf_counter() - t0
    emit(stage="full_step", ms_per=1e3 * t / reps, compile_s=round(compile_s, 1))


if __name__ == "__main__":
    main()
