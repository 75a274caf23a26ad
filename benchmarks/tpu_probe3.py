"""Step-internals comparison: first-iteration intermediates, TPU vs CPU.

Run once per platform:
    python benchmarks/tpu_probe3.py                 # default backend (TPU)
    JAX_PLATFORMS=cpu python benchmarks/tpu_probe3.py

Prints the norms of every intermediate of iteration 1 so the two runs can
be diffed line by line. Forces the exact TPU bench config on both
platforms: float32 state, normal_solver='precond', projection='poly',
pack_to=128.
"""

import json
import os
import sys

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    # The axon sitecustomize pins jax_platforms at interpreter startup;
    # env JAX_PLATFORMS=cpu is ignored. Override post-import instead.
    jax.config.update("jax_platforms", "cpu")
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


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT
    prob = Problem.from_txt(path)
    cfg = SolverConfig(
        dtype="float32",
        verbose=False,
        normal_solver="precond",
        projection="poly",
        pack_to=128,
        switch_admm=0,
        stop_tol=0.0,
    )
    solver = SDPSolver(prob, cfg)
    p = solver.params
    emit(
        backend=jax.default_backend(),
        neq_mode=p.neq.mode,
        eps_used=p.neq.eps_used,
        projection=str(solver._projection),
        pool_len=solver.structure.pool_len,
        buckets=[(b.n, b.count) for b in solver.structure.buckets],
    )

    state = solver._initial_state(*solver._initial_scaled, float(cfg.sig))

    def nrm(x):
        return float(jnp.linalg.norm(x.astype(jnp.float64)))

    @jax.jit
    def first_iter(state, params):
        sa = params.sparse_a
        sig = state.sig
        with jax.default_matmul_precision("highest"):
            rhsy = state.Rp / sig - spmv_a(sa, state.SmC)
            y_half = params.neq.solve(rhsy, warm=state.y)
            resid = params.neq.residual_norm(rhsy, y_half)
            Aty = spmv_at(sa, y_half)
            Rd1 = Aty - params.C
            Xb = state.X + sig * Rd1
            Xproj = psd_project_pool(
                Xb, params.maps, None, mesh=None, eig_rank=None, method="poly"
            )
            S = (Xproj - state.X) / sig - Rd1
        return rhsy, y_half, resid, Aty, Rd1, Xb, Xproj, S

    rhsy, y_half, resid, Aty, Rd1, Xb, Xproj, S = first_iter(state, p)
    emit(
        rhsy=nrm(rhsy),
        y_half=nrm(y_half),
        neq_resid=float(resid),
        Aty=nrm(Aty),
        Rd1=nrm(Rd1),
        Xb=nrm(Xb),
        Xb_max=float(jnp.max(jnp.abs(Xb))),
        Xproj=nrm(Xproj),
        Xproj_max=float(jnp.max(jnp.abs(Xproj))),
        S=nrm(S),
    )

    # Re-project the same Xb with eigh for a platform-internal cross-check.
    @jax.jit
    def proj_eigh(Xb, params):
        with jax.default_matmul_precision("highest"):
            return psd_project_pool(
                Xb, params.maps, None, mesh=None, eig_rank=None, method="eigh"
            )

    Xp2 = proj_eigh(Xb, p)
    emit(
        Xproj_eigh=nrm(Xp2),
        poly_vs_eigh_rel=float(
            jnp.linalg.norm((Xproj - Xp2).astype(jnp.float64))
            / (jnp.linalg.norm(Xp2.astype(jnp.float64)) + 1e-30)
        ),
    )


if __name__ == "__main__":
    main()
