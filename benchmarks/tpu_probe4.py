"""Drill into the packed-bucket norm-equalization path on the real Xb.

First run with --cpu --save to produce /tmp/xb.npy, then run on TPU to
compare every intermediate of psd_project_pool's packed path.
"""

import json
import os
import sys

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
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
from cuadmm_tpu.ops.polyfilter import SIGN_SCHEDULE_F32, _bmm, spectral_scale
from cuadmm_tpu.ops.sparse import spmv_a, spmv_at

DEFAULT = "/root/reference/examples/SPOT/data/TXT/PushT_N=10_MOMENT"
XB_PATH = "/tmp/xb.npy"


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    save = "--save" in sys.argv
    if save:
        sys.argv.remove("--save")
    path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT
    prob = Problem.from_txt(path)
    cfg = SolverConfig(
        dtype="float32", verbose=False, normal_solver="precond",
        projection="poly", pack_to=128, switch_admm=0, stop_tol=0.0,
    )
    solver = SDPSolver(prob, cfg)
    p = solver.params
    emit(backend=jax.default_backend())

    if save or not os.path.exists(XB_PATH):
        state = solver._initial_state(*solver._initial_scaled, float(cfg.sig))

        @jax.jit
        def make_xb(state, params):
            with jax.default_matmul_precision("highest"):
                sa = params.sparse_a
                rhsy = state.Rp / state.sig - spmv_a(sa, state.SmC)
                y_half = params.neq.solve(rhsy, warm=state.y)
                Rd1 = spmv_at(sa, y_half) - params.C
                return state.X + state.sig * Rd1

        Xb = make_xb(state, p)
        np.save(XB_PATH, np.asarray(Xb))
        emit(saved=XB_PATH)

    Xb = jnp.asarray(np.load(XB_PATH))

    bm = p.maps["buckets"][1]  # the packed n=128 bucket
    count, n, base = bm["count"].value, bm["n"].value, bm["base"].value
    seg = Xb[base : base + count * n * n]
    bt0 = seg.reshape(count, n, n)
    gid = bm["diag_group"]
    G = bm["n_groups"].value

    @jax.jit
    def internals(bt):
        with jax.default_matmul_precision("highest"):
            rowsq = jnp.sum(bt * bt, axis=-1).reshape(-1)
            sums = jax.ops.segment_sum(
                rowsq, gid.reshape(-1), num_segments=G + 1, indices_are_sorted=False
            )
            norms = jnp.sqrt(sums)
            ok = norms > jnp.finfo(bt.dtype).tiny * 16
            s_blk = jnp.where(ok, 1.0 / jnp.where(ok, norms, 1.0), 1.0)
            s_row = s_blk[gid]
            bts = bt * s_row[:, :, None]
            s = spectral_scale(bts)[..., None, None]
            y = bts / s
            eye = jnp.eye(n, dtype=bt.dtype)
            maxes = []
            for a, b, c in SIGN_SCHEDULE_F32:
                a2 = _bmm(y, y)
                poly = a * eye + b * a2 + c * _bmm(a2, a2)
                y = _bmm(y, poly)
                y = 0.5 * (y + jnp.swapaxes(y, -1, -2))
                maxes.append(jnp.max(jnp.abs(y)))
            z = y
            pr = y0_plus = bts / s
            pp = y0_plus + _bmm(z, y0_plus)
            pp = 0.5 * (pp + jnp.swapaxes(pp, -1, -2))
            proj = 0.5 * s * pp
            u_blk = jnp.where(ok, norms, 1.0)
            proj_unscaled = proj * u_blk[gid][:, :, None]
            return (
                jnp.min(sums), jnp.max(sums),
                jnp.min(jnp.where(ok[:G], norms[:G], jnp.inf)),
                jnp.max(norms), jnp.sum(~ok[:G]),
                jnp.max(jnp.abs(bts)), jnp.min(s), jnp.max(s),
                jnp.stack(maxes),
                jnp.max(jnp.abs(proj)), jnp.max(jnp.abs(proj_unscaled)),
                jnp.linalg.norm(proj_unscaled.astype(jnp.float64)),
            )

    (smin, smax, nmin, nmax, nbad, btmax, ssmin, ssmax, maxes, pmax,
     pumax, pnorm) = internals(bt0)
    emit(
        sums_min=float(smin), sums_max=float(smax),
        norms_min_ok=float(nmin), norms_max=float(nmax),
        groups_not_ok=int(nbad),
        bts_max=float(btmax),
        spectral_scale_min=float(ssmin), spectral_scale_max=float(ssmax),
        sign_step_max=[float(x) for x in np.asarray(maxes)],
        proj_max=float(pmax), proj_unscaled_max=float(pumax),
        proj_norm=float(pnorm),
    )


if __name__ == "__main__":
    main()
