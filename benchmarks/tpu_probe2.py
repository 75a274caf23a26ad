"""Isolate the poly projection divergence on TPU.

Runs psd_project_poly on random symmetric f32 batches shaped like the
PushT N=10 packed pool (B x 128 x 128) and prints the max |y| after each
sign-filter step, plus the final projection error vs an f64 eigh
reference computed on the host.
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

from cuadmm_tpu.ops.polyfilter import (
    SIGN_SCHEDULE_F32,
    _bmm,
    psd_project_poly,
    spectral_scale,
)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    rng = np.random.default_rng(1)
    B, n = 64, 128
    M = rng.standard_normal((B, n, n)).astype(np.float32)
    M = 0.5 * (M + np.transpose(M, (0, 2, 1)))
    Mj = jnp.asarray(M)

    # Reference projection in f64 on host.
    w, v = np.linalg.eigh(M.astype(np.float64))
    ref = np.einsum("bij,bj,bkj->bik", v, np.maximum(w, 0), v)

    # Step-by-step sign filter with max-abs tracking.
    @jax.jit
    def stepwise(mats):
        s = spectral_scale(mats)[..., None, None]
        y = mats / s
        eye = jnp.eye(n, dtype=mats.dtype)
        maxes = []
        for a, b, c in SIGN_SCHEDULE_F32:
            a2 = _bmm(y, y)
            poly = a * eye + b * a2 + (c * _bmm(a2, a2) if c != 0.0 else 0.0)
            y = _bmm(y, poly)
            y = 0.5 * (y + jnp.swapaxes(y, -1, -2))
            maxes.append(jnp.max(jnp.abs(y)))
        return jnp.stack(maxes)

    maxes = np.asarray(stepwise(Mj))
    emit(probe="sign_step_max_abs", values=[float(x) for x in maxes])

    proj = np.asarray(jax.jit(psd_project_poly)(Mj), np.float64)
    err = np.abs(proj - ref).max() / max(np.abs(ref).max(), 1e-30)
    emit(probe="poly_projection", rel_err=float(err), ok=bool(err < 1e-2))

    # Same but with a *near-PSD* input (what the solver sees later).
    P = np.einsum("bij,bj,bkj->bik", v, np.abs(w), v).astype(np.float32)
    Pj = jnp.asarray(P)
    maxes2 = np.asarray(stepwise(Pj))
    emit(probe="sign_step_max_abs_psd_input", values=[float(x) for x in maxes2])

    # Degenerate spectra: tiny + huge eigenvalue spread like moment SDPs.
    scale = np.exp(rng.uniform(-8, 3, size=(B, n))).astype(np.float32)
    D = np.einsum("bij,bj,bkj->bik", v.astype(np.float32), scale * np.sign(w).astype(np.float32), v.astype(np.float32))
    D = 0.5 * (D + np.transpose(D, (0, 2, 1)))
    w2, v2 = np.linalg.eigh(D.astype(np.float64))
    ref2 = np.einsum("bij,bj,bkj->bik", v2, np.maximum(w2, 0), v2)
    maxes3 = np.asarray(stepwise(jnp.asarray(D)))
    emit(probe="sign_step_max_abs_spread", values=[float(x) for x in maxes3])
    proj2 = np.asarray(jax.jit(psd_project_poly)(jnp.asarray(D)), np.float64)
    err2 = np.abs(proj2 - ref2).max() / max(np.abs(ref2).max(), 1e-30)
    emit(probe="poly_projection_spread", rel_err=float(err2), ok=bool(err2 < 1e-2))


if __name__ == "__main__":
    main()
