"""Benchmark driver: steady-state sGS-ADMM iteration rate on PushT N=10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference cuADMM solves SPOT PushT_N=10_MOMENT at
0.0163 s/iteration (61.35 it/s) on its (unstated) GPU
(reference: examples/benchmarks/PushT_N=10_MOMENT/cuADMM.log tail).
The problem: 17150 constraints, 6015 PSD blocks of sizes 1..13,
vec_len 22825 -- the bucketed batched-eigh profile.

Env knobs:
  BENCH_DTYPE=float64|float32   (default: float32 on TPU -- the TPU-native
                                 configuration per ARCHITECTURE.md's
                                 precision strategy (f32 iteration + full-f32
                                 matmuls + iterative refinement; KKT
                                 residuals self-certify the accuracy) --
                                 float64 elsewhere for reference parity)
  BENCH_ITERS=N                 (timed iterations, default 600)
  BENCH_PROBLEM=path            (default PushT N=10)
"""

import json
import os
import sys
import time

import jax

_dtype_env = os.environ.get("BENCH_DTYPE")
if _dtype_env is None:
    _dtype_env = "float32" if jax.default_backend() == "tpu" else "float64"
    os.environ["BENCH_DTYPE"] = _dtype_env
if _dtype_env == "float64":
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the remote-compile service behind the TPU
# tunnel takes minutes for the solver's scanned iteration program; cached
# executables load in seconds.
_CACHE_DIR = os.environ.get(
    "BENCH_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from cuadmm_tpu import Problem, SDPSolver, SolverConfig

BASELINE_ITERS_PER_SEC = 61.35  # reference cuADMM on PushT N=10 (0.0163 s/it)
DEFAULT_PROBLEM = "/root/reference/examples/SPOT/data/TXT/PushT_N=10_MOMENT"


def main() -> None:
    dtype = os.environ.get("BENCH_DTYPE", "float64")
    iters = int(os.environ.get("BENCH_ITERS", "600"))
    path = os.environ.get("BENCH_PROBLEM", DEFAULT_PROBLEM)

    prob = Problem.from_txt(path)
    cfg = SolverConfig(
        dtype=dtype,
        verbose=False,
        check_every=100,
        # Keep the solver in its sGS phase for the whole measurement and
        # disable early exit so we time steady-state iterations.
        switch_admm=10**9,
        stop_tol=0.0,
    )
    solver = SDPSolver(prob, cfg)

    # Warmup: compile + a few chunks.
    t0 = time.perf_counter()
    solver.solve(max_iter=100, stop_tol=0.0)
    warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = solver.solve(max_iter=iters, stop_tol=0.0)
    elapsed = time.perf_counter() - t0
    its = res.iterations / elapsed

    # Sanity: residuals must be finite and shrinking-ish.
    ok = np.isfinite(res.errRp) and np.isfinite(res.errRd) and np.isfinite(res.relgap)

    print(
        json.dumps(
            {
                "metric": "pusht_n10_iters_per_sec",
                "value": round(its, 3),
                "unit": "iter/s",
                "vs_baseline": round(its / BASELINE_ITERS_PER_SEC, 4),
                "dtype": dtype,
                "iters_timed": res.iterations,
                "warmup_s": round(warm, 2),
                "errRp": float(res.errRp),
                "errRd": float(res.errRd),
                "finite": bool(ok),
            }
        )
    )


if __name__ == "__main__":
    main()
