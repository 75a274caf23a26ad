"""On-device gates: every Pallas kernel must compile under REAL Mosaic
(not interpret mode) in the bench configuration (x64 on), plus numerics
canaries and one tiny end-to-end solve.

This is the hardware test leg the round-3 postmortem demanded: no hot-path
commit ships again without the chip seeing it. Reference counterpart: the
reference's whole test binary requires a live GPU
(/root/reference/test/tests.cpp; duo_solver_test.hpp:8-11).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_fused_spd_apply_mosaic(tpu):
    """ops/precond_apply.py compiles under Mosaic and matches M^T M r."""
    from cuadmm_tpu.ops.precond_apply import apply_padded, pad_factor

    rng = np.random.default_rng(0)
    n = 200
    L = np.tril(rng.standard_normal((n, n))).astype(np.float32)
    L += 5 * np.eye(n, dtype=np.float32)
    M = np.linalg.inv(L)
    r = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(apply_padded(pad_factor(jnp.asarray(M)), jnp.asarray(r)))
    ref = M.T @ (M @ r)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


@pytest.mark.parametrize("n", [2, 4, 8, 13])
def test_jacobi_mosaic(tpu, n):
    """ops/jacobi.py compiles under Mosaic; V diag(w) V^T reconstructs."""
    from cuadmm_tpu.ops.jacobi import jacobi_eigh_pallas

    rng = np.random.default_rng(n)
    m = rng.standard_normal((300, n, n)).astype(np.float32)
    m = m + m.transpose(0, 2, 1)
    w, v = jacobi_eigh_pallas(jnp.asarray(m))
    recon = np.einsum(
        "bij,bj,bkj->bik", np.asarray(v), np.asarray(w), np.asarray(v)
    )
    assert np.linalg.norm(recon - m) / np.linalg.norm(m) < 1e-4


def test_pallas_gate_reports_ok(tpu):
    """The compile gate passes for both kernels on this chip."""
    from cuadmm_tpu.ops import pallas_gate, precond_apply
    from cuadmm_tpu.ops.jacobi import _probe_pallas

    assert pallas_gate.ok("fused_spd_apply", precond_apply.probe)
    assert pallas_gate.ok("jacobi_eigh_pallas", _probe_pallas)


def test_packed_tri_solve_mosaic(tpu):
    """ops/tri_stream.py streaming solves compile under Mosaic (x64 on)
    and solve a 3-block system to f32 accuracy."""
    import scipy.sparse as sp

    from cuadmm_tpu.ops.tri_stream import (
        make_layout,
        packed_cholesky,
        packed_solve,
        probe,
        scatter_packed_aat,
    )

    probe()  # hand-built 2-block factor through both kernels

    rng = np.random.default_rng(0)
    n = 300
    A = sp.random(n, 2 * n, density=0.05, random_state=1, format="csr")
    aat = (A @ A.T).tocsr()
    dm = float(aat.diagonal().mean())
    lay = make_layout(n, 128)
    coo = aat.tocoo()
    tiles = scatter_packed_aat(
        coo.row.astype(np.int64), coo.col.astype(np.int64), coo.data,
        lay, 1e-5, dm, jnp.float32,
    )
    fac = packed_cholesky(tiles, lay)
    r = rng.standard_normal(n).astype(np.float32)
    y = packed_solve(fac, jnp.asarray(r), lay)
    ref = np.linalg.solve(
        np.asarray(aat.todense()) + 1e-5 * max(dm, 1.0) * np.eye(n), r
    )
    assert np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref) < 1e-4


def test_matmul_precision_canary(tpu):
    """HIGHEST-precision f32 GEMM must be ~1e-7 accurate (6-pass bf16);
    a regression here silently poisons the factor + projection."""
    rng = np.random.default_rng(0)
    a64 = rng.standard_normal((256, 256))
    a = jnp.asarray(a64, jnp.float32)
    ref = a64 @ a64.T
    hi = jax.jit(
        lambda x: jax.lax.dot_general(
            x, x, (((1,), (1,)), ((), ())), precision="highest"
        )
    )(a)
    rel = np.linalg.norm(np.asarray(hi, np.float64) - ref) / np.linalg.norm(ref)
    assert rel < 1e-6


@pytest.mark.slow
def test_tiny_e2e_solve(tpu):
    """truss5 converges on-chip with the objective matching the reference
    (reference: examples/dimacs logs, pobj 132.6356895)."""
    from cuadmm_tpu import Problem, SDPSolver, SolverConfig

    prob = Problem.from_txt("/root/reference/examples/dimacs/data/TXT/truss5")
    cfg = SolverConfig(dtype="float32", verbose=False, stop_tol=1e-3, check_every=200)
    solver = SDPSolver(prob, cfg)
    res = solver.solve(max_iter=40_000)
    assert res.converged
    assert abs(res.pobj - 132.6356895) / (1 + 132.6356895) < 5e-3


def test_band_solve_mosaic(tpu):
    """Band streaming solves compile under Mosaic (x64 on) and a full
    scatter -> band_cholesky -> band_solve pipeline reaches f32
    refinement-grade accuracy (round-5 banded mode, ops/tri_stream.py)."""
    import scipy.sparse as sp

    from cuadmm_tpu.ops.tri_stream import (
        band_cholesky,
        band_solve,
        make_band_layout,
        probe_band,
        scatter_band_aat,
    )

    probe_band()  # hand-built banded factor through both kernels

    rng = np.random.default_rng(2)
    n = 600
    rows = np.repeat(np.arange(n), 3)
    cols = np.clip(rows + rng.integers(-40, 41, size=len(rows)), 0, n - 1)
    A = sp.csr_matrix(
        (rng.standard_normal(len(rows)), (rows, cols)), shape=(n, n)
    )
    aat = (A @ A.T).tocoo()
    bw = int(np.abs(aat.row - aat.col).max())
    lay = make_band_layout(n, bw, block=128)
    dm = float((A @ A.T).diagonal().mean())
    tiles = scatter_band_aat(
        aat.row.astype(np.int64), aat.col.astype(np.int64), aat.data,
        lay, 1e-5, dm, jnp.float32,
    )
    tiles = band_cholesky(tiles, lay)
    r = rng.standard_normal(n)
    y = np.asarray(band_solve(tiles, jnp.asarray(r, jnp.float32), lay))
    dense = (A @ A.T).todense() + 1e-5 * max(dm, 1.0) * np.eye(n)
    ref = np.linalg.solve(dense, r)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-2
