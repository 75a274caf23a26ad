"""Batched cyclic-Jacobi symmetric eigendecomposition.

TPU-native analog of cuSOLVER's DsyevjBatched (reference:
include/cuadmm/cusolver.h:102-171 -- batched Jacobi, tol 1e-6, <=15
sweeps), used for the solver's small-block buckets where XLA's QDWH eigh
pays big per-matrix overheads.

Layout: the batch lives in the *lane* (last, 128-wide) dimension, so every
rotation update is a dense VPU op across 128 matrices at once; the n x n
matrix extent maps to sublanes. A (B, n, n) bucket is transposed to
(n, n, B), tiled along B, rotated in VMEM, and transposed back.

Two implementations with identical math:
- ``jacobi_eigh_jnp``: pure jnp (any backend; used for tests/fallback)
- ``jacobi_eigh_pallas``: Pallas TPU kernel

Eigenvalues are NOT sorted (the PSD projection does not need ordering;
``jnp.linalg.eigh`` sorts, so tests compare against sorted outputs).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def default_sweeps(n: int) -> int:
    """Sweep counts sized for ~1e-6 off-diagonal reduction (cf. the
    reference's syevj tol 1e-6 / max 15 sweeps, cusolver.h:112-114)."""
    if n <= 4:
        return 6
    if n <= 8:
        return 8
    if n <= 16:
        return 10
    return 12


def _pair_schedule(n: int) -> np.ndarray:
    """Cyclic-by-rows pivot order: all (p, q), p < q."""
    return np.array([(p, q) for p in range(n) for q in range(p + 1, n)], dtype=np.int32)


def _rotation(app, aqq, apq, eps):
    """Jacobi rotation (c, s) zeroing a_pq; c=1, s=0 when already zero.

    All literals fed to jnp.where must be dtype-matched scalars: under x64
    a bare Python float becomes a concrete f64 scalar inside the traced
    kernel, and Mosaic cannot lay out 64-bit values (round-3-class crash:
    layout.h bitwidth<=32 check)."""
    one = jnp.asarray(1.0, app.dtype)
    zero = jnp.asarray(0.0, app.dtype)
    safe = jnp.abs(apq) > eps
    denom = jnp.where(safe, 2.0 * apq, one)
    theta = (aqq - app) / denom
    t = jnp.sign(theta) / (jnp.abs(theta) + jnp.sqrt(1.0 + theta * theta))
    t = jnp.where(theta == 0.0, one, t)  # theta=0 -> 45-degree rotation
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    return jnp.where(safe, c, one), jnp.where(safe, s, zero)


def _rotate_ref(a, v, p, q, eps):
    """One Jacobi rotation applied in batch-last layout.

    ``a``/``v`` support __getitem__/__setitem__ on (n, n, B)-shaped data
    (works for both jnp .at[] wrappers and Pallas refs)."""
    row_p = a[p, :, :]
    row_q = a[q, :, :]
    app = row_p[p, :]
    aqq = row_q[q, :]
    apq = row_p[q, :]
    c, s = _rotation(app, aqq, apq, eps)

    a[p, :, :] = c * row_p - s * row_q
    a[q, :, :] = s * row_p + c * row_q
    col_p = a[:, p, :]
    col_q = a[:, q, :]
    a[:, p, :] = c * col_p - s * col_q
    a[:, q, :] = s * col_p + c * col_q

    vrow_p = v[p, :, :]
    vrow_q = v[q, :, :]
    v[p, :, :] = c * vrow_p - s * vrow_q
    v[q, :, :] = s * vrow_p + c * vrow_q


class _AtWrapper:
    """Mutable-view adapter so the same rotation code drives jnp arrays."""

    def __init__(self, arr):
        self.arr = arr

    def __getitem__(self, idx):
        return self.arr[idx]

    def __setitem__(self, idx, val):
        self.arr = self.arr.at[idx].set(val)


# ----------------------------------------------------------------------
# Pure-jnp implementation.
# ----------------------------------------------------------------------


def jacobi_eigh_jnp(
    mats: jax.Array, sweeps: Optional[int] = None
) -> Tuple[jax.Array, jax.Array]:
    """Batched Jacobi eigh, pure jnp. mats: (B, n, n) symmetric.

    Returns (w (B, n) unsorted, v (B, n, n)) with mats @ v ~= v * w
    (columns of v are eigenvectors, jnp.linalg.eigh convention)."""
    b, n, _ = mats.shape
    if n == 1:
        return mats[:, :, 0], jnp.ones_like(mats)
    sweeps = default_sweeps(n) if sweeps is None else sweeps
    eps = 1e-30 if mats.dtype == jnp.float64 else 1e-18
    pairs = jnp.asarray(_pair_schedule(n))

    a0 = jnp.transpose(mats, (1, 2, 0))  # (n, n, B)
    v0 = jnp.broadcast_to(jnp.eye(n, dtype=mats.dtype)[:, :, None], (n, n, b))

    def body(step, carry):
        a, v = carry
        pair = step % pairs.shape[0]
        aw, vw = _AtWrapper(a), _AtWrapper(v)
        _rotate_ref(aw, vw, pairs[pair, 0], pairs[pair, 1], eps)
        return aw.arr, vw.arr

    a, v = jax.lax.fori_loop(0, sweeps * pairs.shape[0], body, (a0, v0))
    w = jnp.diagonal(a, axis1=0, axis2=1)  # (B, n)
    # Rows of v (in batch-last layout) are eigenvectors; convert to
    # batch-first with eigenvectors in columns: v_out[b, :, i] = eigvec i.
    v_out = jnp.transpose(v, (2, 1, 0))
    return w, v_out


# ----------------------------------------------------------------------
# Pallas TPU kernel.
# ----------------------------------------------------------------------


def _jacobi_kernel(a_in, v_ref, w_ref, a_s, *, n, pairs, sweeps, eps):
    # Pairs are static (python ints): one sweep is fully unrolled with
    # static indices (Mosaic has no dynamic_slice on values), the sweep
    # loop stays a fori_loop to bound program size.
    a_s[:, :, :] = a_in[:, :, :]
    # Identity via explicit int32 iota + dtype-matched literals: under x64
    # jnp.eye's arange is int64 and bare float literals are f64 -- both
    # are >32-bit values Mosaic cannot lay out (bitwidth<=32 check).
    row = jax.lax.broadcasted_iota(jnp.int32, v_ref.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, v_ref.shape, 1)
    dt = v_ref.dtype
    v_ref[:, :, :] = jnp.where(
        row == col, jnp.asarray(1.0, dt), jnp.asarray(0.0, dt)
    )

    def one_sweep(_, carry):
        for p, q in pairs:
            _rotate_ref(a_s, v_ref, p, q, eps)
        return carry

    # Carry AND bounds must be explicitly int32: under x64 bare Python ints
    # become int64 loop counters/carries that Mosaic cannot legalize
    # (round-3 bench crash; the i64 counter trips layout.h bitwidth<=32).
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(sweeps), one_sweep, jnp.int32(0))

    for i in range(n):
        w_ref[i, :] = a_s[i, i, :]


@functools.partial(jax.jit, static_argnames=("sweeps", "batch_tile", "interpret"))
def jacobi_eigh_pallas(
    mats: jax.Array,
    sweeps: Optional[int] = None,
    batch_tile: int = 128,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Batched Jacobi eigh via Pallas. mats: (B, n, n) symmetric.

    Returns (w (B, n) unsorted, v (B, n, n)) with mats ~= v diag(w) v^T.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = mats.shape
    if n == 1:
        return mats[:, :, 0], jnp.ones_like(mats)
    sweeps_ = default_sweeps(n) if sweeps is None else sweeps
    eps = 1e-30 if mats.dtype == jnp.float64 else 1e-18
    pairs = tuple((int(p), int(q)) for p, q in _pair_schedule(n))

    b_pad = -(-b // batch_tile) * batch_tile
    a = jnp.transpose(mats, (1, 2, 0))  # (n, n, B)
    if b_pad != b:
        a = jnp.pad(a, ((0, 0), (0, 0), (0, b_pad - b)))

    kernel = functools.partial(
        _jacobi_kernel, n=n, pairs=pairs, sweeps=sweeps_, eps=eps
    )
    # Index-map literals must be int32-typed: under x64 a bare Python 0 in
    # the returned tuple is promoted to int64 and Mosaic fails to legalize
    # the mixed (i32, i64) return (round-3 bench crash). A numpy scalar,
    # NOT a jax Array: index maps may not capture traced constants.
    zero = np.int32(0)
    v_t, w_t = pl.pallas_call(
        kernel,
        grid=(b_pad // batch_tile,),
        in_specs=[
            pl.BlockSpec((n, n, batch_tile), lambda i: (zero, zero, i)),
        ],
        out_specs=[
            pl.BlockSpec((n, n, batch_tile), lambda i: (zero, zero, i)),
            pl.BlockSpec((n, batch_tile), lambda i: (zero, i)),
        ],
        scratch_shapes=[pltpu.VMEM((n, n, batch_tile), mats.dtype)],
        out_shape=[
            jax.ShapeDtypeStruct((n, n, b_pad), mats.dtype),
            jax.ShapeDtypeStruct((n, b_pad), mats.dtype),
        ],
        interpret=interpret,
    )(a)
    w = jnp.transpose(w_t, (1, 0))[:b]
    v = jnp.transpose(v_t, (2, 1, 0))[:b]
    return w, v


def _probe_pallas() -> None:
    """Tiny real (non-interpret) compile+run on the live backend.
    Input must be explicitly f32 (under x64, arange/literals are f64 and
    the kernel itself would rightly reject 64-bit types)."""
    m = np.stack([np.eye(3, dtype=np.float32) * s for s in (1.0, 2.0)])
    w, v = jacobi_eigh_pallas(jnp.asarray(m, jnp.float32), batch_tile=8)
    jax.block_until_ready((w, v))


def jacobi_eigh(mats: jax.Array, sweeps: Optional[int] = None):
    """Backend dispatch: Pallas on TPU (when the on-device compile probe
    passes — see ops/pallas_gate.py), jnp elsewhere."""
    from cuadmm_tpu.ops import pallas_gate

    if (
        mats.shape[0]
        and mats.dtype == jnp.float32  # Mosaic rejects 64-bit types
        and jax.default_backend() in ("tpu", "axon")
        and pallas_gate.ok("jacobi_eigh_pallas", _probe_pallas)
    ):
        return jacobi_eigh_pallas(mats, sweeps=sweeps)
    return jacobi_eigh_jnp(mats, sweeps=sweeps)
