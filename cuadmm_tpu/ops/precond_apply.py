"""Fused preconditioner application  y = L^{-T} (L^{-1} r)  in one HBM pass.

The ``precond`` normal-equation solver applies its explicitly-inverted
Cholesky factor twice per refinement sweep (ops/chol.py:_apply_factor).
As two XLA matvecs that reads the n x n factor from HBM twice --
2 * n^2 * 4 bytes, the dominant HBM traffic of the whole ADMM iteration
at PushT scale (n = 17150: 2.36 GB/sweep vs ~0.05 GB for everything
else). The reference has no analog: its CHOLMOD factor lives in host RAM
and the rhs crosses PCIe twice per iteration instead
(reference: include/cuadmm/cholesky_cpu.h:120-141, src/solver.cu:487-500).

This Pallas kernel streams the factor ONCE: for each row-block
B of M = inv(L),

    t_i = M[i, :] @ r          (the block's rows are resident in VMEM)
    y  += M[i, :]^T @ t_i      (same resident block, transposed use)

so each tile is read from HBM exactly once per solve application. All
arithmetic is f32 on the VPU (elementwise multiply + cross-lane reduce):
no bf16 MXU passes are involved, so the result is at least as accurate as
the HIGHEST-precision dot_general pair it replaces.

The row-block height is chosen per n_pad so that two in-flight factor
tiles plus the r/acc/y rows stay under a ~10 MB VMEM budget (the chip has
~16 MB/core; ADVICE r3: a fixed 64-row block at n_pad=32768 is 8.4 MB per
tile and double-buffering overflows). n is padded to a lane multiple
(128) with zeros, which is exact (zero rows/cols contribute nothing).

NB (round-3 postmortem): every value the index maps return must be int32.
Under x64 mode (which bench.py enables for f64 residual refinement) a bare
Python literal in the index-map tuple is promoted to int64, and Mosaic
cannot legalize the resulting mixed `(i32, i64)` func.return — the whole
kernel fails to compile on real hardware while interpret-mode tests pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_VMEM_BUDGET = 10 * 1024 * 1024  # bytes for the two in-flight factor tiles


def _row_block(n_pad: int) -> int:
    """Largest power-of-two row-block (8..128, so it always divides the
    lane-padded n_pad) keeping 2 in-flight tiles under the VMEM budget."""
    blk = 128
    while blk > 8 and 2 * blk * n_pad * 4 > _VMEM_BUDGET:
        blk //= 2
    return blk


# int32-typed literal for index maps (see module docstring). Must be a
# numpy scalar, NOT a jax Array: index maps may not capture traced constants.
_I0 = np.int32(0)


def _kernel(m_ref, r_ref, y_ref, acc_ref):
    i = pl.program_id(0)
    blk = m_ref[...]  # (B, n_pad) rows of inv(L)
    r = r_ref[...]  # (1, n_pad)
    t = jnp.sum(blk * r, axis=1, keepdims=True)  # (B, 1) = blk @ r
    part = jnp.sum(blk * t, axis=0, keepdims=True)  # (1, n_pad) = blk^T t

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(i > 0)
    def _acc():
        acc_ref[...] += part

    @pl.when(i == pl.num_programs(0) - 1)
    def _out():
        y_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_spd_apply(m: jax.Array, r: jax.Array, interpret: bool = False) -> jax.Array:
    """y = m^T (m r) for square m (n_pad, n_pad), r (n_pad,); one HBM pass
    over ``m``. ``n_pad`` must be a multiple of 128 (see ``pad_factor``)."""
    n_pad = m.shape[0]
    assert m.shape == (n_pad, n_pad) and n_pad % _LANE == 0
    block = _row_block(n_pad)
    grid = n_pad // block
    y = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, n_pad), lambda i: (i, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (_I0, _I0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad), lambda i: (_I0, _I0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), m.dtype),
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
        interpret=interpret,
    )(m, r.reshape(1, n_pad).astype(m.dtype))
    return y.reshape(n_pad)


def pad_factor(inv_l: np.ndarray | jax.Array) -> jax.Array:
    """Zero-pad an (n, n) factor to the next lane multiple for the kernel."""
    n = inv_l.shape[0]
    n_pad = -(-n // _LANE) * _LANE
    if n_pad == n:
        return jnp.asarray(inv_l)
    return jnp.zeros((n_pad, n_pad), inv_l.dtype).at[:n, :n].set(inv_l)


def apply_padded(inv_l_padded: jax.Array, r: jax.Array, interpret: bool = False) -> jax.Array:
    """Apply the fused kernel to an unpadded rhs (pads/slices around it)."""
    n = r.shape[0]
    n_pad = inv_l_padded.shape[0]
    rp = r if n == n_pad else jnp.pad(r, (0, n_pad - n))
    return fused_spd_apply(inv_l_padded, rp, interpret=interpret)[:n]


def probe() -> None:
    """Tiny real (non-interpret) compile+run on the live backend — the
    on-device Mosaic gate (ops/pallas_gate.py). Run under the SAME x64
    setting as the solve that will use the kernel."""
    m = jnp.eye(_LANE, dtype=jnp.float32)
    r = jnp.ones((_LANE,), jnp.float32)
    jax.block_until_ready(fused_spd_apply(m, r))
