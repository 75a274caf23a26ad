"""Mesh-sharded block-triangular solves: the multi-chip normal-equation
path for con_num past single-chip packed storage.

Single-chip coverage tops out at ~73k constraints (packed f32 factor ~
11 GB of 16 GB HBM; ops/tri_stream.py). The remaining flagship problems
-- PushBox N=30 (154k cons, packed 47 GB) and PlanarHand N=10 (484k) --
need the factor distributed over a mesh. This module implements the
sharded forward/backward substitution with the factor's block-COLUMNS
sharded across devices (the analog of the reference's multi-GPU moment
split, duo_solver.cu:269-295, but for the normal solve, which the
reference never distributes -- CHOLMOD is host-only there):

- forward (L x = r): at block-row i, every device reduces its local
  column contributions; one psum per row assembles the row residual; the
  diagonal owner applies inv(L_ii) and the result is psum-broadcast.
- backward (L^T y = t): right-looking -- once y_j is known, row j's
  tiles (spread over column owners) update the running residual in
  parallel; one psum per step merges the deltas.

Storage here is the full (nb, nb) tile grid sharded on the column axis
(zeros above the diagonal, diagonal tiles inverted) -- simple and
dryrun-friendly; a production deployment packs each device's column set
(halving memory) and uses reduce_scatter instead of full psums. Real
multi-chip hardware is unavailable in this environment; correctness is
validated on the virtual CPU mesh (tests/test_parallel.py) and via
``dryrun_multichip``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def square_tiles_from_packed(tiles: np.ndarray, lay) -> np.ndarray:
    """(nb, nb, B, B) full tile grid from packed storage (host-side):
    zeros above the diagonal; diagonal tiles stay inverted."""
    from cuadmm_tpu.ops.tri_stream import tid

    nb, B = lay.nb, lay.block
    out = np.zeros((nb, nb, B, B), tiles.dtype)
    for i in range(nb):
        for j in range(i + 1):
            out[i, j] = tiles[tid(i, j)]
    return out


def shard_factor(square_tiles: np.ndarray, mesh: Mesh, axis: str = "blocks"):
    """Place the (nb, nb, B, B) grid with block-columns sharded."""
    return jax.device_put(
        square_tiles, NamedSharding(mesh, P(None, axis, None, None))
    )


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def sharded_tri_solve(grid: jax.Array, r: jax.Array, mesh: Mesh, axis: str = "blocks"):
    """y = (L L^T)^{-1} r with the tile grid column-sharded over ``axis``.

    ``grid``: (nb, nb, B, B), lower tiles of L with inverted diagonals,
    sharded P(None, axis). ``r``: (nb*B,) replicated.
    """
    nb, _, B, _ = grid.shape
    D = mesh.shape[axis]
    ncl = nb // D  # local columns per device (nb must divide evenly)

    from jax.experimental.shard_map import shard_map

    def body(local, rloc):
        # local: (nb, ncl, B, B); rloc: (nb, B) replicated
        me = jax.lax.axis_index(axis)
        jglob = me * ncl + jnp.arange(ncl)  # contiguous column slab

        hi = jax.lax.Precision.HIGHEST

        def fwd_row(x, i):
            # Local partial: sum_j<i L[i,j] @ x[j] over my columns.
            mask = (jglob < i).astype(local.dtype)  # (ncl,)
            xj = x[jnp.minimum(jglob, nb - 1)]  # (ncl, B)
            part = jnp.einsum(
                "cab,cb,c->a", local[i], xj, mask, precision=hi
            )
            tot = jax.lax.psum(part, axis)
            acc = rloc[i] - tot
            own = (i // ncl) == me
            il = jnp.where(own, i % ncl, 0)
            dinv = local[i, il]  # inv(L_ii) on the owner
            xi_local = jnp.where(
                own,
                jnp.einsum("ab,b->a", dinv, acc, precision=hi),
                jnp.zeros((B,), local.dtype),
            )
            xi = jax.lax.psum(xi_local, axis)
            return x.at[i].set(xi), None

        x0 = jnp.zeros((nb, B), local.dtype)
        x, _ = jax.lax.scan(fwd_row, x0, jnp.arange(nb))

        def bwd_step(carry, jrev):
            t, y = carry
            j = nb - 1 - jrev
            own = (j // ncl) == me
            jl = jnp.where(own, j % ncl, 0)
            dinv = local[j, jl]
            yj_local = jnp.where(
                own,
                jnp.einsum("ba,b->a", dinv, t[j], precision=hi),  # inv^T
                jnp.zeros((B,), local.dtype),
            )
            yj = jax.lax.psum(yj_local, axis)
            # Right-looking: t_i -= L[j, i]^T y_j for my columns i < j.
            mask = (jglob < j).astype(local.dtype)
            deltas = jnp.einsum(
                "cab,a,c->cb", local[j], yj, mask, precision=hi
            )  # (ncl, B): contribution to t at my columns
            full = jnp.zeros((nb, B), local.dtype).at[
                jnp.minimum(jglob, nb - 1)
            ].add(deltas * mask[:, None])
            t = t - jax.lax.psum(full, axis)
            return (t, y.at[j].set(yj)), None

        t0 = x
        y0 = jnp.zeros((nb, B), local.dtype)
        (tf, y), _ = jax.lax.scan(bwd_step, (t0, y0), jnp.arange(nb))
        return y

    rr = r.reshape(nb, B)
    y = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, None)),
        out_specs=P(None, None),
        check_rep=False,
    )(grid, rr)
    return y.reshape(nb * B)
