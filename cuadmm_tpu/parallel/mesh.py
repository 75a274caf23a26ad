"""Device-mesh utilities for multi-chip solves.

TPU-native replacement for the reference's multi-GPU machinery: cuADMM
ships moment-matrix slices GPU0 -> GPUi with cudaMemcpyPeerAsync from
persistent host threads woken by condition variables every iteration
(reference: src/duo_solver.cu:269-295, :487-577; src/utils/check_gpus.cu:15-45).

Here the same data parallelism over cone blocks is expressed as sharding
annotations on the bucket tensors inside one SPMD program: XLA inserts the
all-gathers/reduce-scatters over ICI, and there is no host control plane at
all. Scalar reductions (residual norms, inner products) are jnp reductions
over sharded arrays -- XLA lowers them to psum collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BLOCK_AXIS = "blocks"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D mesh over the block-batch axis.

    For >1 host, pass ``devices=jax.devices()`` spanning the slice; the
    same axis then rides ICI within hosts and DCN across them.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BLOCK_AXIS,))


def shard_blocks(x: jax.Array, mesh: Optional[Mesh]) -> jax.Array:
    """Constrain a (count, n, n) bucket tensor to be sharded over its batch
    axis. No-op when mesh is absent or the bucket is too small to split."""
    if mesh is None or mesh.size <= 1 or x.shape[0] < mesh.size:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(BLOCK_AXIS, None, None))
    )


def replicated(x: jax.Array, mesh: Optional[Mesh]) -> jax.Array:
    if mesh is None or mesh.size <= 1:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))
