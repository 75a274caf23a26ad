"""Sparse constraint-matrix operations.

TPU-native replacement of the cuSPARSE wrappers (reference:
include/cuadmm/cusparse.h:16-132) and the A-normalization kernel
(reference: src/kernels/sparse_matrix_norm.cu:11-44).

A is stored as sorted COO twice -- once constraint-major for A @ x, once
svec-major for A^T @ y -- and both matvecs are a gather + segment_sum,
which XLA lowers to efficient sorted-segment reductions.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SparseA:
    """Both orderings of the (con_num x vec_len) constraint matrix A.

    ``row`` = constraint index, ``col`` = svec index. The ``a_*`` arrays are
    sorted by row (for A @ x), the ``at_*`` arrays by col (for A^T @ y).
    A pytree: array fields are leaves, sizes are static.
    """

    a_rows: jax.Array
    a_cols: jax.Array
    a_vals: jax.Array
    at_rows: jax.Array
    at_cols: jax.Array
    at_vals: jax.Array
    con_num: int = dataclasses.field(metadata=dict(static=True))
    vec_len: int = dataclasses.field(metadata=dict(static=True))


jax.tree_util.register_dataclass(
    SparseA,
    data_fields=["a_rows", "a_cols", "a_vals", "at_rows", "at_cols", "at_vals"],
    meta_fields=["con_num", "vec_len"],
)


def build_sparse_a(
    at_svec_idx: np.ndarray,
    at_con_idx: np.ndarray,
    vals: np.ndarray,
    con_num: int,
    vec_len: int,
    dtype,
) -> SparseA:
    """Build both orderings from A^T COO triplets (svec_idx, con_idx, val)."""
    # Constraint-major (sort by con, then svec).
    p = np.lexsort((at_svec_idx, at_con_idx))
    a_rows, a_cols, a_vals = at_con_idx[p], at_svec_idx[p], vals[p]
    # svec-major.
    p = np.lexsort((at_con_idx, at_svec_idx))
    t_rows, t_cols, t_vals = at_con_idx[p], at_svec_idx[p], vals[p]
    return SparseA(
        a_rows=jnp.asarray(a_rows, dtype=jnp.int32),
        a_cols=jnp.asarray(a_cols, dtype=jnp.int32),
        a_vals=jnp.asarray(a_vals, dtype=dtype),
        at_rows=jnp.asarray(t_rows, dtype=jnp.int32),
        at_cols=jnp.asarray(t_cols, dtype=jnp.int32),
        at_vals=jnp.asarray(t_vals, dtype=dtype),
        con_num=int(con_num),
        vec_len=int(vec_len),
    )


def spmv_a(sa: SparseA, x: jax.Array) -> jax.Array:
    """A @ x: (vec_len,) -> (con_num,)."""
    return jax.ops.segment_sum(
        sa.a_vals * x[sa.a_cols],
        sa.a_rows,
        num_segments=sa.con_num,
        indices_are_sorted=True,
    )


def spmv_at(sa: SparseA, y: jax.Array) -> jax.Array:
    """A^T @ y: (con_num,) -> (vec_len,)."""
    return jax.ops.segment_sum(
        sa.at_vals * y[sa.at_rows],
        sa.at_cols,
        num_segments=sa.vec_len,
        indices_are_sorted=True,
    )


def normalize_rows(
    at_svec_idx: np.ndarray, at_con_idx: np.ndarray, vals: np.ndarray, con_num: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-constraint 2-norms of A, clamped >= 1, and A normalized in place
    semantics (returns the scaled values).

    Reference: src/kernels/sparse_matrix_norm.cu:11-44 (norms of the CSC
    columns of A^T, i.e. rows of A).
    """
    sq = np.zeros(con_num, dtype=np.float64)
    np.add.at(sq, at_con_idx, vals * vals)
    norm = np.maximum(1.0, np.sqrt(sq))
    return norm, vals / norm[at_con_idx]
