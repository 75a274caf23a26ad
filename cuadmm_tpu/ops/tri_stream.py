"""Packed block-triangular Cholesky: build + streaming triangular solves.

The normal-equation solver for con_num past the dense-square HBM ceiling
(a full f32 factor at PlanarHand N=1's 66,008 constraints is 17.4 GB on a
16 GB chip). The reference covers this range with CHOLMOD's sparse LDLt
on the host plus two PCIe round-trips per iteration (reference:
include/cuadmm/cholesky_cpu.h:62-155, src/solver.cu:487-500); on this
platform host callbacks are unavailable, and sparse triangular solves /
large sparse matvecs are gather-bound (measured ~7 cycles per gathered
element on v5e: a 2.7M-nnz ELL matvec costs 19.6 ms, so CG-style methods
need seconds per solve). The TPU-native answer is dense-BLOCKED but
PACKED storage:

- The lower-triangular factor lives as packed tiles (T, B, B) with T =
  nb(nb+1)/2, row-major over the block triangle -- HALF the HBM of a
  square factor (8.8 GB at n=66k, B=1024), zero index storage.
- ``packed_cholesky``: right-looking blocked Cholesky entirely on device
  (MXU, HIGHEST precision); diagonal tiles are stored INVERTED so the
  solve kernels never run a serialized TRSM. Pair updates are chunked so
  transients stay ~1 GB.
- ``tri_solve_fwd`` / ``tri_solve_bwd``: Pallas kernels streaming the
  packed tiles exactly once per sweep (row-major for L x = r,
  reverse-column-major for L^T y = t). No gathers: every tile access is
  a contiguous DMA; x/y/acc live in VMEM. At HBM speed a sweep over
  8.8 GB is ~11 ms -- each solve application costs two sweeps.

Apply = P^{-1} r ~ solving L L^T y = r with the regularized factor; the
``precond``-style refinement in ops/chol.py (residuals through the exact
sparse A, which IS tiny -- PlanarHand's A has only 157k nnz) recovers
full accuracy, identical in role to the dense-square path's refinement.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class PackedLayout(NamedTuple):
    """Static description of a packed block-triangular matrix."""

    n: int  # logical dimension
    n_pad: int  # nb * block
    block: int
    nb: int  # number of block rows
    T: int  # nb*(nb+1)//2 tiles


def make_layout(n: int, block: int = 1024) -> PackedLayout:
    nb = -(-n // block)
    return PackedLayout(n=n, n_pad=nb * block, block=block, nb=nb, T=nb * (nb + 1) // 2)


def tid(i: int, j: int) -> int:
    """Packed tile id of block (i, j), i >= j (row-major lower triangle)."""
    return i * (i + 1) // 2 + j


def scatter_packed_aat(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    lay: PackedLayout,
    eps: float,
    diag_mean: float,
    dtype=jnp.float32,
) -> jax.Array:
    """Device packed tiles of AA^T + eps*scale*I from COO (host indices).

    Only lower-triangle entries are stored (r >= c). Padding rows get a
    unit diagonal so the Cholesky stays well-posed there.
    """
    keep = rows >= cols
    r, c, v = rows[keep], cols[keep], vals[keep]
    bi, ri = r // lay.block, r % lay.block
    bj, ci = c // lay.block, c % lay.block
    t = (bi * (bi + 1) // 2 + bj).astype(np.int64)

    # Regularized diagonal + identity padding, as extra COO entries.
    scale = max(float(diag_mean), 1.0)
    all_d = np.arange(lay.n_pad, dtype=np.int64)
    t_d = ((all_d // lay.block) * (all_d // lay.block + 1) // 2 + all_d // lay.block)
    rd = all_d % lay.block
    vd = np.full(lay.n_pad, eps * scale)
    vd[lay.n :] = 1.0  # unit diagonal on padding

    t = np.concatenate([t, t_d])
    ri = np.concatenate([ri, rd])
    ci = np.concatenate([ci, rd])
    v = np.concatenate([v, vd])

    # T + 1 tiles: the trailing tile is a scatter/gather SENTINEL for the
    # padded build steps (packed_cholesky) -- garbage lands there instead
    # of needing masks. The solve kernels only read tiles [0, T).
    @functools.partial(jax.jit, static_argnames=("shape",))
    def scatter(t, ri, ci, v, shape):
        tiles = jnp.zeros(shape, dtype)
        return tiles.at[t, ri, ci].add(v)

    return scatter(
        jnp.asarray(t, jnp.int32),
        jnp.asarray(ri, jnp.int32),
        jnp.asarray(ci, jnp.int32),
        jnp.asarray(v, dtype),
        shape=(lay.T + 1, lay.block, lay.block),
    )


def _pair_lists(nb: int, k: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(pi, pj, dst): for the rank-B update after column k, all pairs
    i >= j > k; pi/pj index the trailing column-k panel (i-k-1, j-k-1),
    dst is the packed tile id of (i, j)."""
    pi, pj, dst = [], [], []
    for i in range(k + 1, nb):
        for j in range(k + 1, i + 1):
            pi.append(i - k - 1)
            pj.append(j - k - 1)
            dst.append(tid(i, j))
    return (
        np.asarray(pi, np.int32),
        np.asarray(pj, np.int32),
        np.asarray(dst, np.int32),
    )


def _pow2_at_least(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


@functools.partial(jax.jit, donate_argnums=0, static_argnames=())
def _diag_panel_step(tiles, diag_id, col_ids):
    """One elimination step: invert the diagonal tile in place, scale the
    (padded) column panel by inv(L_kk)^T. Returns (tiles, panel).

    ``col_ids`` is padded with the sentinel tile id (T) -- padded lanes
    read/write the sentinel, no masks needed. Runs as its own jit with the
    tile array DONATED so the 8+ GB buffer is updated in place across
    calls (a single monolithic build program OOMed at PlanarHand scale:
    XLA could not keep its transients plus a provably-aliased 8.4 GB
    buffer under 16 GB)."""
    hi = jax.lax.Precision.HIGHEST
    B = tiles.shape[-1]
    with jax.default_matmul_precision("highest"):
        dk = jax.lax.dynamic_index_in_dim(tiles, diag_id, 0, keepdims=False)
        # Diagonal tiles store only the lower triangle; rebuild the
        # symmetric block explicitly. (jnp.linalg.cholesky would
        # symmetrize as (A+A^T)/2, HALVING our off-diagonals.)
        dk = jnp.tril(dk) + jnp.tril(dk, -1).T
        lkk = jnp.linalg.cholesky(dk)
        ikk = jax.scipy.linalg.solve_triangular(
            lkk, jnp.eye(B, dtype=tiles.dtype), lower=True
        )
        tiles = jax.lax.dynamic_update_index_in_dim(tiles, ikk, diag_id, 0)
        # Panel extraction as a scan of dynamic slices, NOT tiles[col_ids]:
        # XLA's gather lowering materialized a rematerialized slice of the
        # ENTIRE tile array as an HLO temp (3.25 GB at PushBox N=30's
        # 3,323-tile band -- OOM on top of the 13 GB factor). A scan of
        # m_pad dynamic-slices reads only the addressed tiles.
        _, panel = jax.lax.scan(
            lambda _, i: (
                None,
                jax.lax.dynamic_index_in_dim(tiles, i, 0, keepdims=False),
            ),
            None,
            col_ids,
        )
        panel = jax.lax.dot_general(
            panel, ikk, (((2,), (1,)), ((), ())), precision=hi
        )
        tiles = tiles.at[col_ids].set(panel)
    return tiles, panel


@functools.partial(jax.jit, donate_argnums=0, static_argnames=())
def _pair_chunk_step(tiles, panel, pi, pj, dst):
    """Subtract one chunk of panel outer products L_ik L_jk^T from the
    trailing tiles. Padded (pi, pj, dst) point at the sentinel tile."""
    hi = jax.lax.Precision.HIGHEST
    with jax.default_matmul_precision("highest"):
        li = panel[pi]
        ljt = panel[pj]
        upd = jax.lax.dot_general(
            li, ljt, (((2,), (2,)), ((0,), (0,))), precision=hi
        )
        return tiles.at[dst].add(-upd)


def packed_cholesky(tiles: jax.Array, lay: PackedLayout, update_chunk: int = 64) -> jax.Array:
    """Blocked Cholesky of packed tiles, in place across many small jit
    calls; diagonal tiles come out INVERTED (inv(L_kk)) -- exactly what
    the streaming solves consume.

    Right-looking: for each k, factor the diagonal tile, scale the column
    panel by inv(L_kk)^T (a batched matmul -- no TRSM), then subtract the
    panel outer products from the trailing triangle in chunks of
    ``update_chunk`` tiles. Every call donates the tile array, so peak
    HBM is the packed factor plus ~3 chunk-sized transients; panel sizes
    and chunk ids are padded to powers of two (sentinel tile absorbs the
    padding) so only O(log nb) distinct programs compile. All matmuls run
    at HIGHEST precision: a bf16-updated factor of a regularized AA^T is
    garbage (see ops/chol.py._device_factorize).
    """
    nb = lay.nb
    sentinel = lay.T
    for k in range(nb):
        m = nb - 1 - k
        m_pad = _pow2_at_least(max(m, 1))
        col = np.full(m_pad, sentinel, np.int32)
        col[:m] = [tid(i, k) for i in range(k + 1, nb)]
        tiles, panel = _diag_panel_step(
            tiles, np.int32(tid(k, k)), jnp.asarray(col)
        )
        if m:
            pi, pj, dst = _pair_lists(nb, k)
            # Remap pi/pj into the padded panel; sentinel-dst rows may
            # read any panel row (their product lands on the sentinel).
            n_chunks = -(-len(dst) // update_chunk)
            total = n_chunks * update_chunk
            pi_p = np.zeros(total, np.int32)
            pj_p = np.zeros(total, np.int32)
            dst_p = np.full(total, sentinel, np.int32)
            pi_p[: len(pi)] = pi
            pj_p[: len(pj)] = pj
            dst_p[: len(dst)] = dst
            for s in range(0, total, update_chunk):
                sl = slice(s, s + update_chunk)
                tiles = _pair_chunk_step(
                    tiles,
                    panel,
                    jnp.asarray(pi_p[sl]),
                    jnp.asarray(pj_p[sl]),
                    jnp.asarray(dst_p[sl]),
                )
    return tiles


# ----------------------------------------------------------------------
# Streaming triangular solves (Pallas).
# ----------------------------------------------------------------------


def _mv_lanes(tile, v_row):
    """(1,B) row of (tile @ v): out[a] = sum_b tile[a,b] v[b].

    Elementwise multiply + lane reduction on the VPU in FULL f32. The MXU
    alternative at HIGHEST precision is 6 bf16 passes per tile and turns
    this bandwidth-shaped kernel compute-bound (measured 51 ms/solve at
    n=66k vs the ~21 ms DMA floor); plain MXU f32 is bf16-inaccurate."""
    return jnp.sum(tile * v_row, axis=1)[None, :]


def _mv_sublanes(tile, v_row):
    """(1,B) row of (tile^T @ v): out[b] = sum_a v[a] tile[a,b].
    Multiply rows by scalars, reduce over sublanes (cheapest on TPU)."""
    return jnp.sum(tile * v_row.reshape(-1, 1), axis=0)[None, :]


def _fwd_kernel(row_ref, col_ref, r_ref, tile_ref, x_ref, acc_ref):
    """Forward solve L x = r over row-major packed tiles.

    Diagonal tiles hold inv(L_kk): at (i, i) the row's accumulated
    residual is multiplied by it and written to x. All vectors are (1, n)
    rows in VMEM; per-tile work is one (B,B) VPU multiply+reduce."""
    g = pl.program_id(0)
    i = row_ref[g]
    j = col_ref[g]
    B = acc_ref.shape[1]
    tile = tile_ref[0]

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = r_ref[:, pl.ds(i * B, B)]

    @pl.when(j < i)
    def _sub():
        xj = x_ref[:, pl.ds(j * B, B)]
        acc_ref[...] -= _mv_lanes(tile, xj)

    @pl.when(j == i)
    def _diag():
        # x_i = inv(L_ii) @ acc  (tile IS inv(L_ii))
        x_ref[:, pl.ds(i * B, B)] = _mv_lanes(tile, acc_ref[...])


def _bwd_kernel(order_ref, row_ref, col_ref, first_ref, t_ref, tile_ref, y_ref, acc_ref):
    """Backward solve L^T y = t over reverse-column-major packed tiles.

    Traversal: columns i = nb-1..0; within a column, rows j = nb-1..i
    (diagonal tile last). ``order`` maps grid step -> packed tile id (fed
    to the tile index map); row/col give the tile's (j, i)."""
    g = pl.program_id(0)
    j = row_ref[g]  # tile's block-row
    i = col_ref[g]  # tile's block-col == the column being solved
    B = acc_ref.shape[1]
    tile = tile_ref[0]

    @pl.when(first_ref[g] == 1)
    def _init():
        acc_ref[...] = t_ref[:, pl.ds(i * B, B)]

    @pl.when(j > i)
    def _sub():
        yj = y_ref[:, pl.ds(j * B, B)]
        # (L_ji^T y_j): contraction over the tile's first index.
        acc_ref[...] -= _mv_sublanes(tile, yj)

    @pl.when(j == i)
    def _diag():
        # y_i = inv(L_ii)^T @ acc  (tile IS inv(L_ii))
        y_ref[:, pl.ds(i * B, B)] = _mv_sublanes(tile, acc_ref[...])


def _fwd_meta(lay: PackedLayout):
    rows = np.concatenate([np.full(i + 1, i, np.int32) for i in range(lay.nb)])
    cols = np.concatenate([np.arange(i + 1, dtype=np.int32) for i in range(lay.nb)])
    return rows, cols


def _bwd_meta(lay: PackedLayout):
    order, rows, cols, first = [], [], [], []
    for i in range(lay.nb - 1, -1, -1):  # column being solved
        for pos, j in enumerate(range(lay.nb - 1, i - 1, -1)):  # block row
            order.append(tid(j, i))
            rows.append(j)
            cols.append(i)
            first.append(1 if pos == 0 else 0)
    return (
        np.asarray(order, np.int32),
        np.asarray(rows, np.int32),
        np.asarray(cols, np.int32),
        np.asarray(first, np.int32),
    )


@functools.partial(jax.jit, static_argnames=("lay", "interpret"))
def packed_solve(
    tiles: jax.Array, r: jax.Array, lay: PackedLayout, interpret: bool = False
) -> jax.Array:
    """y = (L L^T)^{-1} r via two streaming sweeps over the packed factor."""
    B, nb, T = lay.block, lay.nb, lay.T
    rows_f, cols_f = _fwd_meta(lay)
    order_b, rows_b, cols_b, first_b = _bwd_meta(lay)

    rp = r.astype(tiles.dtype)
    if lay.n_pad != r.shape[0]:
        rp = jnp.pad(rp, (0, lay.n_pad - r.shape[0]))
    rp = rp.reshape(1, lay.n_pad)

    # Every index map must return int32 values: under x64 the DEFAULT
    # (unblocked) index map emits Python-literal zeros that promote to
    # int64, which Mosaic cannot legalize (round-3/r4 recurring lesson).
    z = np.int32(0)
    fwd = pl.pallas_call(
        _fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(  # r: resident
                    (1, lay.n_pad), lambda g, rr, cc: (z, z),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, B, B), lambda g, rr, cc: (g, z, z)),
            ],
            out_specs=pl.BlockSpec(  # x: resident
                (1, lay.n_pad), lambda g, rr, cc: (z, z),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((1, B), tiles.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((1, lay.n_pad), tiles.dtype),
        interpret=interpret,
    )
    x = fwd(jnp.asarray(rows_f), jnp.asarray(cols_f), rp, tiles)

    bwd = pl.pallas_call(
        _bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(  # t: resident
                    (1, lay.n_pad), lambda g, oo, rr, cc, ff: (z, z),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, B, B), lambda g, oo, rr, cc, ff: (oo[g], z, z)),
            ],
            out_specs=pl.BlockSpec(  # y: resident
                (1, lay.n_pad), lambda g, oo, rr, cc, ff: (z, z),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((1, B), tiles.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((1, lay.n_pad), tiles.dtype),
        interpret=interpret,
    )
    y = bwd(
        jnp.asarray(order_b),
        jnp.asarray(rows_b),
        jnp.asarray(cols_b),
        jnp.asarray(first_b),
        x,
        tiles,
    )
    return y.reshape(lay.n_pad)[: r.shape[0]].astype(r.dtype)


def probe(interpret: bool = False) -> None:
    """Tiny real compile+run of both solve kernels (pallas_gate probe).
    Uses a 2-block layout so both the off-diagonal and diagonal paths
    execute. f32 only (Mosaic rejects 64-bit types)."""
    lay = make_layout(256, block=128)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((256, 256)).astype(np.float32)
    p = a @ a.T + 256 * np.eye(256, dtype=np.float32)
    l = np.linalg.cholesky(p)
    tiles = np.zeros((lay.T, 128, 128), np.float32)
    tiles[tid(0, 0)] = np.linalg.inv(l[:128, :128])
    tiles[tid(1, 0)] = l[128:, :128]
    tiles[tid(1, 1)] = np.linalg.inv(l[128:, 128:])
    r = rng.standard_normal(256).astype(np.float32)
    y = packed_solve(jnp.asarray(tiles), jnp.asarray(r), lay, interpret=interpret)
    ref = np.linalg.solve(p, r)
    err = np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref)
    if not err < 1e-4:
        raise RuntimeError(f"packed_solve probe error {err:.2e}")


# ----------------------------------------------------------------------
# Banded-blocked factor: the SPOT/trajectory problems are chain-structured
# (constraints couple only across adjacent knot points), so AA^T under an
# RCM ordering is BANDED -- pendulum N=80 (112,028 cons) has scalar
# bandwidth 1,615 and PushBox N=30 (154,256 cons) 20,512 (measured,
# round 5). A banded factor stores nb*(nbw+1) tiles instead of the packed
# triangle's nb(nb+1)/2: pendulum drops from a physically-impossible
# 25 GB packed factor to 1.4 GB, PushBox N=30 from 47 GB to ~13 GB --
# both under the single-chip HBM line the reference needs CHOLMOD's
# host-side sparse factor for (include/cuadmm/cholesky_cpu.h:62-155).
# Banded Cholesky produces zero fill outside the band, so the same
# right-looking elimination steps (_diag_panel_step/_pair_chunk_step)
# apply verbatim; the streaming solves reuse the packed kernels' bodies
# with an explicit tile-order prefetch (rows no longer start at j=0).
# ----------------------------------------------------------------------


class BandLayout(NamedTuple):
    """Static description of a banded-blocked lower factor."""

    n: int  # logical dimension
    n_pad: int  # nb * block
    block: int
    nb: int  # number of block rows
    nbw: int  # block bandwidth: tile (i, j) may be nonzero iff i-j <= nbw
    T: int  # nb * (nbw + 1) allocated band slots (some top-left unused)


def make_band_layout(n: int, bw: int, block: int = 0) -> BandLayout:
    """Layout for scalar bandwidth ``bw``; picks the block size in
    {256, 512, 1024} minimizing a sweep-time model: tile bytes at HBM
    speed (~800 GB/s) plus a ~3 us per-grid-step overhead. Smaller tiles
    track the scalar band tighter (fewer bytes) but multiply the step
    count; the model keeps 1024 unless the byte saving genuinely pays."""
    if block <= 0:
        best = None
        for B in (1024, 512, 256):
            nb = -(-n // B)
            nbw = min(nb - 1, (bw + B - 1) // B)
            T = nb * (nbw + 1)
            t_model = T * B * B * 4 / 800e9 + T * 3e-6
            if best is None or t_model < best[0]:
                best = (t_model, B)
        block = best[1]
    nb = -(-n // block)
    nbw = min(nb - 1, (bw + block - 1) // block)
    return BandLayout(
        n=n, n_pad=nb * block, block=block, nb=nb, nbw=nbw, T=nb * (nbw + 1)
    )


def tid_band(i, j, lay: BandLayout):
    """Band slot of tile (i, j), i - nbw <= j <= i (row-major band)."""
    return i * (lay.nbw + 1) + (lay.nbw - (i - j))


def scatter_band_aat(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    lay: BandLayout,
    eps: float,
    diag_mean: float,
    dtype=jnp.float32,
) -> jax.Array:
    """Device band tiles of (permuted) AA^T + eps*scale*I from COO.

    ``rows``/``cols`` are indices AFTER the bandwidth-reducing permutation;
    entries outside the band are an error (the caller computed the
    bandwidth from this exact pattern). Padding rows get a unit diagonal.
    """
    keep = rows >= cols
    r, c, v = rows[keep], cols[keep], vals[keep]
    bi, bj = r // lay.block, c // lay.block
    if len(bi) and int((bi - bj).max()) > lay.nbw:
        raise ValueError("entry outside the declared band")
    t = (bi * (lay.nbw + 1) + (lay.nbw - (bi - bj))).astype(np.int64)
    ri, ci = r % lay.block, c % lay.block

    scale = max(float(diag_mean), 1.0)
    all_d = np.arange(lay.n_pad, dtype=np.int64)
    t_d = (all_d // lay.block) * (lay.nbw + 1) + lay.nbw
    rd = all_d % lay.block
    vd = np.full(lay.n_pad, eps * scale)
    vd[lay.n :] = 1.0

    t = np.concatenate([t, t_d])
    ri = np.concatenate([ri, rd])
    ci = np.concatenate([ci, rd])
    v = np.concatenate([v, vd])

    @functools.partial(jax.jit, static_argnames=("shape",))
    def scatter(t, ri, ci, v, shape):
        tiles = jnp.zeros(shape, dtype)
        return tiles.at[t, ri, ci].add(v)

    # T + 1: trailing sentinel tile for the padded elimination steps.
    return scatter(
        jnp.asarray(t, jnp.int32),
        jnp.asarray(ri, jnp.int32),
        jnp.asarray(ci, jnp.int32),
        jnp.asarray(v, dtype),
        shape=(lay.T + 1, lay.block, lay.block),
    )


def band_cholesky(tiles: jax.Array, lay: BandLayout) -> jax.Array:
    """Right-looking blocked Cholesky within the band; diagonal tiles come
    out INVERTED. Reuses the packed elimination steps -- banded Cholesky
    has no fill outside the band, so after eliminating column k only
    tiles (i, j) with k < j <= i <= k + nbw update, all in-band."""
    nb, nbw = lay.nb, lay.nbw
    sentinel = lay.T
    for k in range(nb):
        m = min(nbw, nb - 1 - k)
        m_pad = _pow2_at_least(max(m, 1))
        col = np.full(m_pad, sentinel, np.int32)
        col[:m] = [tid_band(i, k, lay) for i in range(k + 1, k + m + 1)]
        tiles, panel = _diag_panel_step(
            tiles, np.int32(tid_band(k, k, lay)), jnp.asarray(col)
        )
        if m:
            pi, pj, dst = [], [], []
            for i in range(k + 1, k + m + 1):
                for j in range(k + 1, i + 1):
                    pi.append(i - k - 1)
                    pj.append(j - k - 1)
                    dst.append(tid_band(i, j, lay))
            # Chunk the pair updates (64 tiles = ~256 MB of transients):
            # a single pow2-padded chunk of nbw(nbw+1)/2 pairs OOMed on
            # top of PushBox N=30's 13 GB factor (231 pairs -> ~3 GB).
            chunk = 64
            n_chunks = -(-len(dst) // chunk)
            total = n_chunks * chunk
            pi_p = np.zeros(total, np.int32)
            pj_p = np.zeros(total, np.int32)
            dst_p = np.full(total, sentinel, np.int32)
            pi_p[: len(pi)] = pi
            pj_p[: len(pj)] = pj
            dst_p[: len(dst)] = dst
            for s0 in range(0, total, chunk):
                sl = slice(s0, s0 + chunk)
                tiles = _pair_chunk_step(
                    tiles, panel, jnp.asarray(pi_p[sl]), jnp.asarray(pj_p[sl]),
                    jnp.asarray(dst_p[sl]),
                )
    return tiles


def _fwd_band_kernel(
    order_ref, row_ref, col_ref, first_ref, r_ref, tile_ref, x_ref, acc_ref
):
    """Forward solve over band tiles: identical to _fwd_kernel except the
    row-start test is an explicit flag (band rows start at j = i - nbw,
    not 0) and tiles stream via the order prefetch."""
    g = pl.program_id(0)
    i = row_ref[g]
    j = col_ref[g]
    B = acc_ref.shape[1]
    tile = tile_ref[0]

    @pl.when(first_ref[g] == 1)
    def _init():
        acc_ref[...] = r_ref[:, pl.ds(i * B, B)]

    @pl.when(j < i)
    def _sub():
        xj = x_ref[:, pl.ds(j * B, B)]
        acc_ref[...] -= _mv_lanes(tile, xj)

    @pl.when(j == i)
    def _diag():
        x_ref[:, pl.ds(i * B, B)] = _mv_lanes(tile, acc_ref[...])


def _fwd_band_meta(lay: BandLayout):
    order, rows, cols, first = [], [], [], []
    for i in range(lay.nb):
        j0 = max(0, i - lay.nbw)
        for pos, j in enumerate(range(j0, i + 1)):
            order.append(tid_band(i, j, lay))
            rows.append(i)
            cols.append(j)
            first.append(1 if pos == 0 else 0)
    return (
        np.asarray(order, np.int32),
        np.asarray(rows, np.int32),
        np.asarray(cols, np.int32),
        np.asarray(first, np.int32),
    )


def _bwd_band_meta(lay: BandLayout):
    order, rows, cols, first = [], [], [], []
    for i in range(lay.nb - 1, -1, -1):  # column being solved
        jhi = min(lay.nb - 1, i + lay.nbw)
        for pos, j in enumerate(range(jhi, i - 1, -1)):  # block row
            order.append(tid_band(j, i, lay))
            rows.append(j)
            cols.append(i)
            first.append(1 if pos == 0 else 0)
    return (
        np.asarray(order, np.int32),
        np.asarray(rows, np.int32),
        np.asarray(cols, np.int32),
        np.asarray(first, np.int32),
    )


@functools.partial(jax.jit, static_argnames=("lay", "interpret"))
def band_solve(
    tiles: jax.Array, r: jax.Array, lay: BandLayout, interpret: bool = False
) -> jax.Array:
    """y = (L L^T)^{-1} r via two streaming sweeps over the band factor."""
    B = lay.block
    of, rf, cf, ff = _fwd_band_meta(lay)
    ob, rb, cb, fb = _bwd_band_meta(lay)
    G = len(of)

    rp = r.astype(tiles.dtype)
    if lay.n_pad != r.shape[0]:
        rp = jnp.pad(rp, (0, lay.n_pad - r.shape[0]))
    rp = rp.reshape(1, lay.n_pad)

    z = np.int32(0)

    def mk(kernel):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(G,),
                in_specs=[
                    pl.BlockSpec(
                        (1, lay.n_pad), lambda g, oo, rr, cc, ff: (z, z),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, B, B), lambda g, oo, rr, cc, ff: (oo[g], z, z)
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, lay.n_pad), lambda g, oo, rr, cc, ff: (z, z),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[pltpu.VMEM((1, B), tiles.dtype)],
            ),
            out_shape=jax.ShapeDtypeStruct((1, lay.n_pad), tiles.dtype),
            interpret=interpret,
        )

    x = mk(_fwd_band_kernel)(
        jnp.asarray(of), jnp.asarray(rf), jnp.asarray(cf), jnp.asarray(ff),
        rp, tiles,
    )
    y = mk(_bwd_kernel)(
        jnp.asarray(ob), jnp.asarray(rb), jnp.asarray(cb), jnp.asarray(fb),
        x, tiles,
    )
    return y.reshape(lay.n_pad)[: r.shape[0]].astype(r.dtype)


def probe_band(interpret: bool = False) -> None:
    """Tiny real compile+run of the band solve kernels (pallas_gate
    probe): 4 block rows, block bandwidth 1, so first/sub/diag paths and
    the unused top-left slots all exercise."""
    rng = np.random.default_rng(0)
    n, B = 512, 128
    lay = make_band_layout(n, bw=128, block=B)
    a = np.zeros((n, n), np.float32)
    for i in range(lay.nb):
        for j in range(max(0, i - 1), i + 1):
            blkv = rng.standard_normal((B, B)).astype(np.float32)
            a[i * B : (i + 1) * B, j * B : (j + 1) * B] = blkv
    p = (a @ a.T + n * np.eye(n)).astype(np.float32)
    # Zero outside the band to make p exactly banded, then factor.
    for i in range(lay.nb):
        for j in range(lay.nb):
            if abs(i - j) > 1:
                p[i * B : (i + 1) * B, j * B : (j + 1) * B] = 0.0
    l = np.linalg.cholesky(p)
    tiles = np.zeros((lay.T + 1, B, B), np.float32)
    for i in range(lay.nb):
        for j in range(max(0, i - 1), i + 1):
            blk = l[i * B : (i + 1) * B, j * B : (j + 1) * B]
            tiles[tid_band(i, j, lay)] = (
                np.linalg.inv(blk) if i == j else blk
            )
    r = rng.standard_normal(n).astype(np.float32)
    y = band_solve(jnp.asarray(tiles), jnp.asarray(r), lay, interpret=interpret)
    ref = np.linalg.solve(p, r)
    err = np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref)
    if not err < 1e-4:
        raise RuntimeError(f"band_solve probe error {err:.2e}")
