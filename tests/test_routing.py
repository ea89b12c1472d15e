"""Routing-network SpMV: Benes masks, layer decomposition, Pallas kernel
(interpret mode) -- the gather-free general-sparse path."""
import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from tpcg import block_cg, reference
from tpcg.ops.routing import (apply_benes_numpy, assign_layers, benes_masks,
                              build_routing_spmv)
from tpcg.ops.route_spmv import DeviceRouted


def test_benes_masks_route_arbitrary_permutations():
    rng = np.random.default_rng(0)
    for m in (2, 8, 64, 512):
        for _ in range(3):
            perm = rng.permutation(m)
            masks = benes_masks(perm)
            x = np.arange(m, dtype=np.float64)
            np.testing.assert_array_equal(apply_benes_numpy(masks, x),
                                          x[perm])


def test_assign_layers_is_matching_decomposition():
    rng = np.random.default_rng(1)
    n, per_row = 300, 7
    rows = np.repeat(np.arange(n), per_row)
    cols = rng.integers(0, n, size=n * per_row)
    layers = assign_layers(rows.astype(np.int64), cols.astype(np.int64), n)
    seen = np.zeros(n * per_row, dtype=bool)
    for lrows, lidx in layers:
        # at most one edge per row and per column within a layer
        assert len(np.unique(lrows)) == len(lrows)
        assert len(np.unique(cols[lidx])) == len(lidx)
        assert not seen[lidx].any()
        seen[lidx] = True
    assert seen.all()
    # layer count near the max-degree lower bound
    maxdeg = max(np.bincount(rows).max(), np.bincount(cols).max())
    assert len(layers) <= int(1.5 * maxdeg) + 2


def _random_sym(n, per_row, seed):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), per_row)
    cols = rng.integers(0, n, size=n * per_row)
    A = sp.coo_matrix((rng.standard_normal(n * per_row), (rows, cols)),
                      shape=(n, n))
    return sp.csr_matrix((A + A.T) * 0.5 + 2 * per_row * sp.eye(n)) \
        .astype(np.float32)


def test_routed_matvec_matches_scipy():
    A = _random_sym(500, 8, seed=2)
    R = build_routing_spmv(A)
    D = DeviceRouted(R, interpret=True)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(500).astype(np.float32)
    y = np.asarray(D.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=0,
                               atol=1e-4 * np.abs(A @ x).max())


def test_routed_matvec_multirhs_batches_bitexact():
    """Multi-RHS goes through the batched (b, rows, C) kernel in blocks
    of RHS_BATCH; every column must equal the single-RHS kernel result
    BITWISE (same elementwise op sequence, only broadcast over the
    batch), including a ragged tail block (6 = 4 + 2) and a block
    smaller than RHS_BATCH (3)."""
    from tpcg.ops.route_spmv import RHS_BATCH

    assert RHS_BATCH == 4  # the exp_route2-measured sweet spot
    A = _random_sym(400, 7, seed=13)
    R = build_routing_spmv(A)
    D = DeviceRouted(R, interpret=True)
    rng = np.random.default_rng(7)
    for nrhs in (3, 6):
        X = rng.standard_normal((400, nrhs)).astype(np.float32)
        Y = np.asarray(D.matvec(jnp.asarray(X)))
        for r in range(nrhs):
            yc = np.asarray(D.matvec(jnp.asarray(X[:, r])))
            np.testing.assert_array_equal(Y[:, r], yc)
        np.testing.assert_allclose(Y, A @ X, rtol=0,
                                   atol=1e-4 * np.abs(A @ X).max())


def test_block_cg_on_routed_operand_matches_oracle():
    """The gather-free operand drops into the unchanged block_cg host."""
    A = _random_sym(300, 6, seed=4)
    R = build_routing_spmv(A)
    D = DeviceRouted(R, interpret=True)
    b = np.random.default_rng(5).standard_normal(300).astype(np.float32)
    res = block_cg(D, jnp.asarray(b), n_iterations=12)
    _, hist = reference.cg(A.astype(np.float64), b.astype(np.float64),
                           n_iterations=12, record_history=True)
    h = np.asarray(res.residual_history).reshape(-1)
    np.testing.assert_allclose(h, hist, rtol=1e-4, atol=1e-5 * hist[0])


def test_to_device_matrix_route_fallback():
    """Unstructured real matrices opt into the routed operand instead of
    the slow ELL gather path."""
    from tpcg.sparse import DiaMatrix, to_device_matrix

    A = _random_sym(256, 5, seed=9)
    M, perm = to_device_matrix(A, route_fallback=True)
    assert isinstance(M, DeviceRouted) and perm is None
    # banded input still takes the DIA path
    import scipy.sparse as sp
    B = sp.csr_matrix(sp.diags([np.ones(255), 4 * np.ones(256),
                                np.ones(255)], [-1, 0, 1])).astype(
                                    np.float32)
    M2, _ = to_device_matrix(B, route_fallback=True)
    assert isinstance(M2, DiaMatrix)


def test_routed_pair_complex_matches_scipy():
    """Complex routed operand: shared masks, Karatsuba value planes,
    block_cg_planes on top (the mhd1280b ingestion class)."""
    from tpcg.ops.cplx import block_cg_planes, from_planes, to_planes
    from tpcg.ops.route_spmv import routed_pair

    rng = np.random.default_rng(11)
    n, per_row = 256, 6
    rows = np.repeat(np.arange(n), per_row)
    cols = rng.integers(0, n, size=n * per_row)
    data = (rng.standard_normal(n * per_row)
            + 1j * rng.standard_normal(n * per_row)) * 0.1
    A = sp.coo_matrix((data, (rows, cols)), shape=(n, n))
    A = sp.csr_matrix((A + A.T) * 0.5 + 2 * per_row * sp.eye(n)) \
        .astype(np.complex64)
    R = build_routing_spmv(A)
    P = routed_pair(R, interpret=True)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    y = from_planes(np.asarray(P.matvec(to_planes(x, jnp.float32))))
    np.testing.assert_allclose(y, A @ x, rtol=0,
                               atol=1e-4 * np.abs(A @ x).max())
    b = (rng.standard_normal((n, 1)) + 1j * rng.standard_normal((n, 1)))
    res = block_cg_planes(P, to_planes(b.astype(np.complex64), jnp.float32),
                          n_iterations=10)
    _, hist = reference.cg(A.astype(np.complex128), b, n_iterations=10,
                           record_history=True)
    h = np.asarray(res.residual_history)[:, 0]
    np.testing.assert_allclose(h, hist[:, 0], rtol=1e-3,
                               atol=1e-4 * hist[0, 0])


def test_routed_small_matrix_pads_to_lane_width():
    """n < 128 pads the network to one (128,) lane row instead of a
    zero-row reshape crash in DeviceRouted."""
    A = _random_sym(50, 3, seed=21)
    R = build_routing_spmv(A)
    assert R.m >= 128
    x = np.random.default_rng(2).standard_normal(50).astype(np.float32)
    np.testing.assert_allclose(R.matvec_numpy(x), A @ x, rtol=1e-5,
                               atol=1e-6)
    D = DeviceRouted(R, interpret=True)
    import jax.numpy as jnp
    y = np.asarray(D.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=1e-5, atol=1e-6)


def test_pack_unpack_roundtrip_and_save_format(tmp_path):
    """1-bit mask packing: directions are static (XOR partner side from
    bit s of the position), so pack->unpack must reproduce the signed
    masks exactly, and save/load must round-trip through the packed
    on-disk format (~8x smaller than the int8 switch array)."""
    import scipy.sparse as sp
    from tpcg.ops.route_spmv import pack_masks, unpack_masks
    from tpcg.ops.routing import RoutedSpmv, benes_strides, \
        build_routing_spmv

    rng = np.random.default_rng(3)
    n, per_row = 100, 5
    rows = np.repeat(np.arange(n), per_row)
    cols = rng.integers(0, n, n * per_row)
    A = sp.csr_matrix((rng.standard_normal(n * per_row), (rows, cols)),
                      shape=(n, n))
    R = build_routing_spmv(A)
    packed = pack_masks(R.masks)
    masks2 = unpack_masks(packed, benes_strides(R.m))
    np.testing.assert_array_equal(masks2, R.masks)

    path = str(tmp_path / "r.npz")
    R.save(path)
    z = np.load(path)
    assert "packed" in z and "masks" not in z
    R2 = RoutedSpmv.load(path)
    np.testing.assert_array_equal(R2.masks, R.masks)
    x = rng.standard_normal(n)
    # vals are stored float32: compare at f32 precision
    np.testing.assert_allclose(R2.matvec_numpy(x), A @ x, rtol=1e-4,
                               atol=1e-5 * np.abs(A @ x).max())
