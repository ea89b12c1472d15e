"""Native routing preprocessor (tpcg/native/routing_builder.cpp) vs the
Python reference implementation (tpcg/ops/routing.py).

Contract: any valid decomposition + mask set routes correctly -- layer
assignments may differ between the two builders, the resulting matvec
must match scipy exactly.
"""
import numpy as np
import pytest
import scipy.sparse as sp

from tpcg.native import routing_native
from tpcg.ops.routing import (apply_benes_numpy, build_routing_spmv)

pytestmark = pytest.mark.skipif(not routing_native.available(),
                                reason="g++/native build unavailable")


def _rand(n, per_row, seed=0, complex_=False):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), per_row)
    cols = rng.integers(0, n, n * per_row)
    v = rng.standard_normal(n * per_row)
    if complex_:
        v = v + 1j * rng.standard_normal(n * per_row)
    return sp.coo_matrix((v, (rows, cols)), shape=(n, n)).tocsr()


@pytest.mark.parametrize("n,per_row,complex_", [
    (50, 3, False), (300, 5, False), (777, 4, True), (1024, 8, False)])
def test_native_build_matvec_parity(n, per_row, complex_):
    A = _rand(n, per_row, seed=n, complex_=complex_)
    R = build_routing_spmv(A, native=True)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n)
    if complex_:
        x = x + 1j * rng.standard_normal(n)
    y = R.matvec_numpy(x)
    np.testing.assert_allclose(y, A @ x, rtol=1e-5, atol=1e-6)


def test_native_masks_route_permutations():
    """Every per-layer mask set must implement its layer's permutation
    exactly (checked through the shared runtime semantics simulator)."""
    A = _rand(200, 4, seed=7)
    R = build_routing_spmv(A, native=True)
    # reconstruct each layer's value-weighted route against the direct
    # per-layer product
    rng = np.random.default_rng(3)
    x = rng.standard_normal(R.m)
    acc = np.zeros(R.m)
    for l in range(R.n_layers):
        acc += R.vals[l] * apply_benes_numpy(R.masks[l], x)
    y_direct = A @ x[:200]
    np.testing.assert_allclose(acc[:200], y_direct, rtol=1e-6, atol=1e-8)


def test_native_vs_python_same_operator():
    A = _rand(300, 5, seed=11)
    Rn = build_routing_spmv(A, native=True)
    Rp = build_routing_spmv(A, native=False)
    x = np.random.default_rng(4).standard_normal(300)
    np.testing.assert_allclose(Rn.matvec_numpy(x), Rp.matvec_numpy(x),
                               rtol=1e-6, atol=1e-8)
    # similar decomposition quality (layer count within 25%)
    assert Rn.n_layers <= 1.25 * Rp.n_layers + 2
