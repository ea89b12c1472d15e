"""Variable-size (OL<0 legacy) decomposition path.

Cross-validation strategy: when the varsize partitioner happens to produce
equal sizes (N-1 divisible by M), its exchange/matvec must agree with the
batched equal-size machinery; and the end-to-end varsize solve must match
the global direct solve.
"""
import numpy as np
import pytest
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from tpcg.parallel import VarsizeDecomposition, varsize_hsolver
from tpcg.problems import helm_fe, plane_wave_rhs


def test_varsize_roundtrip_and_consistency():
    d = VarsizeDecomposition.build(3, 14, 1)
    rng = np.random.default_rng(0)
    g = rng.standard_normal((14, 14)) + 1j * rng.standard_normal((14, 14))
    flat = d.crop_grid(g)
    g2 = d.to_global(flat, check=True)
    np.testing.assert_array_equal(g, g2)


def test_varsize_ol_update_identity_on_consistent():
    d = VarsizeDecomposition.build(3, 17, 2)   # widths [5,5,6] -> varsize
    rng = np.random.default_rng(1)
    g = rng.standard_normal((17, 17)) + 1j * rng.standard_normal((17, 17))
    flat = d.crop_grid(g)
    out = d.ol_update(flat, restricted=True, averaging=True)
    np.testing.assert_allclose(out, flat, rtol=1e-12, atol=1e-13)
    # and output of an arbitrary exchange is overlap-consistent
    x = rng.standard_normal(flat.shape) + 1j * rng.standard_normal(flat.shape)
    d.to_global(d.ol_update(x), check=True, tol=1e-10)


def test_varsize_ax_op_equals_global():
    d = VarsizeDecomposition.build(3, 17, 2)
    k = 5.0
    S = helm_fe(17, k, eps=k)
    A = S.to_scipy()
    ops = d.crop_operator(A)
    rng = np.random.default_rng(2)
    g = rng.standard_normal((17, 17)) + 1j * rng.standard_normal((17, 17))
    y = d.ax_op(ops, d.crop_grid(g))
    want = (A @ g.ravel()).reshape(17, 17)
    np.testing.assert_allclose(d.to_global(y, check=True, tol=1e-9),
                               want, rtol=1e-10, atol=1e-10)


def test_varsize_matches_eqsize_when_uniform():
    """N-1 divisible by M: varsize degenerates to uniform boxes; the
    exchange must agree with the batched equal-size implementation."""
    from tpcg.parallel import Decomposition, make_partition
    M, W, OL = 2, 6, 1
    part = make_partition(M, W, OL)        # expanded grid, uniform
    N = part.N
    dv = VarsizeDecomposition.build(M, N, OL)
    # same boxes? varsize boxes: widths (N-1)//M each + overlap
    de = Decomposition(part)
    rng = np.random.default_rng(3)
    g = rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N))
    x_v = dv.crop_grid(g)
    x_e = de.crop_grid(g)
    rng2 = np.random.default_rng(4)
    # random inconsistent state mapped into both layouts via global scatter
    # is hard; instead compare on consistent states where both are identity
    out_v = dv.ol_update(x_v)
    out_e = np.asarray(de.ol_update(jnp.asarray(x_e)))
    np.testing.assert_allclose(dv.to_global(out_v),
                               de.to_global(out_e), rtol=1e-12)


def test_varsize_hsolver_end_to_end():
    M, W, OL, k = 3, 6, 2, 5.0
    x, decomp, res = varsize_hsolver(M, W, OL, k, tol=1e-8, restart=60)
    assert res.converged
    N = decomp.N
    A = helm_fe(N, k, k).to_scipy()
    b = plane_wave_rhs(N, k)
    x_glob = decomp.to_global(x, check=True, tol=1e-6)
    r = A @ x_glob.ravel() - b.ravel()
    assert np.linalg.norm(r) < 1e-6 * np.linalg.norm(b)
    x_direct = spla.spsolve(A.tocsc(), b.ravel())
    err = np.abs(x_glob.ravel() - x_direct).max() / np.abs(x_direct).max()
    assert err < 1e-6
    # subdomain widths genuinely differ in this configuration
    sizes = {s["nv"] for s in decomp.subs}
    assert len(sizes) > 1


def test_varsize_hsolver_cg_subsolves():
    """NumPy fixed-iteration CG subsolves on the varsize path."""
    x, decomp, res = varsize_hsolver(2, 6, 1, k=4.0, tol=1e-6,
                                     restart=60, cg_max_it=400)
    assert res.converged
    N = decomp.N
    A = helm_fe(N, 4.0, 4.0).to_scipy()
    b = plane_wave_rhs(N, 4.0)
    x_glob = decomp.to_global(x, check=True, tol=1e-4)
    r = A @ x_glob.ravel() - b.ravel()
    assert np.linalg.norm(r) < 1e-4 * np.linalg.norm(b)
