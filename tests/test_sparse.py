"""Container correctness: matvec/SpMM equivalence against scipy."""
import numpy as np
import pytest
import scipy.sparse as sp

from tpcg.sparse import DiaMatrix, EllMatrix, Stencil2D, to_device_matrix
from tpcg.problems import helm_fe, poisson


def random_banded(n, offsets, dtype, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for off in offsets:
        i = np.arange(max(0, -off), min(n, n - off))
        rows.append(i)
        cols.append(i + off)
        v = rng.standard_normal(len(i))
        if np.issubdtype(dtype, np.complexfloating):
            v = v + 1j * rng.standard_normal(len(i))
        vals.append(v)
    return sp.csr_matrix(
        (np.concatenate(vals).astype(dtype),
         (np.concatenate(rows), np.concatenate(cols))), shape=(n, n))


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_dia_matvec(dtype):
    A = random_banded(50, [-7, -1, 0, 1, 7], dtype)
    D = DiaMatrix.from_scipy(A)
    x = np.random.default_rng(1).standard_normal(50).astype(dtype)
    np.testing.assert_allclose(np.asarray(D.matvec(x)), A @ x, rtol=1e-12)
    # multi-RHS
    X = np.random.default_rng(2).standard_normal((50, 4)).astype(dtype)
    np.testing.assert_allclose(np.asarray(D.matvec(X)), A @ X, rtol=1e-12)
    # roundtrip
    assert (D.to_scipy() - A).nnz == 0 or abs(D.to_scipy() - A).max() < 1e-14


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_ell_matvec(dtype):
    rng = np.random.default_rng(3)
    A = sp.random(60, 60, density=0.1, random_state=5, format="csr")
    A = A.astype(dtype)
    if np.issubdtype(dtype, np.complexfloating):
        A = A + 1j * sp.random(60, 60, density=0.1, random_state=7,
                               format="csr").astype(dtype)
    A = sp.csr_matrix(A + sp.eye(60, dtype=dtype))
    E = EllMatrix.from_scipy(A)
    x = rng.standard_normal(60).astype(dtype)
    np.testing.assert_allclose(np.asarray(E.matvec(x)), A @ x, rtol=1e-12)
    X = rng.standard_normal((60, 3)).astype(dtype)
    np.testing.assert_allclose(np.asarray(E.matvec(X)), A @ X, rtol=1e-12)


def test_ell_from_csr_arrays():
    A = random_banded(40, [-5, 0, 2], np.float64)
    E = EllMatrix.from_csr_arrays(40, A.data, A.indptr, A.indices)
    x = np.arange(40, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(E.matvec(x)), A @ x, rtol=1e-12)


def test_stencil_equals_dia_equals_csr():
    S = helm_fe(N=9, k=5.0, eps=5.0)
    D = S.to_dia()
    C = S.to_scipy()
    x = (np.random.default_rng(0).standard_normal(81)
         + 1j * np.random.default_rng(1).standard_normal(81))
    y_c = C @ x
    np.testing.assert_allclose(np.asarray(S.matvec(x)), y_c, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(D.matvec(x)), y_c, rtol=1e-12)
    # grid-shaped batched apply
    xg = x.reshape(1, 9, 9)
    np.testing.assert_allclose(
        np.asarray(S.apply_grid(xg)).reshape(-1), y_c, rtol=1e-12)


def test_stencil_multirhs():
    S = poisson(8)
    C = S.to_scipy()
    X = np.random.default_rng(4).standard_normal((64, 5))
    np.testing.assert_allclose(np.asarray(S.matvec(X)), C @ X, rtol=1e-12)


def test_to_device_matrix_picks_dia_for_banded():
    A = helm_fe(N=12, k=3.0, eps=3.0).to_scipy()
    M = to_device_matrix(A)
    assert isinstance(M, DiaMatrix)
    G = sp.random(200, 200, density=0.05, random_state=0, format="csr")
    G = sp.csr_matrix(G + sp.eye(200))
    M2 = to_device_matrix(G)
    assert isinstance(M2, EllMatrix)


def test_rcm_reorder_recovers_banded():
    """A permuted banded matrix must come back as DIA via RCM, and CG
    through the public API must be transparent to the reordering."""
    import numpy as np
    rng = np.random.default_rng(7)
    n = 200
    A = random_banded(n, [-3, -1, 0, 1, 3], np.float64, seed=9)
    A = sp.csr_matrix(A + A.T + sp.eye(n) * 20)
    p = rng.permutation(n)
    P = sp.csr_matrix((np.ones(n), (np.arange(n), p)), shape=(n, n))
    A_shuf = sp.csr_matrix(P @ A @ P.T)     # scrambled: not banded anymore
    M, perm = to_device_matrix(A_shuf, reorder=True)
    assert isinstance(M, DiaMatrix) and perm is not None

    from tpcg import cg as api_cg, reference
    b = rng.standard_normal(n)
    x = api_cg(n, A_shuf.nnz, A_shuf.data, b, A_shuf.indptr,
               A_shuf.indices, n_rhs=1, n_iterations=30)
    x_ref = reference.cg(A_shuf, b, n_iterations=30)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-10)


def test_reorder_falls_back_to_ell_for_random():
    A = sp.random(300, 300, density=0.05, random_state=3, format="csr")
    A = sp.csr_matrix(A + A.T + sp.eye(300))
    M, perm = to_device_matrix(A, reorder=True)
    assert isinstance(M, EllMatrix) and perm is None
