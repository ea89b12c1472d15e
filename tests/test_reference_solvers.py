"""Validation of the NumPy oracle solvers against literal ports of the
reference's sweep loops, plus the pcg preconditioner-dispatch arms.

``reference.gauss_seidel`` reimplements ``GaussSeidel``/``SymmGaussSeidel``
(``helmFE_var.py:391-505``) with triangular solves; the tests below pin it
iterate-by-iterate against a literal transcription of the reference's
COO-entry sweeps (valid for matrices whose every row has at least one
off-diagonal entry -- true for all FE matrices; the reference's entry loop
skips purely-diagonal rows).
"""
import numpy as np
import scipy.sparse as sp

from tpcg import reference
from tpcg.problems import helm_fe, poisson, rhs_all_boundaries_k2


def _literal_gs_sweeps(Acoo, b, maxit, symmetric=False):
    """Literal port of the reference's in-place COO sweeps
    (``helmFE_var.py:391-439`` forward, ``:441-505`` +backward)."""
    Acoo = sp.coo_matrix(Acoo)
    rowinds, colinds, vals = Acoo.row, Acoo.col, Acoo.data
    diag = Acoo.diagonal()
    off = colinds != rowinds
    rowinds, colinds, vals = rowinds[off], colinds[off], vals[off]
    n_off = len(vals)
    N = Acoo.shape[0]
    x = b.copy()
    for _ in range(maxit):
        i_prev = -1
        for h in range(n_off):
            i, j = rowinds[h], colinds[h]
            if i == i_prev:
                x[i] = x[i] - vals[h] * x[j]
            else:
                if i_prev > -1:
                    x[i_prev] = x[i_prev] / diag[i_prev]
                x[i] = b[i] - vals[h] * x[j]
            i_prev = i
        x[i] = x[i] / diag[i]
        if symmetric:
            i_prev = N
            for h in range(n_off - 1, -1, -1):
                i, j = rowinds[h], colinds[h]
                if i == i_prev:
                    x[i] = x[i] - vals[h] * x[j]
                else:
                    if i_prev < N:
                        x[i_prev] = x[i_prev] / diag[i_prev]
                    x[i] = b[i] - vals[h] * x[j]
                i_prev = i
            x[i] = x[i] / diag[i]
    return x


def test_gauss_seidel_forward_matches_literal_port():
    S = poisson(8)
    A = S.to_scipy()
    b = np.arange(1.0, 65.0)
    for it in (1, 3, 7):
        ours = reference.gauss_seidel(A, b, maxit=it, sweeps="forward")
        lit = _literal_gs_sweeps(A, b, maxit=it)
        np.testing.assert_allclose(ours, lit, rtol=1e-12, atol=1e-12)


def test_gauss_seidel_symmetric_matches_literal_port_complex():
    S = helm_fe(N=8, k=3.0, eps=3.0)
    A = S.to_scipy()
    b = rhs_all_boundaries_k2(8, 3.0).reshape(-1)
    for it in (1, 3):
        ours = reference.gauss_seidel(A, b, maxit=it, sweeps="symmetric")
        lit = _literal_gs_sweeps(A, b, maxit=it, symmetric=True)
        np.testing.assert_allclose(ours, lit, rtol=1e-11, atol=1e-11)


def _spd(n=48, seed=0):
    Q = sp.random(n, n, density=0.1, random_state=seed, format="csr")
    return sp.csr_matrix(Q @ Q.T + n * sp.eye(n))


def test_pcg_sparse_preconditioner_spsolve_arm():
    """Sparse M with off-diagonal content -> direct spsolve arm
    (``helmFE_var.py:556-560``)."""
    A = _spd(48, seed=1)
    b = np.random.default_rng(2).standard_normal(48)
    # incomplete-factor-ish preconditioner: tridiagonal part of A
    M = sp.csr_matrix(sp.diags(
        [A.diagonal(-1), A.diagonal(), A.diagonal(1)], [-1, 0, 1]))
    assert M.nnz > M.shape[0]
    x, its = reference.pcg(A, b, M=M, tol=1e-10, maxit=300)
    assert np.linalg.norm(A @ x - b) < 1e-9
    _, its_plain = reference.pcg(A, b, tol=1e-10, maxit=300)
    assert its <= its_plain


def test_pcg_diagonal_matvec_arm():
    """Sparse M with nnz <= n -> applied as a matvec (Jacobi-style)."""
    A = _spd(48, seed=3)
    b = np.random.default_rng(4).standard_normal(48)
    M = sp.csr_matrix(sp.diags(1.0 / A.diagonal()))
    assert M.nnz <= M.shape[0]
    x, _ = reference.pcg(A, b, M=M, tol=1e-10, maxit=300)
    assert np.linalg.norm(A @ x - b) < 1e-9


def test_pcg_float_inner_cg_arm():
    """Float M -> inner early-exit CG at that tolerance
    (``helmFE_var.py:561-562``)."""
    A = _spd(40, seed=5)
    b = np.random.default_rng(6).standard_normal(40)
    x, its = reference.pcg(A, b, M=1e-6, tol=1e-9, maxit=50)
    assert np.linalg.norm(A @ x - b) < 1e-8
    assert its <= 3          # near-exact inner solves converge immediately


def test_pcg_callable_arm():
    A = _spd(40, seed=7)
    b = np.random.default_rng(8).standard_normal(40)
    dinv = 1.0 / A.diagonal()
    x, _ = reference.pcg(A, b, M=lambda r: dinv * r, tol=1e-10, maxit=300)
    assert np.linalg.norm(A @ x - b) < 1e-9
