"""Assembly correctness.

The vectorized stencil assembler is validated against an independent
element-by-element P1 finite-element assembly written from first principles
(exact element stiffness/mass/boundary matrices), plus literal spot-checks
of the reference's published per-node coefficients
(``helmFE_var.py:77-323``, ``p_h-PY_C-CL-multi-GPU.py:1490-1632``).
"""
import numpy as np
import pytest
import scipy.sparse as sp

from tpcg.problems import (helm_fe, helm_fe_var, local_rect, poisson,
                           plane_wave_rhs, rhs_all_boundaries_k2, rhs_left_k2)


def fem_oracle(h, mass_sq, bnd_sq):
    """Element-by-element P1 assembly of S = K - M - i*B on the triangulated
    square mesh (SW-NE diagonals).  Slow loops; ground truth for tests."""
    nv, nh = mass_sq.shape[0] + 1, mass_sq.shape[1] + 1
    n = nv * nh
    S = sp.lil_matrix((n, n), dtype=np.complex128)

    def idx(m, j):
        return m * nh + j

    # element matrices for a right isoceles triangle, legs h, vertex order
    # (right-angle vertex, leg neighbour 1, leg neighbour 2):
    K = 0.5 * np.array([[2, -1, -1], [-1, 1, 0], [-1, 0, 1]], dtype=float)
    M = (h * h / 24.0) * np.array([[2, 1, 1], [1, 2, 1], [1, 1, 2]],
                                  dtype=float)
    for ms in range(nv - 1):
        for js in range(nh - 1):
            bl, br = idx(ms, js), idx(ms, js + 1)
            tl, tr = idx(ms + 1, js), idx(ms + 1, js + 1)
            for tri in ([br, bl, tr], [tl, bl, tr]):   # right angle first
                for a in range(3):
                    for b in range(3):
                        S[tri[a], tri[b]] += K[a, b] - mass_sq[ms, js] * M[a, b]
    # boundary mass: edge matrix (h/6)[[2,1],[1,2]] * i * bnd(adjacent square)
    B = (h / 6.0) * np.array([[2, 1], [1, 2]], dtype=float)
    edges = []
    for js in range(nh - 1):                          # bottom / top sides
        edges.append(((idx(0, js), idx(0, js + 1)), bnd_sq[0, js]))
        edges.append(((idx(nv - 1, js), idx(nv - 1, js + 1)),
                      bnd_sq[nv - 2, js]))
    for ms in range(nv - 1):                          # left / right sides
        edges.append(((idx(ms, 0), idx(ms + 1, 0)), bnd_sq[ms, 0]))
        edges.append(((idx(ms, nh - 1), idx(ms + 1, nh - 1)),
                      bnd_sq[ms, nh - 2]))
    for (p, q), coeff in edges:
        for a, na in enumerate((p, q)):
            for b, nb in enumerate((p, q)):
                S[na, nb] += -1j * coeff * B[a, b]
    return sp.csr_matrix(S)


def test_helm_fe_var_matches_fem_oracle():
    N, omega, rho = 7, 9.0, 0.15
    rng = np.random.default_rng(0)
    C = 0.5 + rng.random((N - 1, N - 1))
    S = helm_fe_var(N, omega, C, rho).to_scipy()
    k = omega / C
    oracle = fem_oracle(1.0 / (N - 1.0), (1.0 + 1j * rho) * k ** 2, k)
    assert abs(S - oracle).max() < 1e-12


def test_helm_fe_var_rectangular():
    Nh, Nv, N, omega, rho = 6, 9, 11, 4.0, 0.2
    rng = np.random.default_rng(1)
    C = 0.5 + rng.random((Nv - 1, Nh - 1))
    S = helm_fe_var(N, omega, C, rho, Nhoriz=Nh, Nvert=Nv).to_scipy()
    k = omega / C
    oracle = fem_oracle(1.0 / (N - 1.0), (1.0 + 1j * rho) * k ** 2, k)
    assert abs(S - oracle).max() < 1e-12


def test_local_rect_matches_fem_oracle():
    N, k, eps, eta = 13, 7.0, 4.0, 7.0
    Nh, Nv = 5, 8
    S = local_rect(N, k, eps, eta, L=1.0, Nhoriz=Nh, Nvert=Nv).to_scipy()
    mass = np.full((Nv - 1, Nh - 1), k * k + 1j * eps)
    bnd = np.full((Nv - 1, Nh - 1), eta)
    oracle = fem_oracle(1.0 / (N - 1.0), mass, bnd)
    assert abs(S - oracle).max() < 1e-12


def test_reference_coefficient_spot_checks():
    """Literal per-entry formulas from the reference sources."""
    N, k, eps, eta = 9, 5.0, 3.0, 5.0
    h = 1.0 / (N - 1.0)
    h2 = h * h
    m = k * k + 1j * eps
    A = local_rect(N, k, eps, eta).to_scipy().todense()

    def e(mm, jj):
        return mm * N + jj

    # p_h-PY_C-CL-multi-GPU.py:1493 (corner diag), 1516 (edge), 1526 (interior)
    assert np.isclose(A[e(0, 0), e(0, 0)],
                      1.0 - m * h2 / 6.0 - 1j * eta * 2 * h / 3.0)
    assert np.isclose(A[e(0, 4), e(0, 4)],
                      2.0 - m * h2 / 4.0 - 2j * eta * h / 3.0)
    assert np.isclose(A[e(4, 4), e(4, 4)], 4.0 - m * h2 / 2.0)
    # :1499 bottom-right corner diag has /12 mass weight
    assert np.isclose(A[e(0, N - 1), e(0, N - 1)],
                      1.0 - m * h2 / 12.0 - 1j * eta * 2 * h / 3.0)
    # :1542 bottom-row E link; :1548 bottom NE link; :1606 interior E link
    assert np.isclose(A[e(0, 3), e(0, 4)],
                      -0.5 - m * h2 / 24.0 - 1j * eta * h / 6.0)
    assert np.isclose(A[e(0, 3), e(1, 4)], -m * h2 / 12.0)
    assert np.isclose(A[e(3, 3), e(3, 4)], -1.0 - m * h2 / 12.0)
    # :1627 interior SW link
    assert np.isclose(A[e(3, 3), e(2, 2)], -m * h2 / 12.0)
    # no NW / SE diagonal links in this triangulation
    assert A[e(3, 3), e(4, 2)] == 0.0
    assert A[e(3, 3), e(2, 4)] == 0.0

    # helmFE_var.py:81 corner diag with variable coefficients
    omega, rho = 7.0, 0.15
    C = np.full((N - 1, N - 1), 1.3)
    kv = omega / 1.3
    Av = helm_fe_var(N, omega, C, rho).to_scipy().todense()
    assert np.isclose(Av[0, 0], 1.0 - (1 + 1j * rho) * kv ** 2 * h2 / 6.0
                      - 1j * kv * 2 * h / 3.0)


def test_helm_fe_is_complex_symmetric_not_hermitian():
    A = helm_fe(N=10, k=6.0, eps=6.0).to_scipy()
    assert abs(A - A.T).max() < 1e-13           # complex symmetric
    assert abs(A - A.conj().T).max() > 1e-3     # NOT hermitian


def test_poisson():
    N = 6
    A = poisson(N).to_scipy().todense()
    # p_h-PY_C-CL-multi-GPU.py:1637-1677: diag 4, N/S/E/W -1
    assert np.all(np.diag(A) == 4.0)
    assert A[0, 1] == -1.0 and A[0, N] == -1.0
    assert A[7, 6] == -1.0 and A[7, 8] == -1.0
    assert A[7, 1] == -1.0 and A[7, 13] == -1.0
    assert A[N - 1, N] == 0.0                   # no wraparound
    row_interior = np.asarray(A[7]).ravel()
    assert np.count_nonzero(row_interior) == 5
    assert (A == A.T).all()


def test_plane_wave_rhs_values():
    """Independent quadrature check of a few nodes."""
    N, k = 8, 5.0
    h = 1.0 / (N - 1)
    a = np.array([1.0, 1.0]) / np.sqrt(2.0)
    b = plane_wave_rhs(N, k)

    def g(p):
        return np.exp(1j * k * (p @ a))

    x = np.linspace(0, 1, N)
    y = (x[1:] + x[:-1]) / 2
    multbot = 1j * k * (-a[1] - 1.0)
    j = 3
    expect = (h / 3.0) * multbot * (g(np.array([y[j - 1], 0.0]))
                                    + g(np.array([x[j], 0.0]))
                                    + g(np.array([y[j], 0.0])))
    assert np.isclose(b[0, j], expect)
    multleft = 1j * k * (-a[0] - 1.0)
    expect_corner = ((h / 6.0) * multleft * (2 * g(np.array([0.0, y[0]]))
                                             + g(np.array([0.0, 0.0])))
                     + (h / 6.0) * multbot * (2 * g(np.array([y[0], 0.0]))
                                              + g(np.array([0.0, 0.0]))))
    assert np.isclose(b[0, 0], expect_corner)
    # symmetric direction => symmetric rhs under transpose
    assert np.allclose(b, b.T)


def test_simple_rhs():
    N, k = 7, 3.0
    bl = rhs_left_k2(N, k)
    assert np.all(bl[1:N - 1, 0] == k * k) and bl[0, 0] == 0
    ba = rhs_all_boundaries_k2(N, k)
    assert np.all(ba[0, :] == k * k) and np.all(ba[:, -1] == k * k)
    assert np.all(ba[1:-1, 1:-1] == 0)
