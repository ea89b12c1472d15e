"""clcg-compatible API surface: column-major packing, CSR-arrays entry."""
import numpy as np
import scipy.sparse as sp

from tpcg import cg, cg_matrix, reference
from tpcg.problems import helm_fe


def spd(n=40, seed=0):
    Q = sp.random(n, n, density=0.1, random_state=seed, format="csr")
    return sp.csr_matrix(Q @ Q.T + sp.eye(n) * n)


def test_cg_csr_single_rhs():
    A = spd()
    b = np.random.default_rng(1).standard_normal(40)
    x = cg(40, A.nnz, A.data, b, A.indptr, A.indices, n_rhs=1,
           n_iterations=30)
    x_ref = reference.cg(A, b, n_iterations=30)
    np.testing.assert_allclose(x, x_ref, rtol=1e-9)


def test_cg_column_major_multi_rhs():
    """B packed v[i + r*size] like main.c:44-53; per-RHS b = (r+1)*5."""
    A = spd(36, seed=2)
    n, nrhs = 36, 3
    b = np.zeros(n * nrhs)
    for r in range(nrhs):
        b[r * n:(r + 1) * n] = (r + 1) * 5.0
    x = cg(n, A.nnz, A.data, b, A.indptr, A.indices, n_rhs=nrhs,
           n_iterations=25)
    for r in range(nrhs):
        x_ref = reference.cg(A, b[r * n:(r + 1) * n], n_iterations=25)
        np.testing.assert_allclose(x[r * n:(r + 1) * n], x_ref, rtol=1e-9)


def test_cg_complex():
    S = helm_fe(N=8, k=4.0, eps=4.0)
    A = S.to_scipy()
    n = 64
    b = (np.random.default_rng(3).standard_normal(n)
         + 1j * np.random.default_rng(4).standard_normal(n))
    x, hist = cg(n, A.nnz, A.data, b, A.indptr, A.indices, n_rhs=1,
                 n_iterations=20, record_history=True)
    x_ref, hist_ref = reference.cg(A, b, n_iterations=20, record_history=True)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8)
    np.testing.assert_allclose(hist[:, 0], hist_ref, rtol=1e-8)


def test_cg_float32_default_for_single_precision_inputs():
    A = spd(32, seed=5).astype(np.float32)
    b = np.ones(32, dtype=np.float32)
    x = cg(32, A.nnz, A.data, b, A.indptr, A.indices, n_rhs=1,
           n_iterations=10)
    assert x.dtype == np.float32


def test_cg_matrix_wrapper():
    A = spd(30, seed=6)
    b = np.random.default_rng(7).standard_normal(30)
    x = cg_matrix(A, b, n_iterations=20)
    x_ref = reference.cg(A, b, n_iterations=20)
    np.testing.assert_allclose(x, x_ref, rtol=1e-9)


def test_cg_matrix_rcm_reorder_matches_unshuffled():
    """A row/col-shuffled banded matrix must take the same RCM->DIA path
    through ``cg_matrix`` as through ``cg`` (regression: cg_matrix used to
    skip ``reorder=True`` and fall off onto the slow ELL path; results are
    permutation-invariant either way, so pin both correctness and layout)."""
    from tpcg.sparse import DiaMatrix, to_device_matrix

    A = sp.csr_matrix(sp.diags([-np.ones(99), 4 * np.ones(100),
                                -np.ones(99)], [-1, 0, 1]))
    rng = np.random.default_rng(8)
    p = rng.permutation(100)
    Ashuf = sp.csr_matrix(A[p][:, p])
    M, perm = to_device_matrix(Ashuf, reorder=True)
    assert isinstance(M, DiaMatrix) and perm is not None
    b = rng.standard_normal(100)
    x = cg_matrix(Ashuf, b, n_iterations=60)
    x_ref = reference.cg(Ashuf, b, n_iterations=60)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-10)


def test_cg_unstructured_routes_on_accelerator(monkeypatch):
    """On a non-CPU backend, genuinely unstructured matrices must take
    the routing-network SpMV through the clcg API -- real via
    ``route_fallback`` in ``to_device_matrix``, complex via
    ``routed_pair`` planes -- never the slow ELL gather path."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    rng = np.random.default_rng(11)
    n, per_row = 96, 4
    rows = np.repeat(np.arange(n), per_row)
    cols = rng.integers(0, n, n * per_row)

    # real: solution parity with the NumPy oracle
    Ar = sp.csr_matrix((rng.standard_normal(n * per_row) * 0.1,
                        (rows, cols)), shape=(n, n))
    Ar = sp.csr_matrix((Ar + Ar.T) * 0.5 + sp.eye(n) * per_row,
                       dtype=np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    x = cg(n, Ar.nnz, Ar.data, b, Ar.indptr, Ar.indices,
           n_iterations=40)
    import scipy.sparse.linalg as spla
    x_direct = spla.spsolve(Ar.tocsc().astype(np.float64),
                            b.astype(np.float64))
    np.testing.assert_allclose(x, x_direct, rtol=2e-3, atol=2e-4)

    # complex-symmetric: COCG history vs the oracle (f32 planes)
    Ac = sp.csr_matrix(
        (((rng.standard_normal(n * per_row)
           + 1j * rng.standard_normal(n * per_row)) * 0.1),
         (rows, cols)), shape=(n, n))
    Ac = sp.csr_matrix((Ac + Ac.T) * 0.5
                       + sp.eye(n) * (per_row + 0.5j)).astype(np.complex64)
    bc = (rng.standard_normal(n)
          + 1j * rng.standard_normal(n)).astype(np.complex64)
    xc, hist = cg(n, Ac.nnz, Ac.data, bc, Ac.indptr, Ac.indices,
                  n_iterations=30, record_history=True)
    _, h_ref = reference.cg(Ac.astype(np.complex128),
                            bc.astype(np.complex128),
                            n_iterations=30, record_history=True)
    h = hist.reshape(-1)
    # early iterations track the f64 oracle tightly; near the sharp
    # convergence cliff the f32 planes path lags by ~1 iteration, so
    # assert early-history parity + equally-converged tails
    pre_cliff = h_ref > 1e-3 * h_ref[0]
    rel = (np.abs(h - h_ref) / (np.abs(h_ref) + 1e-30))[pre_cliff]
    assert rel.max() < 5e-3, rel.max()
    assert h[-1] / h[0] < 1e-6 and h_ref[-1] / h_ref[0] < 1e-6


def test_cg_precomputed_routing_tables(tmp_path, monkeypatch):
    """The offline-preprocessing workflow: tables built once (``tpcg.cli
    route`` / ``RoutedSpmv.save``) feed ``cg``/``cg_matrix`` via
    ``routing=`` without any in-line ``build_routing_spmv`` call."""
    import tpcg.api as api_mod
    from tpcg.ops.routing import build_routing_spmv

    rng = np.random.default_rng(17)
    n, per_row = 96, 4
    rows = np.repeat(np.arange(n), per_row)
    cols = rng.integers(0, n, n * per_row)
    Ar = sp.csr_matrix((rng.standard_normal(n * per_row) * 0.1,
                        (rows, cols)), shape=(n, n))
    Ar = sp.csr_matrix((Ar + Ar.T) * 0.5 + sp.eye(n) * per_row,
                       dtype=np.float32)
    R = build_routing_spmv(Ar)
    path = str(tmp_path / "routed.npz")
    R.save(path)

    # any further in-line build is a failure of the hook
    def _boom(*a, **k):
        raise AssertionError("routing rebuilt despite routing= operand")
    monkeypatch.setattr("tpcg.ops.routing.build_routing_spmv", _boom)
    monkeypatch.setattr("tpcg.api.to_device_matrix",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("to_device_matrix called")))

    b = rng.standard_normal(n).astype(np.float32)
    x = api_mod.cg(n, Ar.nnz, Ar.data, b, Ar.indptr, Ar.indices,
                   n_iterations=40, routing=path)
    import scipy.sparse.linalg as spla
    x_direct = spla.spsolve(Ar.tocsc().astype(np.float64),
                            b.astype(np.float64))
    np.testing.assert_allclose(x, x_direct, rtol=2e-3, atol=2e-4)

    # the in-memory object works through cg_matrix too (complex RHS ->
    # f32-planes routed solve)
    bc = (rng.standard_normal(n)
          + 1j * rng.standard_normal(n)).astype(np.complex64)
    xc = api_mod.cg_matrix(Ar, bc, n_iterations=40, routing=R)
    xc_direct = spla.spsolve(Ar.tocsc().astype(np.float64),
                             bc.astype(np.complex128))
    np.testing.assert_allclose(xc, xc_direct, rtol=3e-3, atol=3e-4)

    # size mismatch is a clear error, not a shape crash
    import pytest
    with pytest.raises(ValueError, match="routing tables"):
        api_mod.cg(n - 1, Ar.nnz, Ar.data, b[:-1], Ar.indptr,
                   Ar.indices, n_iterations=2, routing=R)


def test_cg_matrix_real_routed_complex_rhs(monkeypatch):
    """Real unstructured matrix + complex RHS on an accelerator: the
    DeviceRouted operand must wrap into a real-only PairOperator (two
    independent real routed SpMVs), not crash in make_pair_operator."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(13)
    n, per_row = 80, 4
    rows = np.repeat(np.arange(n), per_row)
    cols = rng.integers(0, n, n * per_row)
    Ar = sp.csr_matrix((rng.standard_normal(n * per_row) * 0.1,
                        (rows, cols)), shape=(n, n))
    Ar = sp.csr_matrix((Ar + Ar.T) * 0.5 + sp.eye(n) * per_row,
                       dtype=np.float32)
    bc = (rng.standard_normal(n)
          + 1j * rng.standard_normal(n)).astype(np.complex64)
    x = cg_matrix(Ar, bc, n_iterations=40)
    import scipy.sparse.linalg as spla
    x_direct = spla.spsolve(Ar.tocsc().astype(np.float64),
                            bc.astype(np.complex128))
    np.testing.assert_allclose(x, x_direct, rtol=3e-3, atol=3e-4)
