"""Matrix Market ingestion: native C++ parser == scipy, symmetric
expansion, dtype handling (replaces BeBOP, main.c:20-33)."""
import os
import tempfile

import numpy as np
import pytest
import scipy.io
import scipy.sparse as sp

from tpcg.io import load_matrix_market
from tpcg.native import mtx_native


@pytest.fixture(scope="module")
def mtx_dir():
    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(0)
        A = sp.random(60, 60, density=0.1, random_state=1, format="coo")
        A = A + A.T
        scipy.io.mmwrite(os.path.join(d, "sym.mtx"), A,
                         symmetry="symmetric")
        C = sp.random(40, 40, density=0.1, random_state=2, format="coo")
        C = C + 1j * sp.random(40, 40, density=0.1, random_state=3,
                               format="coo")
        H = C + C.conj().T
        scipy.io.mmwrite(os.path.join(d, "herm.mtx"), H)
        G = sp.random(50, 50, density=0.08, random_state=4, format="coo")
        scipy.io.mmwrite(os.path.join(d, "gen.mtx"), G)
        yield d


def test_native_parser_builds():
    assert mtx_native.available()


@pytest.mark.parametrize("name", ["sym.mtx", "herm.mtx", "gen.mtx"])
def test_native_matches_scipy(mtx_dir, name):
    path = os.path.join(mtx_dir, name)
    ref = sp.csr_matrix(scipy.io.mmread(path))
    ref.sort_indices()
    got = mtx_native.load(path)
    assert got is not None
    assert got.shape == ref.shape and got.nnz == ref.nnz
    assert abs(got - ref).max() < 1e-14


def test_load_matrix_market_dtype_downcast(mtx_dir):
    # main.c:50-53: double -> float (complex) downcast at the boundary
    A = load_matrix_market(os.path.join(mtx_dir, "sym.mtx"),
                           dtype=np.float32)
    assert A.dtype == np.float32
    H = load_matrix_market(os.path.join(mtx_dir, "herm.mtx"),
                           dtype=np.complex64)
    assert H.dtype == np.complex64
    # hermitian expansion materialised both triangles
    assert abs(H - H.conj().T).max() < 1e-6


def test_native_rejects_garbage(tmp_path):
    p = tmp_path / "bad.mtx"
    p.write_text("this is not a matrix market file\n1 2 3\n")
    assert mtx_native.load(str(p)) is None
    # loader falls back to scipy, which raises
    with pytest.raises(Exception):
        load_matrix_market(str(p))
