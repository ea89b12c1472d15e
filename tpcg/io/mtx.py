"""Matrix Market ingestion.

Replaces the reference's BeBOP Sparse Matrix Converter dependency
(``main.c:8-33``: ``load_sparse_matrix`` + ``sparse_matrix_expand_symmetric_
storage`` + CSR conversion + double->float-complex downcast).  A native C++
fast-path parser lives in ``tpcg/native`` (built on demand); scipy's
``mmread`` is the always-available fallback.  Both produce identical CSR.
"""
from __future__ import annotations

import numpy as np


def load_matrix_market(path: str, dtype=None, expand_symmetric: bool = True):
    """Load a Matrix Market file to CSR.

    ``expand_symmetric`` mirrors ``sparse_matrix_expand_symmetric_storage``
    (``main.c:25``): scipy's mmread already materialises both triangles for
    symmetric/hermitian files, so this flag only exists for API parity.
    ``dtype`` downcasts like ``main.c:50-53`` (double -> float complex).
    """
    import scipy.io
    import scipy.sparse as sp

    from ..native import mtx_native
    A = None
    if mtx_native.available():
        A = mtx_native.load(path)
    if A is None:
        A = scipy.io.mmread(path)
    A = sp.csr_matrix(A)
    if dtype is not None:
        A = A.astype(dtype)
    A.sort_indices()
    return A
