"""VMEM-resident multi-iteration REAL streaming CG
(``tpcg.ops.stream_cg_v4_real``) vs the v2 real streaming kernels --
bit-exact at matched block_rows, across chunk boundaries and both
q-handling modes.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpcg.ops.stream_cg_real import (prepare_stream_real,
                                     prepare_stream_coef_real,
                                     stream_cg_real_planes,
                                     stream_cg_real_coef_planes)
from tpcg.ops.stream_cg_v4_real import (stream_cg_v4_real_planes,
                                        stream_cg_v4_real_coef_planes)
from tpcg.problems import poisson


def _problem(N):
    A = poisson(N, dtype=np.float64)
    rng = np.random.default_rng(5)
    b = rng.standard_normal((N, N)).astype(np.float32)
    x0 = 0.1 * rng.standard_normal((N, N)).astype(np.float32)
    return A, jnp.asarray(b), jnp.asarray(x0)


@pytest.mark.parametrize("keep_q,chunk", [(True, 64), (False, 64),
                                          (False, 6)])
def test_stream_v4_real_bit_matches_v2(keep_q, chunk):
    N, iters = 64, 15
    A, bp, x0p = _problem(N)
    taps, strips2 = prepare_stream_real(A)
    x2, h2 = stream_cg_real_planes(A.offsets, A.grid, taps, strips2,
                                   bp, x0p, iters, interpret=True)
    x4, h4 = stream_cg_v4_real_planes(A.offsets, A.grid, taps, strips2,
                                      bp, x0p, iters, keep_q=keep_q,
                                      chunk=chunk, interpret=True)
    np.testing.assert_array_equal(np.asarray(x4), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(h4), np.asarray(h2))


@pytest.mark.parametrize("chunk", [64, 7])
def test_stream_v4_real_coef_bit_matches_v2(chunk):
    N, iters = 64, 15
    A, bp, x0p = _problem(N)
    coefp = prepare_stream_coef_real(A)
    x2, h2 = stream_cg_real_coef_planes(A.offsets, A.grid, coefp, bp,
                                        x0p, iters, interpret=True)
    x4, h4 = stream_cg_v4_real_coef_planes(A.offsets, A.grid, coefp,
                                           bp, x0p, iters, chunk=chunk,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(x4), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(h4), np.asarray(h2))


def test_stream_v4_real_q_hbm_oracle():
    """Real q_hbm tier (explicit-DMA q round-trip) solves correctly
    through the exact scipy operator (elementwise arithmetic identical
    to the recompute tier; histories differ only by interpret-mode
    reduction reassociation -- bit-exact on HW)."""
    N, iters = 64, 250
    A, bp, x0p = _problem(N)
    x, hist = stream_cg_v4_real_planes(
        A.offsets, A.grid, *prepare_stream_real(A), bp, x0p, iters,
        keep_q=False, q_hbm=True, interpret=True)
    S = A.to_scipy().tocsr()
    r = np.linalg.norm(S @ np.asarray(x).reshape(-1)
                       - np.asarray(bp).reshape(-1))
    assert r < 1e-3 * np.linalg.norm(np.asarray(bp)), r


def test_stream_v4_real_oracle():
    """Solution correctness through the exact scipy operator."""
    N, iters = 64, 250
    A, bp, x0p = _problem(N)
    x, hist = stream_cg_v4_real_planes(
        A.offsets, A.grid, *prepare_stream_real(A), bp, x0p, iters,
        interpret=True)
    S = A.to_scipy().tocsr()
    r = np.linalg.norm(S @ np.asarray(x).reshape(-1)
                       - np.asarray(bp).reshape(-1))
    assert r < 1e-3 * np.linalg.norm(np.asarray(bp)), r
