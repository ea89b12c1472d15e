"""VMEM-resident multi-iteration streaming CG (``tpcg.ops.stream_cg_v4``).

v4 runs K iterations per pallas call with the whole CG state in VMEM
scratch; its arithmetic is bit-identical to the v2 two-kernel iteration
(same block order, same accumulation order, same freeze guard), which
these tests pin exactly -- including across chunk boundaries (state
round-trips HBM between chunks) and for both q-handling modes (resident
vs recomputed-in-phase-1).

Reference semantics under test: COCG unconjugated dots
(``kernel/complex/vdot.cl:15``), fixed iteration count (``clcg.c:297``).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpcg.ops.stream_cg import (prepare_stream, prepare_stream_coef,
                                stream_cg_const_planes,
                                stream_cg_coef_planes)
from tpcg.ops.stream_cg_v4 import (stream_cg_v4_const_planes,
                                   stream_cg_v4_coef_planes)
from tpcg.problems import helm_fe, helm_fe_var, plane_wave_rhs


def _planes(a):
    return jnp.asarray(np.stack([a.real, a.imag]).astype(np.float32))


@pytest.mark.parametrize("keep_q,chunk", [(True, 64), (False, 64),
                                          (True, 6), (False, 6)])
def test_stream_v4_const_bit_matches_v2(keep_q, chunk):
    """Resident kernel == v2 bit-for-bit, single chunk and chunked
    (chunk=6 forces two resident calls with an HBM round-trip between
    them at iteration 6)."""
    N, iters, k = 64, 15, 9.0
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    rng = np.random.default_rng(3)
    x0 = 0.1 * (rng.standard_normal((N, N))
                + 1j * rng.standard_normal((N, N)))
    taps, strips2 = prepare_stream(A)
    bp, x0p = _planes(b), _planes(x0)
    x2, h2 = stream_cg_const_planes(A.offsets, A.grid, taps, strips2,
                                    bp, x0p, iters, interpret=True)
    x4, h4 = stream_cg_v4_const_planes(A.offsets, A.grid, taps, strips2,
                                       bp, x0p, iters, keep_q=keep_q,
                                       chunk=chunk, interpret=True)
    np.testing.assert_array_equal(np.asarray(x4), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(h4), np.asarray(h2))


@pytest.mark.parametrize("chunk", [64, 7])
def test_stream_v4_coef_bit_matches_v2(chunk):
    N, iters, k = 64, 15, 12.0
    rng = np.random.default_rng(4)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    A = helm_fe_var(N, k, C, rho=0.1)
    b = plane_wave_rhs(N, k)
    coefp = prepare_stream_coef(A)
    bp = _planes(b)
    x0p = jnp.zeros_like(bp)
    x2, h2 = stream_cg_coef_planes(A.offsets, A.grid, coefp, bp, x0p,
                                   iters, interpret=True)
    x4, h4 = stream_cg_v4_coef_planes(A.offsets, A.grid, coefp, bp, x0p,
                                      iters, chunk=chunk, interpret=True)
    np.testing.assert_array_equal(np.asarray(x4), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(h4), np.asarray(h2))


@pytest.mark.parametrize("iters", [1, 2])
def test_stream_v4_single_iteration(iters):
    """K=1 chunks make it==0 and it==K-1 coincide -- the state-load and
    output-emit paths overlap in one grid sweep; must still bit-match
    v2."""
    N, k = 64, 9.0
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    taps, strips2 = prepare_stream(A)
    bp = _planes(b)
    x0p = jnp.zeros_like(bp)
    x2, h2 = stream_cg_const_planes(A.offsets, A.grid, taps, strips2,
                                    bp, x0p, iters, interpret=True)
    x4, h4 = stream_cg_v4_const_planes(A.offsets, A.grid, taps, strips2,
                                       bp, x0p, iters, chunk=1,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(x4), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(h4), np.asarray(h2))


def test_stream_v4_odd_grid_height():
    """Odd grid heights (the distributed solver's N = (W-1)*M + 1
    family) stream in divisor row blocks (Bv=13 at N=65) -- the
    resident kernel must handle non-power-of-2 blocks identically to
    v2 (regression for trace-time slicing at odd Bv)."""
    N, iters, k = 65, 12, 9.0
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    taps, strips2 = prepare_stream(A)
    bp = _planes(b)
    x0p = jnp.zeros_like(bp)
    x2, h2 = stream_cg_const_planes(A.offsets, A.grid, taps, strips2,
                                    bp, x0p, iters, interpret=True)
    x4, h4 = stream_cg_v4_const_planes(A.offsets, A.grid, taps, strips2,
                                       bp, x0p, iters, interpret=True)
    np.testing.assert_array_equal(np.asarray(x4), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(h4), np.asarray(h2))


def test_stream_v4_budget_guards():
    """Public entry points reject grids beyond the resident VMEM
    budget with a clear error instead of a compiler blowup."""
    A = helm_fe(64, 9.0, eps=9.0)
    taps, strips2 = prepare_stream(A)
    big = (4096, 4096)
    bp = jnp.zeros((2,) + big, jnp.float32)
    with pytest.raises(ValueError, match="resident VMEM budget"):
        stream_cg_v4_const_planes(A.offsets, big, taps, strips2, bp,
                                  bp, 4, keep_q=False, interpret=True)
    with pytest.raises(ValueError, match="keep_q VMEM budget"):
        stream_cg_v4_coef_planes(A.offsets, (2048, 2048),
                                 jnp.zeros((2, 9, 4, 4), jnp.float32),
                                 bp, bp, 4, interpret=True)
