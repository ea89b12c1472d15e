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


def test_stream_v4_q_hbm_matches_recompute():
    """The q_hbm tier (explicit DMA round-trip of q through an HBM
    buffer instead of the phase-1 recompute) performs identical
    elementwise arithmetic: x and r after one iteration are bit-equal
    to the recompute tier (histories differ only by interpret-mode XLA
    reduction reassociation; on hardware they are bit-exact -- measured
    max rel 0.0 over 120 iterations at N=2048)."""
    from tpcg.ops.stream_cg_v4 import _build_resident
    from tpcg.ops.fused_cg import _pad_for
    from tpcg.ops.stream_cg import _boundary
    N, k = 64, 9.0
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    taps, strips2 = prepare_stream(A)
    bp = _planes(b)
    Bv = 32
    G, P = N // Bv, _pad_for(A.offsets)
    zero2 = jnp.zeros((2, 1), jnp.float32)
    zeros_v = jnp.zeros((2, N, N), jnp.float32)
    zeros_s = jnp.zeros((2, G, 2 * P, N), jnp.float32)
    r0 = bp
    delta0 = jnp.stack([jnp.sum(r0[0] ** 2 - r0[1] ** 2),
                        2.0 * jnp.sum(r0[0] * r0[1])]).reshape(2, 1)
    Sr0 = _boundary(r0, G, Bv, P, N)
    outs = {}
    for name, qh in (("rec", False), ("hbm", True)):
        step = _build_resident(A.offsets, A.grid, Bv, 1, False, True,
                               taps=taps, q_hbm=qh)
        ret = step(strips2, zero2, delta0, zeros_v, r0, zeros_v, Sr0,
                   zeros_s)
        outs[name] = [np.asarray(a) for a in ret[:3]]
    for i, nm in enumerate(["x", "r", "dnew"]):
        np.testing.assert_array_equal(outs["hbm"][i], outs["rec"][i],
                                      err_msg=nm)


def test_stream_v4_q_hbm_oracle():
    """Full q_hbm solves (chunked and not) against the XLA oracle."""
    from tpcg.ops.cplx import block_cg_planes, make_pair_operator
    N, iters, k = 64, 25, 9.0
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    taps, strips2 = prepare_stream(A)
    bp = _planes(b)
    x0p = jnp.zeros_like(bp)
    n = N * N
    P = make_pair_operator(A, dtype=jnp.float32)
    b2 = jnp.asarray(np.stack([b.real, b.imag]).reshape(2, n)[:, :, None]
                     .astype(np.float32))
    hs = np.asarray(block_cg_planes(P, b2, n_iterations=iters)
                    .residual_history)[:, 0]
    for chunk in (64, 7):
        x, hist = stream_cg_v4_const_planes(
            A.offsets, A.grid, taps, strips2, bp, x0p, iters,
            keep_q=False, q_hbm=True, chunk=chunk, interpret=True)
        rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
        assert rel.max() < 5e-3, (chunk, rel.max())


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
