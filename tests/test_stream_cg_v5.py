"""Explicit-DMA panel-round-trip streaming CG (``tpcg.ops.stream_cg_v5``).

v5 runs K iterations per pallas call like v4, but the CG state planes
live in HBM and each phase DMAs row panels in/out (double-buffered
copy-ins, lazily-waited copy-outs).  Its arithmetic is bit-identical to
the v2 two-kernel iteration at matched ``block_rows`` -- pinned exactly
here for both tiers (``d_resident`` keeps the direction field in VMEM
scratch; the full round-trip tier keeps nothing), across chunk
boundaries, and for K=1 chunks where the entry/exit paths coincide.

Reference semantics under test: COCG unconjugated dots
(``kernel/complex/vdot.cl:15``), fixed iteration count (``clcg.c:297``).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpcg.ops.stream_cg import prepare_stream, stream_cg_const_planes
from tpcg.ops.stream_cg_v5 import stream_cg_v5_const_planes
from tpcg.problems import helm_fe, plane_wave_rhs


def _planes(a):
    return jnp.asarray(np.stack([a.real, a.imag]).astype(np.float32))


@pytest.mark.parametrize("d_resident,chunk", [(True, 64), (False, 64),
                                              (True, 6), (False, 6)])
def test_stream_v5_const_bit_matches_v2(d_resident, chunk):
    """Panel round-trip kernel == v2 bit-for-bit, single chunk and
    chunked (chunk=6 forces two calls with the HBM state re-entering
    through the loop boundary at iteration 6)."""
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
    x5, h5 = stream_cg_v5_const_planes(A.offsets, A.grid, taps, strips2,
                                       bp, x0p, iters,
                                       d_resident=d_resident,
                                       chunk=chunk, interpret=True)
    np.testing.assert_array_equal(np.asarray(x5), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(h5), np.asarray(h2))


@pytest.mark.parametrize("d_resident,chunk", [(True, 64), (False, 64),
                                              (False, 6)])
def test_stream_v5_qx_tracks_v2(d_resident, chunk):
    """The qx variant (q through HBM + deferred x update) performs the
    SAME fp ops as v2, but its extra outputs perturb interpret-mode
    XLA reduction fusion, so histories drift at rounding level here
    (the q_hbm phenomenon, NOTES_R3 -- on hardware the probe pins
    max rel 0.0 vs v2).  Gate: tight tracking + the XLA oracle."""
    N, iters, k = 64, 15, 9.0
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    taps, strips2 = prepare_stream(A)
    bp = _planes(b)
    x0p = jnp.zeros_like(bp)
    x2, h2 = stream_cg_const_planes(A.offsets, A.grid, taps, strips2,
                                    bp, x0p, iters, interpret=True)
    x5, h5 = stream_cg_v5_const_planes(A.offsets, A.grid, taps, strips2,
                                       bp, x0p, iters, qx=True,
                                       d_resident=d_resident,
                                       chunk=chunk, interpret=True)
    h2, h5 = np.asarray(h2), np.asarray(h5)
    assert np.max(np.abs(h5 - h2) / (np.abs(h2) + 1e-30)) < 1e-3
    x2, x5 = np.asarray(x2), np.asarray(x5)
    assert np.abs(x5 - x2).max() < 5e-3 * np.abs(x2).max()


@pytest.mark.parametrize("d_resident", [True, False])
@pytest.mark.parametrize("iters", [1, 2])
def test_stream_v5_single_iteration(d_resident, iters, qx=False):
    """K=1 chunks make it==0 and it==K-1 coincide -- the DMA source
    switch (operands vs own outputs) and the final copy-out drain all
    land in one grid sweep; must still bit-match v2."""
    N, k = 64, 9.0
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    taps, strips2 = prepare_stream(A)
    bp = _planes(b)
    x0p = jnp.zeros_like(bp)
    x2, h2 = stream_cg_const_planes(A.offsets, A.grid, taps, strips2,
                                    bp, x0p, iters, interpret=True)
    x5, h5 = stream_cg_v5_const_planes(A.offsets, A.grid, taps, strips2,
                                       bp, x0p, iters, chunk=1,
                                       d_resident=d_resident, qx=qx,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(x5), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(h5), np.asarray(h2))


@pytest.mark.parametrize("d_resident", [True, False])
def test_stream_v5_odd_grid_height(d_resident):
    """Odd grid heights stream in divisor row blocks (Bv=13 at N=65);
    the clamped 8-row bottom-halo strip DMAs must stay in bounds and
    the results bit-match v2."""
    N, iters, k = 65, 12, 9.0
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    taps, strips2 = prepare_stream(A)
    bp = _planes(b)
    x0p = jnp.zeros_like(bp)
    x2, h2 = stream_cg_const_planes(A.offsets, A.grid, taps, strips2,
                                    bp, x0p, iters, interpret=True)
    x5, h5 = stream_cg_v5_const_planes(A.offsets, A.grid, taps, strips2,
                                       bp, x0p, iters,
                                       d_resident=d_resident,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(x5), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(h5), np.asarray(h2))


def test_stream_v5_oracle():
    """Full v5 solve against the XLA planes oracle (both tiers)."""
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
    for d_res in (True, False):
        for qx in (False, True):
            x, hist = stream_cg_v5_const_planes(
                A.offsets, A.grid, taps, strips2, bp, x0p, iters,
                d_resident=d_res, qx=qx, chunk=7, interpret=True)
            rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
            assert rel.max() < 5e-3, (d_res, qx, rel.max())


def test_apply_const_xla_matches_matvec():
    """The XLA twin of the kernels' emit_q (interior taps + edge
    corrections + boundary-row strips) must equal the assembled
    operator's matvec."""
    from tpcg.ops.stream_cg_v5 import apply_const_planes_xla
    N, k = 32, 9.0
    A = helm_fe(N, k, eps=k)
    taps, strips2 = prepare_stream(A)
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((N, N))
         + 1j * rng.standard_normal((N, N))).astype(np.complex64)
    q = np.asarray(apply_const_planes_xla(A.offsets, taps, strips2,
                                          _planes(x)))
    want = (A.to_scipy() @ x.reshape(-1)).reshape(N, N)
    got = q[0] + 1j * q[1]
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=2e-5 * np.abs(want).max())


def test_apply_const_xla_column_padded():
    """Column-zero-padded apply with cpos: real columns equal the
    unpadded operator, pad columns are exactly zero."""
    from tpcg.ops.stream_cg_v5 import (apply_const_planes_xla,
                                       pad_strips)
    N, k, nh_pad = 32, 9.0, 48
    A = helm_fe(N, k, eps=k)
    taps, strips2 = prepare_stream(A)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((N, N))
         + 1j * rng.standard_normal((N, N))).astype(np.complex64)
    xp = jnp.pad(_planes(x), ((0, 0), (0, 0), (0, nh_pad - N)))
    q = np.asarray(apply_const_planes_xla(
        A.offsets, taps, pad_strips(strips2, nh_pad), xp, cpos=N - 1))
    want = (A.to_scipy() @ x.reshape(-1)).reshape(N, N)
    got = q[0, :, :N] + 1j * q[1, :, :N]
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=2e-5 * np.abs(want).max())
    np.testing.assert_array_equal(q[:, :, N:], 0.0)


@pytest.mark.parametrize("qx", [False, True])
@pytest.mark.parametrize("d_resident", [True, False])
def test_stream_v5_cpos_matches_unpadded_v2(d_resident, qx):
    """Column-padded v5 (cpos machinery): the pads stay EXACTLY zero,
    and the history tracks the f64 oracle at least as well as the
    unpadded v2 solve does (the padded dots reassociate f32 sums, so a
    direct v2 comparison only measures f32 chaos on this indefinite
    Helmholtz system -- both are gated against the exact COCG)."""
    from tpcg import reference
    from tpcg.ops.stream_cg_v5 import pad_strips
    N, iters, k = 72, 15, 9.0          # 72 % 128 != 0 -> pad to 128
    nh_pad = 128
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    taps, strips2 = prepare_stream(A)
    bp = _planes(b)
    x0p = jnp.zeros_like(bp)
    x2, h2 = stream_cg_const_planes(A.offsets, A.grid, taps, strips2,
                                    bp, x0p, iters, block_rows=8,
                                    interpret=True)
    padw = ((0, 0), (0, 0), (0, nh_pad - N))
    x5, h5 = stream_cg_v5_const_planes(
        A.offsets, (N, nh_pad), taps, pad_strips(strips2, nh_pad),
        jnp.pad(bp, padw), jnp.pad(x0p, padw), iters, block_rows=8,
        d_resident=d_resident, qx=qx, cpos=N - 1, chunk=7,
        interpret=True)
    x5, h5 = np.asarray(x5), np.asarray(h5)
    np.testing.assert_array_equal(x5[:, :, N:], 0.0)
    _, ho = reference.cg(A.to_scipy().tocsr(),
                         b.reshape(-1).astype(np.complex128),
                         n_iterations=iters, record_history=True)
    ho = np.asarray(ho)
    dev2 = np.max(np.abs(np.asarray(h2) - ho) / np.abs(ho))
    dev5 = np.max(np.abs(h5 - ho) / np.abs(ho))
    assert dev5 <= max(5 * dev2, 5e-3), (dev5, dev2)


def test_planner_column_pad_route(monkeypatch):
    """An unaligned-width const grid beyond the resident budgets routes
    to the column-padded v5 path and matches the XLA oracle."""
    import tpcg.ops.auto as auto_mod
    monkeypatch.setattr(auto_mod, "_VMEM_NODES", 16)
    monkeypatch.setattr(auto_mod, "_v4_config", lambda *a, **k: None)
    from tpcg.ops.auto import plan_stencil_cg, stencil_cg
    N, iters, k = 72, 12, 9.0
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    plan = plan_stencil_cg(A, iters, interpret=True)
    assert plan.path == "stream"
    x, h = plan.solve(b)
    assert x.shape == (N, N)
    # gate vs the f64 oracle relative to the f32 v2 kernel's own noise
    # (the CPU "xla" path solves in complex128, so it is not a valid
    # f32 yardstick; a direct f32-vs-f32 comparison measures chaos on
    # this indefinite system)
    from tpcg import reference
    from tpcg.ops.stream_cg import (prepare_stream,
                                    stream_cg_const_planes)
    taps, strips2 = prepare_stream(A)
    bp = _planes(b)
    _, h2 = stream_cg_const_planes(A.offsets, A.grid, taps, strips2,
                                   bp, jnp.zeros_like(bp), iters,
                                   block_rows=8, interpret=True)
    _, ho = reference.cg(A.to_scipy().tocsr(),
                         b.reshape(-1).astype(np.complex128),
                         n_iterations=iters, record_history=True)
    ho = np.asarray(ho)
    dev_v2 = np.max(np.abs(np.asarray(h2) - ho) / np.abs(ho))
    dev_v5 = np.max(np.abs(h - ho) / np.abs(ho))
    assert dev_v5 <= max(5 * dev_v2, 5e-3), (dev_v5, dev_v2)


def test_stream_v5_alignment_guard():
    """On hardware (interpret=False) unaligned lane widths must raise
    before any compile -- HBM<->VMEM DMA needs nh % 128 == 0."""
    A = helm_fe(64, 9.0, eps=9.0)
    taps, strips2 = prepare_stream(A)
    bp = jnp.zeros((2, 64, 64), jnp.float32)
    with pytest.raises(ValueError, match="128-aligned"):
        stream_cg_v5_const_planes(A.offsets, A.grid, taps, strips2,
                                  bp, bp, 4, interpret=False)
