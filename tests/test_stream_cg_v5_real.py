"""Real panel-round-trip streaming CG (``tpcg.ops.stream_cg_v5_real``).

Single-plane twin of the v5 tests: bit-exact vs the real v2 pipeline
at matched block rows for the recompute mode (both tiers, chunked,
K=1); oracle-gated tracking for the qx variant (its extra outputs
perturb interpret-mode reduction fusion at rounding level)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpcg.ops.stream_cg_real import (prepare_stream_real,
                                     stream_cg_real_planes)
from tpcg.ops.stream_cg_v5_real import stream_cg_v5_real_planes
from tpcg.problems.poisson import poisson


def _setup(N):
    A = poisson(N, dtype=np.float64)
    rng = np.random.default_rng(5)
    b = rng.standard_normal((N, N)).astype(np.float32)
    taps, strips2 = prepare_stream_real(A)
    return A, jnp.asarray(b), taps, strips2


@pytest.mark.parametrize("d_resident,chunk", [(True, 64), (False, 64),
                                              (True, 6), (False, 6)])
def test_stream_v5_real_bit_matches_v2(d_resident, chunk):
    N, iters = 64, 15
    A, bp, taps, strips2 = _setup(N)
    rng = np.random.default_rng(6)
    x0p = jnp.asarray(0.1 * rng.standard_normal((N, N))
                      .astype(np.float32))
    x2, h2 = stream_cg_real_planes(A.offsets, A.grid, taps, strips2,
                                   bp, x0p, iters, interpret=True)
    x5, h5 = stream_cg_v5_real_planes(A.offsets, A.grid, taps, strips2,
                                      bp, x0p, iters,
                                      d_resident=d_resident,
                                      chunk=chunk, interpret=True)
    np.testing.assert_array_equal(np.asarray(x5), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(h5), np.asarray(h2))


@pytest.mark.parametrize("d_resident", [True, False])
def test_stream_v5_real_single_iteration(d_resident):
    N = 64
    A, bp, taps, strips2 = _setup(N)
    x0p = jnp.zeros_like(bp)
    for iters in (1, 2):
        x2, h2 = stream_cg_real_planes(A.offsets, A.grid, taps,
                                       strips2, bp, x0p, iters,
                                       interpret=True)
        x5, h5 = stream_cg_v5_real_planes(
            A.offsets, A.grid, taps, strips2, bp, x0p, iters, chunk=1,
            d_resident=d_resident, interpret=True)
        np.testing.assert_array_equal(np.asarray(x5), np.asarray(x2))
        np.testing.assert_array_equal(np.asarray(h5), np.asarray(h2))


@pytest.mark.parametrize("d_resident,chunk", [(True, 64), (False, 6)])
def test_stream_v5_real_qx_tracks_v2(d_resident, chunk):
    """qx on a converging SPD Poisson solve: rounding-level drift only
    (hardware parity is pinned by the probe, like q_hbm)."""
    N, iters = 64, 15
    A, bp, taps, strips2 = _setup(N)
    x0p = jnp.zeros_like(bp)
    x2, h2 = stream_cg_real_planes(A.offsets, A.grid, taps, strips2,
                                   bp, x0p, iters, interpret=True)
    x5, h5 = stream_cg_v5_real_planes(A.offsets, A.grid, taps, strips2,
                                      bp, x0p, iters, qx=True,
                                      d_resident=d_resident,
                                      chunk=chunk, interpret=True)
    h2, h5 = np.asarray(h2), np.asarray(h5)
    assert np.max(np.abs(h5 - h2) / (np.abs(h2) + 1e-30)) < 1e-4
    x2, x5 = np.asarray(x2), np.asarray(x5)
    assert np.abs(x5 - x2).max() < 1e-4 * np.abs(x2).max()


def test_apply_const_real_xla_and_cpos():
    """XLA twin of the real emit_q == assembled matvec; column-padded
    variant keeps real columns exact and pads exactly zero."""
    from tpcg.ops.stream_cg_v5 import pad_strips
    from tpcg.ops.stream_cg_v5_real import apply_const_real_xla
    N, nh_pad = 32, 48
    A = poisson(N, dtype=np.float64)
    taps, strips2 = prepare_stream_real(A)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((N, N)).astype(np.float32)
    q = np.asarray(apply_const_real_xla(A.offsets, taps, strips2,
                                        jnp.asarray(x)))
    want = (A.to_scipy() @ x.reshape(-1)).reshape(N, N)
    np.testing.assert_allclose(q, want, rtol=0,
                               atol=2e-5 * np.abs(want).max())
    xp = jnp.pad(jnp.asarray(x), ((0, 0), (0, nh_pad - N)))
    qp = np.asarray(apply_const_real_xla(
        A.offsets, taps, pad_strips(strips2, nh_pad), xp, cpos=N - 1))
    np.testing.assert_allclose(qp[:, :N], want, rtol=0,
                               atol=2e-5 * np.abs(want).max())
    np.testing.assert_array_equal(qp[:, N:], 0.0)


@pytest.mark.parametrize("qx", [False, True])
def test_stream_v5_real_cpos_tracks_v2(qx):
    """Column-padded real v5 (cpos) on a converging SPD Poisson solve:
    pads exactly zero, history tracks the unpadded v2 solve at
    reassociation level."""
    from tpcg.ops.stream_cg_v5 import pad_strips
    N, iters, nh_pad = 72, 15, 128
    A, bp, taps, strips2 = _setup(N)
    x0p = jnp.zeros_like(bp)
    x2, h2 = stream_cg_real_planes(A.offsets, A.grid, taps, strips2,
                                   bp, x0p, iters, block_rows=8,
                                   interpret=True)
    rpadw = ((0, 0), (0, nh_pad - N))
    x5, h5 = stream_cg_v5_real_planes(
        A.offsets, (N, nh_pad), taps, pad_strips(strips2, nh_pad),
        jnp.pad(bp, rpadw), jnp.pad(x0p, rpadw), iters, block_rows=8,
        d_resident=True, qx=qx, cpos=N - 1, chunk=7, interpret=True)
    x5, h5 = np.asarray(x5), np.asarray(h5)
    np.testing.assert_array_equal(x5[:, N:], 0.0)
    h2 = np.asarray(h2)
    assert np.max(np.abs(h5 - h2) / (np.abs(h2) + 1e-30)) < 1e-4
    x2 = np.asarray(x2)
    assert np.abs(x5[:, :N] - x2).max() < 1e-4 * np.abs(x2).max()


def test_planner_real_column_pad_route(monkeypatch):
    """An unaligned real grid whose v4 tier cannot keep q resident
    routes to the column-padded v5 path."""
    import tpcg.ops.auto as auto_mod
    monkeypatch.setattr(auto_mod, "_REAL_STREAM_NODES", 16)
    monkeypatch.setattr(auto_mod, "_v4_real_config",
                        lambda *a, **k: (False, 8))
    from tpcg.ops.auto import plan_stencil_cg
    N, iters = 72, 15
    A = poisson(N, dtype=np.float64)
    rng = np.random.default_rng(9)
    b = rng.standard_normal((N, N)).astype(np.float32)
    plan = plan_stencil_cg(A, iters, interpret=True)
    assert plan.path == "stream-real"
    x, h = plan.solve(b)
    assert x.shape == (N, N)
    from tpcg.ops.auto import stencil_cg
    x_ref, h_ref = stencil_cg(A, b, n_iterations=iters, path="xla")
    rel = np.max(np.abs(h - np.asarray(h_ref))
                 / (np.abs(h_ref) + 1e-30))
    assert rel < 1e-3, rel


def test_stream_v5_real_odd_grid_height():
    N, iters = 65, 12
    A, bp, taps, strips2 = _setup(N)
    x0p = jnp.zeros_like(bp)
    x2, h2 = stream_cg_real_planes(A.offsets, A.grid, taps, strips2,
                                   bp, x0p, iters, interpret=True)
    x5, h5 = stream_cg_v5_real_planes(A.offsets, A.grid, taps, strips2,
                                      bp, x0p, iters, d_resident=True,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(x5), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(h5), np.asarray(h2))
