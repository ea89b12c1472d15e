"""Variable-coefficient panel-round-trip streaming CG
(``tpcg.ops.stream_cg_v5_sym``).

v5-sym composes the v5 explicit-DMA state-panel machinery with the
v4-sym half-plane coefficient streaming.  Its matvec add order equals
v4-sym's exactly (same emit_q loop) and the recompute mode performs
identical fp ops, BUT interpret-mode XLA contracts the emit_q
multiply-add chains differently across program contexts (even v4-sym's
own keep_q/q_hbm tiers differ at 1 ulp in interpret mode -- the known
reassociation phenomenon, NOTES_R3), so the gates here are ULP-TIGHT
tracking vs v4-sym at matched ``block_rows`` plus the XLA oracle;
hardware bit-parity vs v4-sym is pinned by the benchmark probe
(``benchmarks/exp_stream5sym.py``).

Reference semantics under test: COCG unconjugated dots
(``kernel/complex/vdot.cl:15``), fixed iteration count (``clcg.c:297``);
operator class = the reference's variable-wave-speed Helmholtz
(``helmFE_var.py:9-331``).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpcg.ops.cplx import block_cg_planes, make_pair_operator
from tpcg.ops.stream_cg_v4_sym import (prepare_stream_sym,
                                       stream_cg_v4_sym_planes)
from tpcg.ops.stream_cg_v5_sym import (stream_cg_v5_sym,
                                       stream_cg_v5_sym_planes)
from tpcg.problems import helm_fe_var, plane_wave_rhs


def _var_problem(N, k=12.0):
    rng = np.random.default_rng(7)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    A = helm_fe_var(N, k, C, rho=0.1)
    return A, plane_wave_rhs(N, k)


def _planes(a):
    return jnp.asarray(np.stack([a.real, a.imag]).astype(np.float32))


def _oracle_hist(A, b, iters):
    n = A.grid[0] * A.grid[1]
    P = make_pair_operator(A, dtype=jnp.float32)
    b2 = jnp.asarray(np.stack([b.real, b.imag]).reshape(2, n)[:, :, None]
                     .astype(np.float32))
    res = block_cg_planes(P, b2, n_iterations=iters)
    return np.asarray(res.residual_history)[:, 0]


@pytest.mark.parametrize("d_resident,chunk", [(True, 64), (False, 64),
                                              (True, 6), (False, 6)])
def test_v5_sym_tracks_v4_sym(d_resident, chunk):
    """Recompute mode vs v4-sym at matched block_rows (ulp-level
    interpret-mode drift only), single chunk and chunked (chunk=6
    forces the HBM state through the loop boundary)."""
    N, iters = 64, 15
    A, b = _var_problem(N)
    half, cplanes = prepare_stream_sym(A)
    rng = np.random.default_rng(3)
    x0 = 0.1 * (rng.standard_normal((N, N))
                + 1j * rng.standard_normal((N, N)))
    bp, x0p = _planes(b), _planes(x0)
    x4, h4 = stream_cg_v4_sym_planes(A.offsets, A.grid, half, cplanes,
                                     bp, x0p, iters, keep_q=True,
                                     block_rows=8, interpret=True)
    x5, h5 = stream_cg_v5_sym_planes(A.offsets, A.grid, half, cplanes,
                                     bp, x0p, iters, block_rows=8,
                                     d_resident=d_resident, chunk=chunk,
                                     interpret=True)
    h4, h5 = np.asarray(h4), np.asarray(h5)
    assert np.max(np.abs(h5 - h4) / (np.abs(h4) + 1e-30)) < 1e-3
    x4, x5 = np.asarray(x4), np.asarray(x5)
    assert np.abs(x5 - x4).max() < 5e-3 * np.abs(x4).max()


@pytest.mark.parametrize("d_resident,chunk", [(True, 64), (False, 64),
                                              (False, 6)])
def test_v5_sym_qx_tracks_v4_sym(d_resident, chunk):
    """qx (q through HBM + deferred x update, ONE coefficient stream
    per iteration): same fp ops as the recompute mode, gated by tight
    tracking (interpret-mode fusion drift) + the XLA oracle."""
    N, iters = 64, 15
    A, b = _var_problem(N)
    half, cplanes = prepare_stream_sym(A)
    bp = _planes(b)
    x0p = jnp.zeros_like(bp)
    x4, h4 = stream_cg_v4_sym_planes(A.offsets, A.grid, half, cplanes,
                                     bp, x0p, iters, keep_q=True,
                                     block_rows=8, interpret=True)
    x5, h5 = stream_cg_v5_sym_planes(A.offsets, A.grid, half, cplanes,
                                     bp, x0p, iters, block_rows=8,
                                     qx=True, d_resident=d_resident,
                                     chunk=chunk, interpret=True)
    h4, h5 = np.asarray(h4), np.asarray(h5)
    assert np.max(np.abs(h5 - h4) / (np.abs(h4) + 1e-30)) < 1e-3
    x4, x5 = np.asarray(x4), np.asarray(x5)
    assert np.abs(x5 - x4).max() < 5e-3 * np.abs(x4).max()


@pytest.mark.parametrize("d_resident", [True, False])
@pytest.mark.parametrize("iters", [1, 2])
def test_v5_sym_single_iteration(d_resident, iters):
    """K=1 chunks: it==0 and it==K-1 coincide (DMA source switch + the
    final copy-out drain in one sweep); must still track v4-sym at ulp
    level."""
    N = 64
    A, b = _var_problem(N)
    half, cplanes = prepare_stream_sym(A)
    bp = _planes(b)
    x0p = jnp.zeros_like(bp)
    x4, h4 = stream_cg_v4_sym_planes(A.offsets, A.grid, half, cplanes,
                                     bp, x0p, iters, keep_q=True,
                                     block_rows=8, interpret=True)
    x5, h5 = stream_cg_v5_sym_planes(A.offsets, A.grid, half, cplanes,
                                     bp, x0p, iters, chunk=1,
                                     block_rows=8,
                                     d_resident=d_resident,
                                     interpret=True)
    h4, h5 = np.asarray(h4), np.asarray(h5)
    assert np.max(np.abs(h5 - h4) / (np.abs(h4) + 1e-30)) < 1e-4
    x4, x5 = np.asarray(x4), np.asarray(x5)
    assert np.abs(x5 - x4).max() < 1e-4 * max(np.abs(x4).max(), 1e-30)


def test_v5_sym_oracle():
    """Full solve against the XLA planes oracle (all tier/mode
    combinations, chunked)."""
    N, iters = 64, 25
    A, b = _var_problem(N)
    hs = _oracle_hist(A, b, iters)
    for d_res in (True, False):
        for qx in (False, True):
            x, hist = stream_cg_v5_sym(A, b, n_iterations=iters,
                                       d_resident=d_res, qx=qx,
                                       chunk=7, interpret=True)
            rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
            assert rel.max() < 5e-3, (d_res, qx, rel.max())


def test_v5_sym_alignment_guard():
    """On hardware (interpret=False) unaligned lane widths must raise
    before any compile -- HBM<->VMEM DMA needs nh % 128 == 0."""
    A, b = _var_problem(64)
    half, cplanes = prepare_stream_sym(A)
    bp = jnp.zeros((2, 64, 64), jnp.float32)
    with pytest.raises(ValueError, match="128-aligned"):
        stream_cg_v5_sym_planes(A.offsets, A.grid, half, cplanes,
                                bp, bp, 4, interpret=False)


def test_planner_v5_sym_route(monkeypatch):
    """A symmetric var-coeff grid beyond the v4-sym budget routes to
    the v5-sym tier (not v3/v2) and matches the XLA oracle."""
    import tpcg.ops.auto as auto_mod
    monkeypatch.setattr(auto_mod, "_VMEM_NODES", 16)
    monkeypatch.setattr(auto_mod, "_v4_sym_config", lambda *a, **k: None)
    routed = {}
    real_cfg = auto_mod._v5_sym_config

    def spy(nv, nh, nH1):
        cfg = real_cfg(nv, nh, nH1)
        routed["cfg"] = cfg
        return cfg
    monkeypatch.setattr(auto_mod, "_v5_sym_config", spy)
    from tpcg.ops.auto import plan_stencil_cg
    N, iters = 128, 12
    A, b = _var_problem(N)
    plan = plan_stencil_cg(A, iters, interpret=True)
    assert plan.path == "stream-coef"
    assert routed["cfg"] is not None
    x, h = plan.solve(b)
    assert x.shape == (N, N)
    hs = _oracle_hist(A, b, iters)
    rel = np.abs(np.asarray(h) - hs) / (np.abs(hs) + 1e-30)
    assert rel.max() < 5e-3, rel.max()
