"""Banded-streaming CG (``tpcg.ops.stream_cg_dia``).

The column-major grid mapping (one vertical tap per diagonal against
the wrap-filled pad grid) must reproduce the XLA ``DiaMatrix.matvec``
CG exactly up to f32 reduction reassociation, and track the f64 oracle
on converging SPD bands.  Covers the reference's m_t1 / parabolic_fem matrix classes
(report Table I) at test scale.
"""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from tpcg.sparse import DiaMatrix
from tpcg.ops.stream_cg_dia import (prepare_dia_stream, stream_cg_dia,
                                    to_dia_grid, from_dia_grid)


def banded_spd(n, half_band, seed=0, step=1):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    offs = [0] + [o for k in range(1, half_band + 1)
                  for o in (k * step, -k * step)]
    for off in offs:
        i = np.arange(max(0, -off), min(n, n - off))
        v = (np.full(len(i), 4.0 * half_band) if off == 0
             else rng.standard_normal(len(i)) * 0.3)
        rows.append(i)
        cols.append(i + off)
        vals.append(v)
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    return ((A + A.T) * 0.5).tocsr()


def test_grid_roundtrip():
    n = 5000
    x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    g = to_dia_grid(x, 48)
    np.testing.assert_array_equal(np.asarray(from_dia_grid(g, n)), x)


@pytest.mark.parametrize("n,hb,step", [(4000, 9, 7), (4000, 3, 1500)])
def test_dia_apply_taps_match_matvec(n, hb, step):
    """The single-tap application against the wrap-filled pad grid
    equals the 1-D banded matvec exactly (step=1500 forces a halo
    depth Ht > 1: offsets up to 4500 >> nv)."""
    from tpcg.ops.stream_cg_dia import dia_apply_grid

    A = DiaMatrix.from_scipy(banded_spd(n, hb, step=step))
    taps, grid, Bv, planes = prepare_dia_stream(A)
    nv, nh = grid
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n).astype(np.float32)
    xg = to_dia_grid(x, nv)
    q = dia_apply_grid(taps, grid, planes, xg)
    got = np.asarray(from_dia_grid(q, n))
    want = np.asarray(A.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=1e-4 * np.abs(want).max())


@pytest.mark.parametrize("n,hb,chunk,step",
                         [(4000, 9, 64, 1), (4000, 9, 5, 1),
                          (3037, 4, 64, 1), (4000, 3, 64, 25)])
def test_stream_dia_matches_oracle(n, hb, chunk, step):
    """Full solve vs the f64 NumPy oracle and the XLA DiaMatrix CG
    (f32): the banded kernel's histories must track both on this
    converging SPD band (odd n exercises the grid zero-pad; step=25
    pushes max|k| to 75 >> nv=32, exercising the kernel's Ht=3
    multi-column wrap fill)."""
    from tpcg import block_cg, reference
    iters = 25
    As = banded_spd(n, hb, step=step)
    A = DiaMatrix.from_scipy(As)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(n).astype(np.float32)
    x, h = stream_cg_dia(A, b, n_iterations=iters, chunk=chunk,
                         interpret=True)
    h = np.asarray(h)
    assert h.shape == (iters + 1,)
    assert np.all(np.isfinite(h))
    _, ho = reference.cg(As, b.astype(np.float64), n_iterations=iters,
                         record_history=True)
    ho = np.asarray(ho)
    # compare only above the f32-meaningful range (this band converges
    # so fast the tail underflows f32 while the f64 oracle descends on)
    live = ho > 1e-6 * ho[0]
    rel = np.max(np.abs(h[live] - ho[live]) / ho[live])
    assert live.sum() >= 4 and rel < 1e-3, (live.sum(), rel)
    A = DiaMatrix(A.offsets, jnp.asarray(np.asarray(A.data),
                                         jnp.float32), A.n)
    res = block_cg(A, jnp.asarray(b), n_iterations=iters)
    hx = np.asarray(res.residual_history).reshape(iters + 1)
    assert np.max(np.abs(h[live] - hx[live]) / hx[live]) < 1e-3
    xx = np.asarray(res.x).reshape(-1)
    assert np.abs(np.asarray(x) - xx).max() < 1e-3 * np.abs(xx).max()


@pytest.mark.parametrize("step", [1, 30])
def test_block_multirhs_matches_single_and_xla(step):
    """The fat-batched multi-RHS surface's solutions equal per-column
    solves BITWISE (identical per-RHS op sequence) and its histories
    track the XLA block_cg ones (step=30 exercises the batched
    kernel's multi-column wrap fill, Ht > 1)."""
    from tpcg import block_cg
    from tpcg.ops.stream_cg_dia import stream_cg_dia_block

    n, iters, nrhs = 3000, 20, 3
    As = banded_spd(n, 5, step=step)
    A = DiaMatrix.from_scipy(As)
    rng = np.random.default_rng(5)
    B = rng.standard_normal((n, nrhs)).astype(np.float32)
    X, H = stream_cg_dia_block(A, B, n_iterations=iters, interpret=True)
    assert np.asarray(H).shape == (iters + 1, nrhs)
    for r in range(nrhs):
        xr, hr = stream_cg_dia(A, B[:, r], n_iterations=iters,
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(X)[:, r], np.asarray(xr))
        # histories track to fp rounding: in interpret mode the fat
        # kernel's extra outputs perturb XLA reduction fusion at the
        # underflowing tail (the q_hbm phenomenon; bit-exact on HW)
        np.testing.assert_allclose(np.asarray(H)[:, r], np.asarray(hr),
                                   rtol=1e-6, atol=0)
    A32 = DiaMatrix(A.offsets, jnp.asarray(np.asarray(A.data),
                                           jnp.float32), A.n)
    res = block_cg(A32, jnp.asarray(B), n_iterations=iters)
    hx = np.asarray(res.residual_history)
    live = hx > 1e-6 * hx[0]
    rel = np.abs(np.asarray(H)[live] - hx[live]) / hx[live]
    assert rel.max() < 1e-3


def test_block_ragged_tail_zero_pad(monkeypatch):
    """nrhs not divisible by the batch size: the tail block zero-pads
    (a zero RHS freezes at delta0 == 0) and every real column's
    solution still equals its single-RHS solve bitwise (histories to
    fp rounding, see test_block_multirhs_matches_single_and_xla)."""
    import tpcg.ops.stream_cg_dia as sd

    monkeypatch.setattr(sd, "_dia_batch_nb", lambda *a, **k: 2)
    n, iters, nrhs = 3000, 15, 3
    A = DiaMatrix.from_scipy(banded_spd(n, 5))
    rng = np.random.default_rng(7)
    B = rng.standard_normal((n, nrhs)).astype(np.float32)
    X, H = sd.stream_cg_dia_block(A, B, n_iterations=iters,
                                  interpret=True)
    assert np.asarray(X).shape == (n, nrhs)
    for r in range(nrhs):
        xr, hr = stream_cg_dia(A, B[:, r], n_iterations=iters,
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(X)[:, r], np.asarray(xr))
        np.testing.assert_allclose(np.asarray(H)[:, r], np.asarray(hr),
                                   rtol=1e-6, atol=0)


def test_api_real_banded_dispatches_dia_stream(monkeypatch):
    """The public ``cg`` real path routes banded DiaMatrix operands to
    the streaming kernel on TPU backends (forced here with the
    interpret kernel) and its solution matches scipy."""
    import scipy.sparse.linalg as spla
    from tpcg import api

    n, iters, nrhs = 2000, 60, 2
    As = banded_spd(n, 4).tocsr()
    rng = np.random.default_rng(6)
    b = rng.standard_normal(n * nrhs).astype(np.float32)
    A32 = As.astype(np.float32)
    B = b.reshape(nrhs, n).T

    called = {}
    import tpcg.ops.stream_cg_dia as sd
    orig = sd.stream_cg_dia_block

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(sd, "stream_cg_dia_block", spy)
    X, H = api._solve_real(DiaMatrix.from_scipy(A32), B, None,
                           iters, on_tpu=True)
    assert called.get("yes")
    assert X.shape == (n, nrhs) and H.shape == (iters + 1, nrhs)
    for r in range(nrhs):
        xs = spla.spsolve(As.astype(np.float64).tocsc(),
                          B[:, r].astype(np.float64))
        np.testing.assert_allclose(X[:, r], xs, rtol=0,
                                   atol=1e-3 * np.abs(xs).max())


def test_dia_stream_fit_rule():
    """Reference-class matrices fit; a million-row wide band does not.
    (The rule is geometry-only -- n + offsets -- so shims suffice.)"""
    from types import SimpleNamespace
    from tpcg.ops.stream_cg_dia import dia_stream_fits

    mt1 = SimpleNamespace(n=97578, offsets=tuple(
        [0] + [o for k in range(1, 51) for o in (37 * k, -37 * k)]))
    assert dia_stream_fits(mt1)
    para = SimpleNamespace(n=525825,
                           offsets=(0, 1, -1, 724, -724, 725, -725))
    assert dia_stream_fits(para)
    big = SimpleNamespace(n=8_000_000, offsets=tuple(
        [0] + [o for k in range(1, 101) for o in (1000 * k, -1000 * k)]))
    assert not dia_stream_fits(big)


def test_stream_dia_x0_and_freeze():
    """Nonzero x0; running far past convergence must freeze, not NaN
    (the reference runs fixed iteration counts, clcg.c:297)."""
    from tpcg import reference
    n, iters = 2000, 120
    As = banded_spd(n, 3)
    A = DiaMatrix.from_scipy(As)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(n).astype(np.float32)
    x0 = 0.1 * rng.standard_normal(n).astype(np.float32)
    x, h = stream_cg_dia(A, b, x0=x0, n_iterations=iters, chunk=50,
                         interpret=True)
    h = np.asarray(h)
    assert np.all(np.isfinite(h)) and np.all(np.isfinite(np.asarray(x)))
    r = np.linalg.norm(As @ np.asarray(x, np.float64)
                       - b) / np.linalg.norm(b)
    assert r < 1e-5, r
