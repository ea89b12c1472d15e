"""Banded-streaming CG (``tpcg.ops.stream_cg_dia``).

The column-major grid mapping (diagonal -> vertical tap + lane-wrap
companion) must reproduce the XLA ``DiaMatrix.matvec`` CG exactly up to
f32 reduction reassociation, and track the f64 oracle on converging
SPD bands.  Covers the reference's m_t1 / parabolic_fem matrix classes
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


def test_dia_apply_taps_match_matvec():
    """The two-tap (direct + lane-wrap) application over the column-
    major grid equals the 1-D banded matvec exactly."""
    n, hb = 4000, 9
    A = DiaMatrix.from_scipy(banded_spd(n, hb, step=7))
    taps, grid, Bv, planes = prepare_dia_stream(A)
    nv, nh = grid
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n).astype(np.float32)
    xg = to_dia_grid(x, nv)
    Pv = max(abs(dm) for (dm, _), _ in taps)
    Pc = max(abs(dj) for (_, dj), _ in taps)
    xp = jnp.pad(xg, ((Pv, Pv), (Pc, Pc)))
    q = jnp.zeros(grid, jnp.float32)
    for (dm, dj), d in taps:
        q = q + planes[d] * xp[Pv + dm:Pv + dm + nv,
                               Pc + dj:Pc + dj + nh]
    got = np.asarray(from_dia_grid(q, n))
    want = np.asarray(A.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=1e-4 * np.abs(want).max())


@pytest.mark.parametrize("n,hb,chunk", [(4000, 9, 64), (4000, 9, 5),
                                        (3037, 4, 64)])
def test_stream_dia_matches_oracle(n, hb, chunk):
    """Full solve vs the f64 NumPy oracle and the XLA DiaMatrix CG
    (f32): the banded kernel's histories must track both on this
    converging SPD band (odd n exercises the grid zero-pad)."""
    from tpcg import block_cg, reference
    iters = 25
    As = banded_spd(n, hb)
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
