"""Complex banded-streaming CG (``tpcg.ops.stream_cg_dia`` COCG twin).

The mhd1280b class (report Table I: complex n=1,280 band) previously
ran the XLA pair-operator shift-multiply; the complex kernel's
histories must track ``block_cg_planes`` (the COCG oracle the whole
complex stack is pinned to) and solutions must solve the system.
Matrices are complex SYMMETRIC (A = A^T, not Hermitian) -- COCG's
contract (``kernel/complex/vdot.cl:15`` unconjugated dots).
"""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from tpcg.sparse import DiaMatrix
from tpcg.ops.cplx import block_cg_planes, make_pair_operator
from tpcg.ops.stream_cg_dia import (dia_apply_grid_cplx,
                                    dia_stream_cplx_fits,
                                    prepare_dia_stream_cplx,
                                    stream_cg_dia_cplx,
                                    stream_cg_dia_cplx_block,
                                    to_dia_grid_cplx, from_dia_grid_cplx)


def banded_cplx_sym(n, half_band, seed=0, step=1):
    """Complex symmetric (A = A^T), diagonally dominant band."""
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    offs = [0] + [o for k in range(1, half_band + 1)
                  for o in (k * step, -k * step)]
    for off in offs:
        i = np.arange(max(0, -off), min(n, n - off))
        if off == 0:
            v = np.full(len(i), 4.0 * half_band + 0.0j) \
                + 0.5j * rng.standard_normal(len(i))
        else:
            v = (rng.standard_normal(len(i))
                 + 1j * rng.standard_normal(len(i))) * 0.2
        rows.append(i)
        cols.append(i + off)
        vals.append(v.astype(np.complex64))
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    return ((A + A.T) * 0.5).tocsr()


def planes_of(z):
    return jnp.asarray(np.stack([z.real, z.imag]).astype(np.float32))


@pytest.mark.parametrize("n,hb,step", [(2000, 6, 1), (2000, 3, 9)])
def test_dia_apply_cplx_matches_matvec(n, hb, step):
    """Complex tap application against the wrap-filled pads equals the
    scipy matvec (step=9 exercises a multi-column halo on small nv)."""
    As = banded_cplx_sym(n, hb, step=step)
    A = DiaMatrix.from_scipy(As)
    taps, grid, Bv, planes2 = prepare_dia_stream_cplx(A)
    nv, _ = grid
    rng = np.random.default_rng(1)
    z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    q = dia_apply_grid_cplx(taps, grid, planes2, to_dia_grid_cplx(z, nv))
    got = from_dia_grid_cplx(q, n)
    want = As @ z
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=1e-4 * np.abs(want).max())


@pytest.mark.parametrize("n,hb,chunk", [(1280, 8, 64), (1280, 8, 7),
                                        (1999, 4, 64)])
def test_stream_dia_cplx_matches_planes_oracle(n, hb, chunk):
    """Full solve vs ``block_cg_planes`` on the pair operator: history
    tracking + solution agreement (odd n exercises the grid zero-pad;
    chunk=7 exercises the deferred-update chunk boundary)."""
    iters = 30
    As = banded_cplx_sym(n, hb, seed=2)
    A = DiaMatrix.from_scipy(As)
    rng = np.random.default_rng(3)
    b = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    x, h = stream_cg_dia_cplx(A, b, n_iterations=iters, chunk=chunk,
                              interpret=True)
    h = np.asarray(h)
    assert h.shape == (iters + 1,)
    assert np.all(np.isfinite(h))
    P = make_pair_operator(A, dtype=jnp.float32)
    res = block_cg_planes(P, planes_of(b), n_iterations=iters)
    hx = np.asarray(res.residual_history).reshape(-1)
    live = hx > 1e-5 * hx[0]
    assert live.sum() >= 4
    rel = np.max(np.abs(h[live] - hx[live]) / hx[live])
    assert rel < 1e-3, rel
    xx = np.asarray(res.x[0]) + 1j * np.asarray(res.x[1])
    xx = xx.reshape(-1)
    assert np.abs(np.asarray(x) - xx).max() < 1e-3 * np.abs(xx).max()
    # and the solve actually solves (f64 true residual)
    r = np.linalg.norm(As.astype(np.complex128) @ np.asarray(x) - b) \
        / np.linalg.norm(b)
    assert r < 1e-3, r


def test_stream_dia_cplx_x0():
    """Nonzero x0 converges to the true solution.  (Iteration count is
    deliberately moderate: f32 COCG on these tiny bands BREAKS DOWN far
    past convergence -- the unconjugated <r,r> underflows, beta =
    delta_new/delta blows up and the XLA ``block_cg_planes`` oracle
    itself NaNs at ~150 iterations on this matrix.  The kernel matches
    the oracle's behaviour there; the freeze guard only catches EXACT
    zeros, per the oracle's own contract.)"""
    n, iters = 1280, 60
    As = banded_cplx_sym(n, 3, seed=4)
    A = DiaMatrix.from_scipy(As)
    rng = np.random.default_rng(5)
    b = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    x0 = 0.1 * (rng.standard_normal(n)
                + 1j * rng.standard_normal(n)).astype(np.complex64)
    x, h = stream_cg_dia_cplx(A, b, x0=x0, n_iterations=iters, chunk=50,
                              interpret=True)
    h = np.asarray(h)
    assert np.all(np.isfinite(h)) and np.all(np.isfinite(np.asarray(x)))
    r = np.linalg.norm(As.astype(np.complex128) @ np.asarray(x) - b) \
        / np.linalg.norm(b)
    assert r < 1e-4, r


def test_stream_dia_cplx_exact_zero_freeze():
    """delta0 == 0 exactly (zero RHS, zero guess) must freeze at zero
    through many chunks -- the done-flag path end-to-end -- not NaN on
    the 0/0 alpha."""
    n, iters = 1280, 100
    As = banded_cplx_sym(n, 3, seed=4)
    A = DiaMatrix.from_scipy(As)
    b = np.zeros(n, np.complex64)
    x, h = stream_cg_dia_cplx(A, b, n_iterations=iters, chunk=32,
                              interpret=True)
    assert np.all(np.asarray(h) == 0.0)
    assert np.all(np.asarray(x) == 0.0)


def test_block_multirhs_cplx_matches_single():
    """The multi-RHS surface (lax.map of single-RHS solves) equals
    per-column solves to fp rounding (the ``lax.map`` wrapper changes
    XLA's reduction-fusion context for the inter-chunk scalar glue, so
    interpret-mode results drift at the last f32 bit -- the
    batched-parity phenomenon documented in NOTES_R3)."""
    n, iters, nrhs = 1280, 20, 3
    As = banded_cplx_sym(n, 5, seed=6)
    A = DiaMatrix.from_scipy(As)
    rng = np.random.default_rng(7)
    B = (rng.standard_normal((n, nrhs))
         + 1j * rng.standard_normal((n, nrhs))).astype(np.complex64)
    X, H = stream_cg_dia_cplx_block(A, B, n_iterations=iters,
                                    interpret=True)
    assert X.shape == (n, nrhs) and np.asarray(H).shape == (iters + 1, nrhs)
    H = np.asarray(H)
    for c in range(nrhs):
        xc, hc = stream_cg_dia_cplx(A, B[:, c], n_iterations=iters,
                                    interpret=True)
        xc = np.asarray(xc)
        np.testing.assert_allclose(X[:, c], xc, rtol=0,
                                   atol=2e-5 * np.abs(xc).max())
        hc = np.asarray(hc)
        live = hc > 1e-5 * hc[0]
        np.testing.assert_allclose(H[live, c], hc[live], rtol=2e-4)


def test_api_cplx_banded_dispatches_dia_kernels(monkeypatch):
    """``_solve_planes`` routes complex banded DiaMatrix operands to
    the DIA kernel tiers on TPU backends (forced here with the
    interpret kernel): the fused whole-solve tier first (small
    VMEM-resident operands, the mhd1280b class), the streaming kernel
    when the fused fit rule refuses; solutions match scipy spsolve."""
    import scipy.sparse.linalg as spla
    import jax
    from tpcg import api

    n, iters, nrhs = 1280, 40, 2
    As = banded_cplx_sym(n, 4, seed=8)
    A = DiaMatrix.from_scipy(As)
    rng = np.random.default_rng(9)
    B = (rng.standard_normal((n, nrhs))
         + 1j * rng.standard_normal((n, nrhs))).astype(np.complex64)

    called = {}
    import tpcg.ops.fused_cg_dia as fd
    import tpcg.ops.stream_cg_dia as sd
    orig_f = fd.fused_cg_dia_cplx_block
    orig_s = sd.stream_cg_dia_cplx_block

    def spy_f(*a, **k):
        called.setdefault("order", []).append("fused")
        return orig_f(*a, **k)

    def spy_s(*a, **k):
        called.setdefault("order", []).append("stream")
        return orig_s(*a, **k)

    monkeypatch.setattr(fd, "fused_cg_dia_cplx_block", spy_f)
    monkeypatch.setattr(sd, "stream_cg_dia_cplx_block", spy_s)
    # _solve_planes gates on the default backend; force the TPU branch
    # while the kernels themselves run in interpret mode (CPU devices)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    X, H = api._solve_planes(A, B, None, iters)
    assert called["order"] == ["fused"]
    assert X.shape == (n, nrhs) and H.shape == (iters + 1, nrhs)
    for c in range(nrhs):
        xs = spla.spsolve(As.astype(np.complex128).tocsc(),
                          B[:, c].astype(np.complex128))
        np.testing.assert_allclose(X[:, c], xs, rtol=0,
                                   atol=1e-3 * np.abs(xs).max())

    # operands past the fused budget fall to the streaming kernel
    called["order"] = []
    monkeypatch.setattr(fd, "fused_dia_cplx_fits", lambda *a, **k: False)
    X2, _H2 = api._solve_planes(A, B, None, iters)
    assert called["order"] == ["stream"]
    np.testing.assert_allclose(X2, X, rtol=0, atol=2e-4 * np.abs(X).max())


def test_dia_stream_cplx_fit_rule():
    """mhd1280b geometry fits; a huge wide complex band does not."""
    from types import SimpleNamespace
    mhd = SimpleNamespace(n=1280, offsets=tuple(range(-8, 9)))
    assert dia_stream_cplx_fits(mhd)
    big = SimpleNamespace(n=8_000_000, offsets=tuple(
        [0] + [o for k in range(1, 101) for o in (1000 * k, -1000 * k)]))
    assert not dia_stream_cplx_fits(big)
