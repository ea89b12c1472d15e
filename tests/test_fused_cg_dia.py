"""Fused whole-solve complex DIA CG (``tpcg.ops.fused_cg_dia``).

The VMEM-resident small-n banded complex tier (the mhd1280b class,
report Table I): same recurrence as the streaming DIA kernel with the
iteration loop inside one pallas_call.  Gates: the XLA pair-operator
oracle (``cplx.block_cg_planes``, the repo-wide pinned COCG oracle) and
the streaming kernel itself.  Reference semantics: COCG unconjugated
dots (``kernel/complex/vdot.cl:15``), fixed iteration count
(``clcg.c:297``), residual history |<r,r>|^(1/2) (``cl.py:120``).
"""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from tpcg.ops.cplx import block_cg_planes, make_pair_operator
from tpcg.ops.fused_cg_dia import (fused_cg_dia_cplx,
                                   fused_cg_dia_cplx_block,
                                   fused_dia_cplx_fits)
from tpcg.ops.stream_cg_dia import stream_cg_dia_cplx
from tpcg.sparse import DiaMatrix


def _banded_complex(n, offs, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for off in offs:
        i = np.arange(max(0, -off), min(n, n - off))
        v = ((rng.standard_normal(len(i))
              + 1j * rng.standard_normal(len(i))) * 0.1
             if off else np.full(len(i), 2.0 * len(offs) + 0.5j))
        rows.append(i)
        cols.append(i + off)
        vals.append(v)
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    return (A + A.T) * 0.5


def _oracle_hist(M, b, iters):
    n = int(M.n)
    P = make_pair_operator(M, dtype=jnp.float32)
    b2 = jnp.asarray(np.stack([b.real, b.imag]).reshape(2, n)[:, :, None]
                     .astype(np.float32))
    res = block_cg_planes(P, b2, n_iterations=iters)
    return np.asarray(res.residual_history)[:, 0]


@pytest.mark.parametrize("n,offs", [(1280, tuple(range(0, 9))),
                                    (777, (0, 1, 3, 40)),
                                    (300, (0, 2, 150))])
def test_fused_dia_cplx_vs_oracle(n, offs):
    """Whole solve tracks the XLA pair-operator COCG oracle (incl. a
    wrap-depth Ht=2 band and a non-multiple-of-128 n)."""
    A = _banded_complex(n, offs, seed=2)
    M = DiaMatrix.from_scipy(A.astype(np.complex64))
    rng = np.random.default_rng(1)
    b = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    iters = 40
    hs = _oracle_hist(M, b, iters)
    x, hist = fused_cg_dia_cplx(M, b, n_iterations=iters, interpret=True)
    hist = np.asarray(hist)
    assert hist.shape == (iters + 1,)
    # gate only the f32-meaningful range: these diagonally-dominant
    # systems underflow to exact-zero residual mid-run, and the two
    # programs cross that boundary one iteration apart (the repo-wide
    # live-entry methodology, tests/test_stream_cg_dia.py:89)
    live = hs > 1e-6 * hs[0]
    rel = np.abs(hist[live] - hs[live]) / hs[live]
    assert live.sum() >= 4 and rel.max() < 5e-3, (live.sum(), rel.max())
    # the solve itself converges on this diagonally-dominant system
    r = b - np.asarray(A.astype(np.complex64) @ x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-4


def test_fused_dia_cplx_matches_streaming():
    """Fused and streaming kernels run the same recurrence on the same
    column-major grid; interpret-mode histories must agree tightly."""
    n, offs = 1280, tuple(range(0, 9))
    A = _banded_complex(n, offs, seed=2)
    M = DiaMatrix.from_scipy(A.astype(np.complex64))
    rng = np.random.default_rng(4)
    b = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    x0 = 0.1 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    iters = 30
    xf, hf = fused_cg_dia_cplx(M, b, x0=x0, n_iterations=iters,
                               interpret=True)
    xs_, hs_ = stream_cg_dia_cplx(M, b, x0=x0, n_iterations=iters,
                                  interpret=True)
    hf, hs_ = np.asarray(hf), np.asarray(hs_)
    # live-entry gate (see test_fused_dia_cplx_vs_oracle): both kernels
    # underflow to zero mid-run; compare the meaningful range at the
    # interpret-mode reassociation tolerance (1e-3, NOTES_R3)
    live = hs_ > 1e-6 * hs_[0]
    rel = np.abs(hf[live] - hs_[live]) / hs_[live]
    assert live.sum() >= 4 and rel.max() < 1e-3, (live.sum(), rel.max())
    assert np.abs(xf - xs_).max() < 1e-4 * np.abs(xs_).max()


def test_fused_dia_cplx_block_columns_equal_single():
    """Multi-RHS wrapper: per-column histories equal single-RHS runs
    bit-for-bit (lax.map of the same program)."""
    n, offs = 640, (0, 1, 5)
    A = _banded_complex(n, offs, seed=7)
    M = DiaMatrix.from_scipy(A.astype(np.complex64))
    rng = np.random.default_rng(9)
    B = (rng.standard_normal((n, 3)) + 1j * rng.standard_normal((n, 3))) \
        .astype(np.complex64)
    iters = 12
    X, H = fused_cg_dia_cplx_block(M, B, n_iterations=iters,
                                   interpret=True)
    assert X.shape == (n, 3) and H.shape == (iters + 1, 3)
    for c in range(3):
        xc, hc = fused_cg_dia_cplx(M, B[:, c], n_iterations=iters,
                                   interpret=True)
        np.testing.assert_array_equal(H[:, c], np.asarray(hc))
        np.testing.assert_array_equal(X[:, c], xc)


def test_fused_dia_fit_rule():
    """Small bands fit; a wide million-row band does not (stays on the
    streaming/XLA paths)."""
    A = _banded_complex(1280, tuple(range(0, 9)))
    assert fused_dia_cplx_fits(DiaMatrix.from_scipy(A.astype(np.complex64)))
    big = DiaMatrix(offsets=np.arange(-60, 61),
                    data=np.ones((121, 2_000_000), np.complex64),
                    n=2_000_000)
    assert not fused_dia_cplx_fits(big)


def test_fused_dia_denormal_freeze():
    """Deep-converged run stays frozen: when |delta|^2 underflows (but
    delta itself is denormal-nonzero) the recurrence must freeze, not
    keep dividing by garbage-scale scalars -- pre-fix this exact
    problem's residual displayed 0 for ~90 iterations and then grew
    geometrically to overflow (inf at iteration ~261; round-5 notes /
    ``stream_cg._mag2_zero``)."""
    n = 1280
    A = _banded_complex(n, tuple(range(0, 9)), seed=2)
    # weak diagonal -> converges below the f32 |delta|^2 range fast
    A = A - sp.eye(n) * (A.diagonal()[0] - (1.2 + 0.25j) * 2) * 0.5
    M = DiaMatrix.from_scipy(sp.csr_matrix(A.astype(np.complex64)))
    rng = np.random.default_rng(4)
    b = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    iters = 400
    x, hist = fused_cg_dia_cplx(M, b, n_iterations=iters, interpret=True)
    hist = np.asarray(hist)
    assert np.all(np.isfinite(hist)), np.where(~np.isfinite(hist))[0][:3]
    z = np.where(hist == 0)[0]
    if len(z):     # once the displayed history hits zero it stays there
        assert np.all(hist[z[0]:] == 0.0), (z[0], hist[z[0]:][:5])
    xs_, hs_ = stream_cg_dia_cplx(M, b, n_iterations=iters,
                                  interpret=True)
    hs_ = np.asarray(hs_)
    assert np.all(np.isfinite(hs_))
    live = hs_ > 1e-6 * hs_[0]
    rel = np.abs(hist[live] - hs_[live]) / hs_[live]
    assert rel.max() < 1e-3, rel.max()


def test_fused_dia_converged_freeze():
    """delta == 0 (true convergence mid-chunk) freezes the recurrence:
    residual history stays at zero and x stops changing -- the oracle's
    freeze contract (``reference.py`` early-exit semantics)."""
    n = 256
    # identity system: converges in ONE iteration
    A = sp.eye(n, dtype=np.complex64, format="csr") * (2.0 + 0.0j)
    M = DiaMatrix.from_scipy(sp.csr_matrix(A))
    b = np.ones(n, np.complex64)
    x, hist = fused_cg_dia_cplx(M, b, n_iterations=8, interpret=True)
    hist = np.asarray(hist)
    assert hist[1] < 1e-5 * hist[0]
    assert np.all(hist[1:] == hist[1])
    assert np.allclose(x, b / 2.0, atol=1e-6)
