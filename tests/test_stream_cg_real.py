"""Real HBM-streaming CG (``tpcg.ops.stream_cg_real``) vs the XLA
oracle (``tpcg.cg.block_cg``), interpret mode.

Covers both coefficient modes (compile-time const taps + strip
corrections; streamed per-node coefficient planes), nonzero initial
guesses, and the const-tap fallback for variable coefficients.
Reference semantics: ``kernel/real/*.cl`` + ``clcg.c:111-466`` with
isComplex=0 (fixed iteration count, delta = <r, r>).
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from tpcg import block_cg
from tpcg.ops.stream_cg_real import (prepare_stream_real, stream_cg_real,
                                     stream_cg_real_planes)
from tpcg.problems.poisson import poisson


def _oracle_hist(A, b, iters):
    A32 = dataclasses.replace(A, coef=jnp.asarray(
        np.asarray(A.coef).astype(np.float32)))
    res = block_cg(A32, jnp.asarray(b.reshape(-1)), n_iterations=iters)
    return np.asarray(res.residual_history)


@pytest.mark.parametrize("mode", ["const", "coef"])
def test_real_stream_matches_xla(mode):
    N, iters = 64, 30
    A = poisson(N, dtype=np.float64)
    rng = np.random.default_rng(0)
    b = rng.standard_normal((N, N)).astype(np.float32)
    x, hist = stream_cg_real(A, b, n_iterations=iters, interpret=True,
                             const_taps=(mode == "const"))
    hs = _oracle_hist(A, b, iters)
    rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
    assert rel.max() < 1e-4, (mode, rel.max())
    # Poisson is SPD: 30 iterations must actually reduce the residual
    assert hist[-1] < 0.2 * hist[0]
    S = A.to_scipy().tocsr()
    r = np.linalg.norm(S @ np.asarray(x).reshape(-1).astype(np.float64)
                       - b.reshape(-1))
    assert r / np.linalg.norm(b) < 0.2


def test_real_stream_x0_and_blockrows():
    N, iters = 64, 20
    A = poisson(N, dtype=np.float64)
    rng = np.random.default_rng(1)
    b = rng.standard_normal((N, N)).astype(np.float32)
    x0 = rng.standard_normal((N, N)).astype(np.float32) * 0.1
    A32 = dataclasses.replace(A, coef=jnp.asarray(
        np.asarray(A.coef).astype(np.float32)))
    hs = np.asarray(block_cg(A32, jnp.asarray(b.reshape(-1)),
                             jnp.asarray(x0.reshape(-1)),
                             n_iterations=iters).residual_history)
    for bv in (16, 32):
        x, hist = stream_cg_real(A, b, x0=x0, n_iterations=iters,
                                 block_rows=bv, interpret=True)
        rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
        assert rel.max() < 1e-4, (bv, rel.max())


def test_real_varcoeff_falls_back_to_coef_mode():
    N, iters = 48, 15
    A = poisson(N, dtype=np.float64)
    rng = np.random.default_rng(2)
    c = np.asarray(A.coef).copy()
    c[0] += 0.3 * rng.random((N, N))          # variable diagonal
    Av = dataclasses.replace(A, coef=c)
    with pytest.raises(ValueError):
        prepare_stream_real(Av)
    b = rng.standard_normal((N, N)).astype(np.float32)
    x, hist = stream_cg_real(Av, b, n_iterations=iters, interpret=True)
    hs = _oracle_hist(Av, b, iters)
    rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
    assert rel.max() < 1e-4, rel.max()


def test_real_stream_rejects_complex():
    from tpcg.problems import helm_fe
    A = helm_fe(32, 9.0, eps=9.0)
    with pytest.raises(AssertionError):
        stream_cg_real(A, np.ones((32, 32), np.float32), interpret=True)
