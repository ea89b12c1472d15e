"""Symmetric-coefficient resident streaming CG
(``tpcg.ops.stream_cg_v4_sym``).

The half-plane representation must reconstruct the full coefficient
planes bit-exactly (CG symmetry is the contract); the kernel's pair
split changes only the matvec add order, so histories are gated
against the XLA oracle (like every streaming kernel) while the two
q-handling tiers and chunked runs pin each other bit-exactly.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpcg.ops.cplx import block_cg_planes, make_pair_operator
from tpcg.ops.stream_cg import prepare_stream_coef
from tpcg.ops.stream_cg_v4_sym import (prepare_stream_sym,
                                       reconstruct_coef,
                                       stream_cg_v4_sym,
                                       stream_cg_v4_sym_planes)
from tpcg.problems import helm_fe, helm_fe_var, plane_wave_rhs


def _var_problem(N, k=12.0):
    rng = np.random.default_rng(7)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    A = helm_fe_var(N, k, C, rho=0.1)
    return A, plane_wave_rhs(N, k)


def test_sym_reconstruction_exact():
    """Half planes -> full planes must equal prepare_stream_coef
    bit-for-bit (the symmetry identity, not an approximation)."""
    A, _ = _var_problem(48)
    half, cplanes = prepare_stream_sym(A)
    full = reconstruct_coef(A.offsets, half, cplanes, A.grid)
    np.testing.assert_array_equal(np.asarray(full),
                                  np.asarray(prepare_stream_coef(A)))
    assert len(half) == (len(A.offsets) + 1) // 2


def test_sym_rejects_nonsymmetric():
    A, _ = _var_problem(32)
    c = np.asarray(A.coef).copy()
    c[1] *= 1.5   # break symmetry on one off-diagonal plane
    import dataclasses
    B = dataclasses.replace(A, coef=c)
    with pytest.raises(ValueError, match="not symmetric"):
        prepare_stream_sym(B)


def _oracle_hist(A, b, iters):
    n = A.grid[0] * A.grid[1]
    P = make_pair_operator(A, dtype=jnp.float32)
    b2 = jnp.asarray(np.stack([b.real, b.imag]).reshape(2, n)[:, :, None]
                     .astype(np.float32))
    res = block_cg_planes(P, b2, n_iterations=iters)
    return np.asarray(res.residual_history)[:, 0]


@pytest.mark.parametrize("keep_q", [True, False])
def test_sym_matches_coef_path(keep_q):
    """Histories must track the general coef-planes kernel (the pair
    split reuses bit-identical coefficient values; measured bit-exact
    at matched block size) and the XLA oracle."""
    from tpcg.ops.stream_cg import stream_cg_coef_planes
    N, iters = 64, 25
    A, b = _var_problem(N)
    bp = jnp.asarray(np.stack([b.real, b.imag]).astype(np.float32))
    x0p = jnp.zeros_like(bp)
    x2, h2 = stream_cg_coef_planes(A.offsets, A.grid,
                                   prepare_stream_coef(A), bp, x0p,
                                   iters, interpret=True)
    x, hist = stream_cg_v4_sym(A, b, n_iterations=iters, keep_q=keep_q,
                               interpret=True)
    rel2 = (np.abs(np.asarray(hist) - np.asarray(h2))
            / (np.abs(np.asarray(h2)) + 1e-30))
    assert rel2.max() < 1e-5, rel2.max()
    hs = _oracle_hist(A, b, iters)
    rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
    assert rel.max() < 5e-3, rel.max()


def test_sym_tiers_and_chunks_bit_match():
    """keep_q vs recompute-q and chunked vs single-call runs perform
    identical arithmetic."""
    N, iters = 64, 15
    A, b = _var_problem(N)
    half, cplanes = prepare_stream_sym(A)
    bp = jnp.asarray(np.stack([b.real, b.imag]).astype(np.float32))
    x0p = jnp.zeros_like(bp)

    def run(**kw):
        return stream_cg_v4_sym_planes(A.offsets, A.grid, half, cplanes,
                                       bp, x0p, iters, interpret=True,
                                       **kw)

    xa, ha = run(keep_q=True)
    for kw in ({"keep_q": False}, {"keep_q": True, "chunk": 6},
               {"keep_q": False, "chunk": 7}):
        xb, hb = run(**kw)
        np.testing.assert_array_equal(np.asarray(xb), np.asarray(xa))
        np.testing.assert_array_equal(np.asarray(hb), np.asarray(ha))


def test_sym_q_hbm_matches_oracle():
    """The sym q_hbm tier (explicit-DMA q round-trip, coefficient
    planes fetched only in phase 0) against the XLA oracle; elementwise
    x is bit-equal to the recompute tier after one chunk (histories
    differ only by interpret-mode reduction reassociation; bit-exact on
    HW, see stream_cg_v4 notes)."""
    N, iters = 64, 25
    A, b = _var_problem(N)
    half, cplanes = prepare_stream_sym(A)
    bp = jnp.asarray(np.stack([b.real, b.imag]).astype(np.float32))
    x0p = jnp.zeros_like(bp)
    x, hist = stream_cg_v4_sym_planes(A.offsets, A.grid, half, cplanes,
                                      bp, x0p, iters, keep_q=False,
                                      q_hbm=True, interpret=True)
    hs = _oracle_hist(A, b, iters)
    rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
    assert rel.max() < 5e-3, rel.max()


def test_sym_const_problem_also_works():
    """helm_fe (constant coefficients) is symmetric too -- the sym path
    must solve it correctly (planner prefers const taps there, but the
    kernel contract is any symmetric stencil)."""
    N, iters, k = 64, 20, 9.0
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    x, hist = stream_cg_v4_sym(A, b, n_iterations=iters, interpret=True)
    hs = _oracle_hist(A, b, iters)
    rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
    assert rel.max() < 5e-3, rel.max()
