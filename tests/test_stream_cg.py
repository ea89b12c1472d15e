"""HBM-streaming fused CG (``tpcg.ops.stream_cg``) vs the XLA oracle.

The streaming path is the large-N production kernel (N=1024 runs at
~690 GFLOPS on v5e); these tests pin its residual-history parity with
``block_cg_planes`` (itself oracle-tested against NumPy/scipy) in Pallas
interpret mode, including the boundary-row side outputs and the
in-kernel alpha/beta SMEM math.

Reference semantics under test: COCG unconjugated dots
(``kernel/complex/vdot.cl:15``), fixed iteration count
(``clcg.c:297``), residual-history definition of ``cl.py:120``.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpcg.ops.cplx import block_cg_planes, make_pair_operator
from tpcg.ops.stream_cg import (prepare_stream, stream_cg_const,
                                stream_cg_const_planes, _pick_block_rows)
from tpcg.problems import helm_fe, plane_wave_rhs


def _oracle_hist(A, b, iters):
    n = A.grid[0] * A.grid[1]
    P = make_pair_operator(A, dtype=jnp.float32)
    b2 = jnp.asarray(np.stack([b.real, b.imag]).reshape(2, n)[:, :, None]
                     .astype(np.float32))
    res = block_cg_planes(P, b2, n_iterations=iters)
    return np.asarray(res.residual_history)[:, 0]


@pytest.mark.parametrize("N,iters", [(64, 30), (128, 20)])
def test_stream_matches_xla_history(N, iters):
    k = 12.0
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    x, hist = stream_cg_const(A, b, n_iterations=iters, interpret=True)
    hs = _oracle_hist(A, b, iters)
    rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
    assert rel.max() < 5e-3, rel.max()
    # solution itself: residual through the exact scipy operator
    S = A.to_scipy().tocsr()
    xc = np.asarray(x[0] + 1j * x[1]).reshape(-1)
    r = np.linalg.norm(S @ xc - b.reshape(-1))
    assert r < np.linalg.norm(b) , r


def test_stream_nonzero_x0_and_blockrows():
    N, iters, k = 64, 15, 9.0
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    rng = np.random.default_rng(0)
    x0 = (rng.standard_normal((N, N)) +
          1j * rng.standard_normal((N, N))).astype(np.complex64) * 0.1
    # oracle with the same x0
    n = N * N
    P = make_pair_operator(A, dtype=jnp.float32)
    b2 = jnp.asarray(np.stack([b.real, b.imag]).reshape(2, n)[:, :, None]
                     .astype(np.float32))
    x02 = jnp.asarray(np.stack([x0.real, x0.imag]).reshape(2, n)[:, :, None]
                      .astype(np.float32))
    hs = np.asarray(block_cg_planes(P, b2, x0=x02, n_iterations=iters)
                    .residual_history)[:, 0]
    for bv in (16, 32):
        x, hist = stream_cg_const(A, b, x0=x0, n_iterations=iters,
                                  block_rows=bv, interpret=True)
        rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
        assert rel.max() < 5e-3, (bv, rel.max())


def test_stream_coef_matches_xla_history():
    """Variable-coefficient streaming path (coefficients ride the same
    row-block pipeline as the state)."""
    from tpcg.ops.stream_cg import stream_cg_coef
    from tpcg.problems import helm_fe_var
    N, iters, k = 64, 25, 12.0
    rng = np.random.default_rng(2)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    A = helm_fe_var(N, k, C, rho=0.1)
    b = plane_wave_rhs(N, k)
    x, hist = stream_cg_coef(A, b, n_iterations=iters, interpret=True)
    hs = _oracle_hist(A, b, iters)
    rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
    assert rel.max() < 5e-3, rel.max()


def test_stream_odd_grid_height():
    """Odd grid heights (the distributed solver's N = (W-1)*M + 1
    family) must still stream in row blocks -- regression for
    _pick_block_rows degenerating to one whole-grid block."""
    from tpcg.ops.stream_cg import _pick_block_rows
    assert _pick_block_rows(65) == 13            # divisor fallback
    N, iters, k = 65, 15, 9.0
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    x, hist = stream_cg_const(A, b, n_iterations=iters, interpret=True)
    hs = _oracle_hist(A, b, iters)
    rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
    assert rel.max() < 5e-3, rel.max()


def test_stream_coef_batched_matches_oracle():
    """The multi-RHS coefficient-streaming kernel: per-RHS independent
    alpha/beta (``clcg.c:317-333``), coefficient blocks shared across
    the batch."""
    import jax.numpy as jnp
    from tpcg.ops.stream_cg import (prepare_stream_coef,
                                    stream_cg_coef_planes_batched)
    from tpcg.problems import helm_fe_var
    N, nb, iters, k = 64, 3, 20, 12.0
    rng = np.random.default_rng(5)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    A = helm_fe_var(N, k, C, rho=0.1)
    B = np.stack([plane_wave_rhs(N, k) * (1 + 0.2j * r)
                  for r in range(nb)])
    coefp = prepare_stream_coef(A)
    bp = jnp.asarray(np.stack([B.real, B.imag]).astype(np.float32))
    x, hist = stream_cg_coef_planes_batched(
        A.offsets, A.grid, coefp, bp, jnp.zeros_like(bp), iters,
        interpret=True)
    from tpcg.ops.cplx import block_cg_planes, make_pair_operator
    P = make_pair_operator(A, dtype=jnp.float32)
    b2 = jnp.asarray(np.stack([B.real, B.imag]).reshape(2, nb, N * N)
                     .transpose(0, 2, 1).astype(np.float32))
    hs = np.asarray(block_cg_planes(P, b2, n_iterations=iters)
                    .residual_history)
    rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
    assert rel.max() < 5e-3, rel.max()


def test_stream_coef_batched_fat_matches_oracle():
    """The fat-block batched variant (all RHS per grid step -- true
    coefficient sharing) against the XLA oracle."""
    from tpcg.ops.stream_cg import (prepare_stream_coef,
                                    stream_cg_coef_planes_batched_fat)
    from tpcg.problems import helm_fe_var
    N, nb, iters, k = 64, 3, 20, 12.0
    rng = np.random.default_rng(5)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    A = helm_fe_var(N, k, C, rho=0.1)
    B = np.stack([plane_wave_rhs(N, k) * (1 + 0.2j * r)
                  for r in range(nb)])
    coefp = prepare_stream_coef(A)
    bp = jnp.asarray(np.stack([B.real, B.imag]).astype(np.float32))
    x, hist = stream_cg_coef_planes_batched_fat(
        A.offsets, A.grid, coefp, bp, jnp.zeros_like(bp), iters,
        interpret=True)
    P = make_pair_operator(A, dtype=jnp.float32)
    b2 = jnp.asarray(np.stack([B.real, B.imag]).reshape(2, nb, N * N)
                     .transpose(0, 2, 1).astype(np.float32))
    hs = np.asarray(block_cg_planes(P, b2, n_iterations=iters)
                    .residual_history)
    rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
    assert rel.max() < 5e-3, rel.max()


def test_stream_const_batched_matches_oracle():
    """The multi-RHS constant-tap streaming kernel (one program per
    iteration for the whole batch) against the XLA oracle, including a
    nonzero initial guess."""
    from tpcg.ops.stream_cg import (prepare_stream,
                                    stream_cg_const_planes_batched)
    N, nb, iters, k = 64, 4, 20, 12.0
    A = helm_fe(N, k, eps=k)
    B = np.stack([plane_wave_rhs(N, k) * (1 + 0.3j * r)
                  for r in range(nb)])
    rng = np.random.default_rng(7)
    X0 = 0.1 * (rng.standard_normal(B.shape)
                + 1j * rng.standard_normal(B.shape))
    taps, strips2 = prepare_stream(A)
    bp = jnp.asarray(np.stack([B.real, B.imag]).astype(np.float32))
    x0p = jnp.asarray(np.stack([X0.real, X0.imag]).astype(np.float32))
    x, hist = stream_cg_const_planes_batched(
        A.offsets, A.grid, taps, strips2, bp, x0p, iters, interpret=True)
    P = make_pair_operator(A, dtype=jnp.float32)
    b2 = jnp.asarray(np.stack([B.real, B.imag]).reshape(2, nb, N * N)
                     .transpose(0, 2, 1).astype(np.float32))
    x02 = jnp.asarray(np.stack([X0.real, X0.imag]).reshape(2, nb, N * N)
                      .transpose(0, 2, 1).astype(np.float32))
    res = block_cg_planes(P, b2, x0=x02, n_iterations=iters)
    hs = np.asarray(res.residual_history)
    rel = np.abs(np.asarray(hist) - hs) / (np.abs(hs) + 1e-30)
    assert rel.max() < 5e-3, rel.max()
    # the batched kernel is the SAME arithmetic as the single-RHS
    # streaming kernel, per RHS -- pin bit-level equality
    for r in range(nb):
        xs, hs1 = stream_cg_const_planes(
            A.offsets, A.grid, taps, strips2, bp[:, r], x0p[:, r],
            iters, interpret=True)
        np.testing.assert_array_equal(np.asarray(x)[:, r],
                                      np.asarray(xs))
        np.testing.assert_array_equal(np.asarray(hist)[:, r],
                                      np.asarray(hs1))


@pytest.mark.parametrize("keep_r", [True, False])
def test_stream_v3_const_bit_matches_v2(keep_r):
    """The merged one-call-per-iteration kernel (q/dnew -- and r when
    keep_r -- resident in VMEM scratch across the two phases) performs
    the IDENTICAL arithmetic to the v2 two-kernel iteration; solutions
    and histories must match bit-for-bit."""
    from tpcg.ops.stream_cg_v3 import stream_cg_v3_const_planes
    N, iters, k = 64, 15, 9.0
    A = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    rng = np.random.default_rng(3)
    x0 = 0.1 * (rng.standard_normal((N, N))
                + 1j * rng.standard_normal((N, N)))
    taps, strips2 = prepare_stream(A)
    bp = jnp.asarray(np.stack([b.real, b.imag]).astype(np.float32))
    x0p = jnp.asarray(np.stack([x0.real, x0.imag]).astype(np.float32))
    x2, h2 = stream_cg_const_planes(A.offsets, A.grid, taps, strips2,
                                    bp, x0p, iters, interpret=True)
    x3, h3 = stream_cg_v3_const_planes(A.offsets, A.grid, taps, strips2,
                                       bp, x0p, iters, keep_r=keep_r,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(x3), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(h3), np.asarray(h2))


@pytest.mark.parametrize("keep_r", [True, False])
def test_stream_v3_coef_bit_matches_v2(keep_r):
    from tpcg.ops.stream_cg import (prepare_stream_coef,
                                    stream_cg_coef_planes)
    from tpcg.ops.stream_cg_v3 import stream_cg_v3_coef_planes
    from tpcg.problems import helm_fe_var
    N, iters, k = 64, 15, 12.0
    rng = np.random.default_rng(4)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    A = helm_fe_var(N, k, C, rho=0.1)
    b = plane_wave_rhs(N, k)
    coefp = prepare_stream_coef(A)
    bp = jnp.asarray(np.stack([b.real, b.imag]).astype(np.float32))
    x0p = jnp.zeros_like(bp)
    x2, h2 = stream_cg_coef_planes(A.offsets, A.grid, coefp, bp, x0p,
                                   iters, interpret=True)
    x3, h3 = stream_cg_v3_coef_planes(A.offsets, A.grid, coefp, bp, x0p,
                                      iters, keep_r=keep_r,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(x3), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(h3), np.asarray(h2))


def test_prepare_stream_rejects_nonconst_edges():
    from tpcg.problems import helm_fe_var
    N = 32
    rng = np.random.default_rng(1)
    C = 1.0 + 0.5 * rng.random((N - 1, N - 1))
    A = helm_fe_var(N, 12.0, C, rho=0.1)
    with pytest.raises(ValueError):
        prepare_stream(A)


def test_pick_block_rows():
    assert _pick_block_rows(1024) == 128
    assert _pick_block_rows(64) == 32 or 64 % _pick_block_rows(64) == 0
    for nv in (64, 96, 128, 512, 1024, 2048):
        bv = _pick_block_rows(nv)
        assert nv % bv == 0 and nv // bv >= 2
