"""Fused Pallas CG kernel (interpret mode) == planes block-CG == oracle."""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

# the MXU formulation lives under benchmarks/ as a measured negative
# result (benchmarks/fused_cg_mxu.py docstring); its exactness is still
# pinned here
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

from tpcg import reference
from tpcg.ops import (block_cg_planes, from_planes, make_pair_operator,
                      to_planes)
from tpcg.ops.fused_cg import fused_cg
from tpcg.problems import helm_fe, poisson, plane_wave_rhs


def test_fused_matches_planes_complex():
    N, k = 16, 5.0
    S = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    B = np.stack([b, 2 * b])
    x, hist = fused_cg(S, B, n_iterations=25, interpret=True)
    P = make_pair_operator(S, dtype=jnp.float32)
    ref = block_cg_planes(P, to_planes(B.reshape(2, -1).T, jnp.float32),
                          n_iterations=25)
    xf = from_planes(np.asarray(x)).reshape(2, -1)
    xr = from_planes(np.asarray(ref.x)).T
    scale = np.abs(xr).max()
    np.testing.assert_allclose(xf, xr, rtol=0, atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(hist),
                               np.asarray(ref.residual_history),
                               rtol=2e-2, atol=1e-3 * float(hist[0, 0]))


def test_fused_matches_oracle_real():
    """Real Poisson system against the float64 NumPy oracle."""
    S = poisson(16)
    n = 256
    b = np.ones(n)
    x, hist = fused_cg(S, b.reshape(16, 16), n_iterations=40,
                       interpret=True)
    x_ref, hist_ref = reference.cg(S.to_scipy(), b, n_iterations=40,
                                   record_history=True)
    xf = from_planes(np.asarray(x)).reshape(-1)
    np.testing.assert_allclose(xf.real, x_ref, rtol=1e-3, atol=1e-4)
    assert np.abs(xf.imag).max() == 0.0
    np.testing.assert_allclose(np.asarray(hist)[:, 0], hist_ref,
                               rtol=5e-2, atol=1e-3)


def test_fused_initial_guess_and_single_rhs():
    N, k = 12, 4.0
    S = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N))
    x, hist = fused_cg(S, b, x0=x0, n_iterations=15, interpret=True)
    P = make_pair_operator(S, dtype=jnp.float32)
    ref = block_cg_planes(P, to_planes(b.reshape(-1), jnp.float32),
                          to_planes(x0.reshape(-1), jnp.float32),
                          n_iterations=15)
    xf = from_planes(np.asarray(x)).reshape(-1)
    xr = from_planes(np.asarray(ref.x))
    np.testing.assert_allclose(xf, xr, rtol=0,
                               atol=2e-3 * np.abs(xr).max())


def test_fused_const_matches_general():
    from tpcg.ops.fused_cg_const import fused_cg_const
    N, k = 20, 5.0
    S = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    B = np.stack([b, 2 * b, 3 * b])
    xc, hc = fused_cg_const(S, B, n_iterations=25, interpret=True)
    xg, hg = fused_cg(S, B, n_iterations=25, interpret=True)
    scale = np.abs(np.asarray(xg)).max()
    np.testing.assert_allclose(np.asarray(xc), np.asarray(xg), rtol=0,
                               atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(hc), np.asarray(hg), rtol=2e-2,
                               atol=1e-3 * float(hg[0, 0]))


def test_fused_const_poisson_oracle():
    from tpcg.ops.fused_cg_const import fused_cg_const
    S = poisson(16)
    b = np.ones((16, 16))
    x, hist = fused_cg_const(S, b, n_iterations=40, interpret=True)
    x_ref = reference.cg(S.to_scipy(), b.reshape(-1), n_iterations=40)
    xf = from_planes(np.asarray(x)).reshape(-1)
    np.testing.assert_allclose(xf.real, x_ref, rtol=1e-3, atol=1e-4)


def test_split_const_stencil_rejects_variable():
    from tpcg.ops.fused_cg_const import split_const_stencil
    from tpcg.problems import helm_fe_var
    import pytest as _pytest
    rng = np.random.default_rng(0)
    S = helm_fe_var(12, 5.0, 0.5 + rng.random((11, 11)), 0.1)
    with _pytest.raises(ValueError):
        split_const_stencil(S)


def test_split_const_stencil_exact():
    """C + D must reproduce the full operator exactly."""
    from tpcg.ops.fused_cg_const import split_const_stencil
    N, k = 16, 5.0
    S = helm_fe(N, k, eps=k)
    consts, strips = split_const_stencil(S)
    c = np.asarray(S.coef)
    # interior equals consts
    assert np.allclose(c[:, 3, 3], consts)
    # reconstruct: full const + strips == coef wherever the tap exists
    rec = np.broadcast_to(consts[:, None, None], c.shape).copy()
    rec[:, 0, :] += strips["bot"]
    rec[:, N - 1, :] += strips["top"]
    rec[:, 1:N - 1, 0] += strips["left"]
    rec[:, 1:N - 1, N - 1] += strips["right"]
    # where the tap leaves the grid the apply reads zero, so only compare
    # where the assembled coefficient is nonzero
    mask = c != 0
    np.testing.assert_allclose(rec[mask], c[mask], rtol=1e-12)


def test_fused_mxu_matches_general():
    """The MXU (banded lane-matmul) formulation must reproduce the VPU
    fused kernel on the helm_fem class -- per-column coefficient profiles
    + boundary-row strips are an exact re-expression of the stencil."""
    from fused_cg_mxu import fused_cg_mxu, prepare_mxu
    N, k = 20, 5.0
    S = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    # the H construction must be exact: check one apply against to_scipy
    H, (sb3, st3), dms = prepare_mxu(S)
    rng = np.random.default_rng(2)
    v = rng.standard_normal((N, N))
    Hn = np.asarray(H)
    q = np.zeros((N, N))
    from tpcg.ops.fused_cg import _pad_for
    P = _pad_for(S.offsets)
    vp = np.zeros((N + 2 * P, N + 2 * P))
    vp[P:P + N, P:P + N] = v
    for t, dm in enumerate(dms):
        q += vp[P + dm:P + dm + N, P:P + N] @ Hn[0, t]
    q[0] += np.einsum("sj,sj->j", np.asarray(sb3)[0, :, 0, :],
                      np.stack([vp[P + dm:P + dm + 1,
                                   P + dj:P + dj + N][0]
                                for dm, dj in S.offsets]))
    q[N - 1] += np.einsum("sj,sj->j", np.asarray(st3)[0, :, 0, :],
                          np.stack([vp[P + N - 1 + dm:P + N + dm,
                                       P + dj:P + dj + N][0]
                                    for dm, dj in S.offsets]))
    want = (S.to_scipy().real @ v.reshape(-1)).reshape(N, N)
    np.testing.assert_allclose(q, want, rtol=1e-5, atol=1e-5)

    # end-to-end: full solves match the general fused kernel
    B = np.stack([b, 2 * b, 3 * b])
    xm, hm = fused_cg_mxu(S, B, n_iterations=25, interpret=True)
    xg, hg = fused_cg(S, B, n_iterations=25, interpret=True)
    scale = np.abs(np.asarray(xg)).max()
    np.testing.assert_allclose(np.asarray(xm), np.asarray(xg), rtol=0,
                               atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(hm), np.asarray(hg), rtol=2e-2,
                               atol=1e-3 * float(hg[0, 0]))
    # single RHS takes the unrolled-scalar body
    xs, hs = fused_cg_mxu(S, b, n_iterations=25, interpret=True)
    xg1, _ = fused_cg(S, b, n_iterations=25, interpret=True)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xg1), rtol=0,
                               atol=2e-3 * scale)


def test_fused_chunked_matches_monolithic():
    """Batches beyond the fused kernel's compile cap run as a scan of
    chunk-sized kernels in one program; results must equal the
    monolithic kernel per RHS, including a padded final chunk."""
    from tpcg.ops.fused_cg import fused_cg_stencil_chunked, prepare_coef3
    N, k = 12, 4.0
    S = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    nb = 5                                   # 3 chunks of 2, one padded
    B = np.stack([(r + 1) * b for r in range(nb)])
    bp = jnp.asarray(np.stack([B.real, B.imag]).astype(np.float32))
    x0 = jnp.zeros_like(bp)
    coef3 = prepare_coef3(S)
    xc, hc = fused_cg_stencil_chunked(S.offsets, coef3, bp, x0, 15,
                                      chunk=2, interpret=True)
    xm, hm = fused_cg(S, B, n_iterations=15, interpret=True)
    assert xc.shape == (2, nb, N, N) and hc.shape == (16, nb)
    np.testing.assert_allclose(np.asarray(xc), np.asarray(xm),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hc), np.asarray(hm),
                               rtol=1e-6)


def test_fused_mxu_rejects_row_variable():
    """Coefficients varying across interior rows cannot fold into the
    lane-matmul form; prepare_mxu must refuse (planner falls back)."""
    from fused_cg_mxu import prepare_mxu
    from tpcg.problems import helm_fe_var
    rng = np.random.default_rng(0)
    S = helm_fe_var(12, 5.0, 0.5 + rng.random((11, 11)), 0.1)
    with pytest.raises(ValueError):
        prepare_mxu(S)


def test_fused_packed_equals_unrolled_large_batch():
    """The lane-packed scalar layout (batch capacity bounded by VMEM, not
    code size) must reproduce the statically-unrolled recurrences for a
    batch beyond the old practical bound."""
    N, k = 16, 5.0
    S = helm_fe(N, k, eps=k)
    b = plane_wave_rhs(N, k)
    B = np.stack([(r + 1) * b for r in range(8)])
    xu, hu = fused_cg(S, B, n_iterations=20, interpret=True, packed=False)
    xp, hp = fused_cg(S, B, n_iterations=20, interpret=True, packed=True)
    scale = float(np.abs(np.asarray(xu)).max())
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xu),
                               rtol=0, atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hu),
                               rtol=2e-2, atol=1e-3 * float(hu[0, 0]))
