"""Fused Pallas CG kernel (interpret mode) == planes block-CG == oracle."""
import numpy as np
import pytest

import jax.numpy as jnp

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
