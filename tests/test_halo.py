"""Overlap exchange and distributed matvec.

Oracles:
 * ``ol_oracle``: an independent per-subdomain loop implementation of the
   exchange semantics (send inner (OL+1) strips / RAS-zero outer OL ring /
   overlap-add / contact-line averaging), written with explicit numpy
   slices -- deliberately a different code path from the vectorized
   shift-based device implementation.
 * For the RAS+averaging default, a second, structurally different oracle:
   the partition-of-unity scatter-add over the global grid.
 * ``ax_op`` is checked against the *global* stencil apply -- the strongest
   possible equivalence (the distributed matvec must equal the exact global
   operator on consistent states).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tpcg.parallel import Decomposition, make_partition
from tpcg.problems import helm_fe, plane_wave_rhs


def ol_oracle(x, part, restricted=True, averaging=True):
    """x: (M, M, S, S) numpy; returns updated copy."""
    M, S, OL = part.M, part.sdsz, part.OL
    x = x.copy()
    recv = np.zeros_like(x)

    def span(s, width):   # participating indices of a perpendicular strip
        lo = width if s > 0 else 0
        hi = S - width if s < M - 1 else S
        return slice(lo, hi)

    snd = {}
    for si in range(M):
        for sj in range(M):
            v = x[si, sj]
            rs, cs = span(si, OL), span(sj, OL)
            snd[(si, sj)] = {
                "W": v[rs, OL:2 * OL + 1].copy(),
                "E": v[rs, S - 2 * OL - 1:S - OL].copy(),
                "S": v[OL:2 * OL + 1, cs].copy(),
                "N": v[S - 2 * OL - 1:S - OL, cs].copy(),
                "SW": v[OL:2 * OL + 1, OL:2 * OL + 1].copy(),
                "NE": v[S - 2 * OL - 1:S - OL, S - 2 * OL - 1:S - OL].copy(),
                "NW": v[S - 2 * OL - 1:S - OL, OL:2 * OL + 1].copy(),
                "SE": v[OL:2 * OL + 1, S - 2 * OL - 1:S - OL].copy(),
            }
    if restricted:
        for si in range(M):
            for sj in range(M):
                v = x[si, sj]
                rs, cs = span(si, OL), span(sj, OL)
                if sj > 0:
                    v[rs, :OL] = 0
                if sj < M - 1:
                    v[rs, S - OL:] = 0
                if si > 0:
                    v[:OL, cs] = 0
                if si < M - 1:
                    v[S - OL:, cs] = 0
                if si > 0 and sj > 0:
                    v[:OL, :OL] = 0
                if si < M - 1 and sj < M - 1:
                    v[S - OL:, S - OL:] = 0
                if si < M - 1 and sj > 0:
                    v[S - OL:, :OL] = 0
                if si > 0 and sj < M - 1:
                    v[:OL, S - OL:] = 0
    for si in range(M):
        for sj in range(M):
            v = x[si, sj]
            rs, cs = span(si, OL), span(sj, OL)
            if sj > 0:
                v[rs, :OL + 1] += snd[(si, sj - 1)]["E"]
            if sj < M - 1:
                v[rs, S - OL - 1:] += snd[(si, sj + 1)]["W"]
            if si > 0:
                v[:OL + 1, cs] += snd[(si - 1, sj)]["N"]
            if si < M - 1:
                v[S - OL - 1:, cs] += snd[(si + 1, sj)]["S"]
            if si > 0 and sj > 0:
                v[:OL + 1, :OL + 1] += snd[(si - 1, sj - 1)]["NE"]
            if si < M - 1 and sj < M - 1:
                v[S - OL - 1:, S - OL - 1:] += snd[(si + 1, sj + 1)]["SW"]
            if si < M - 1 and sj > 0:
                v[S - OL - 1:, :OL + 1] += snd[(si + 1, sj - 1)]["SE"]
            if si > 0 and sj < M - 1:
                v[:OL + 1, S - OL - 1:] += snd[(si - 1, sj + 1)]["NW"]
    if averaging:
        for si in range(M):
            for sj in range(M):
                v = x[si, sj]
                if sj > 0:
                    v[:, OL] /= 2
                if sj < M - 1:
                    v[:, S - OL - 1] /= 2
                if si > 0:
                    v[OL, :] /= 2
                if si < M - 1:
                    v[S - OL - 1, :] /= 2
    return x


def scatter_oracle(x, part):
    """RAS+averaging partition-of-unity formulation: zero the outer OL ring
    per subdomain, scatter-add into the global grid, average overlap-count
    duplicates implicitly via the contact-line factors, gather boxes."""
    M, S, OL = part.M, part.sdsz, part.OL
    N = part.N
    g = np.zeros((N, N), dtype=x.dtype)
    for p in range(part.nsubd):
        si, sj = divmod(p, M)
        v = x[si, sj].copy()
        keep = np.ones((S, S))
        if sj > 0:
            keep[:, :OL] = 0
        if sj < M - 1:
            keep[:, S - OL:] = 0
        if si > 0:
            keep[:OL, :] = 0
        if si < M - 1:
            keep[S - OL:, :] = 0
        r, c = part.row0[p], part.col0[p]
        g[r:r + S, c:c + S] += v * keep
    # halve the doubly-owned contact lines (quadruple corners get 1/4)
    cnt = np.zeros((N, N))
    for p in range(part.nsubd):
        si, sj = divmod(p, M)
        keep = np.ones((S, S))
        if sj > 0:
            keep[:, :OL] = 0
        if sj < M - 1:
            keep[:, S - OL:] = 0
        if si > 0:
            keep[:OL, :] = 0
        if si < M - 1:
            keep[S - OL:, :] = 0
        r, c = part.row0[p], part.col0[p]
        cnt[r:r + S, c:c + S] += keep
    g = g / np.maximum(cnt, 1)
    out = np.empty_like(x)
    for p in range(part.nsubd):
        si, sj = divmod(p, M)
        r, c = part.row0[p], part.col0[p]
        out[si, sj] = g[r:r + S, c:c + S]
    return out


@pytest.fixture(params=[(2, 6, 2), (3, 6, 1), (3, 8, 3)])
def decomp(request):
    M, W, OL = request.param
    return Decomposition(make_partition(M, W, OL))


def rand_state(decomp, seed=0, cplx=True):
    rng = np.random.default_rng(seed)
    shape = decomp.grid_shape
    x = rng.standard_normal(shape)
    if cplx:
        x = x + 1j * rng.standard_normal(shape)
    return x


@pytest.mark.parametrize("restricted,averaging",
                         [(True, True), (True, False),
                          (False, True), (False, False)])
def test_ol_update_matches_loop_oracle(decomp, restricted, averaging):
    x = rand_state(decomp)
    got = np.asarray(decomp.ol_update(jnp.asarray(x), restricted=restricted,
                                      averaging=averaging))
    want = ol_oracle(x, decomp.part, restricted, averaging)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_ras_ol_update_matches_scatter_oracle(decomp):
    x = rand_state(decomp, seed=3)
    got = np.asarray(decomp.ol_update(jnp.asarray(x)))
    want = scatter_oracle(x, decomp.part)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_ras_ol_update_is_identity_on_consistent_state(decomp):
    g = np.random.default_rng(5).standard_normal(
        (decomp.part.N, decomp.part.N))
    x = decomp.crop_grid(g)
    out = np.asarray(decomp.ol_update(jnp.asarray(x)))
    np.testing.assert_allclose(out, x, rtol=1e-12, atol=1e-12)


def test_ol_update_output_is_consistent(decomp):
    """After the exchange, overlapping copies must agree -- the
    ``check_nd_*`` invariant the reference asserts."""
    x = rand_state(decomp, seed=7)
    out = np.asarray(decomp.ol_update(jnp.asarray(x)))
    decomp.to_global(out, check=True, tol=1e-10)


def test_ax_op_equals_global_operator(decomp):
    """Distributed matvec on a consistent state == exact global matvec."""
    part = decomp.part
    S = helm_fe(part.N, k=6.0, eps=6.0)
    coef = jnp.asarray(decomp.crop_stencil(np.asarray(S.coef)))
    rng = np.random.default_rng(11)
    g = rng.standard_normal((part.N, part.N)) \
        + 1j * rng.standard_normal((part.N, part.N))
    y_global = np.asarray(S.apply_grid(jnp.asarray(g)))
    x = jnp.asarray(decomp.crop_grid(g))
    y = np.asarray(decomp.ax_op(coef, S.offsets, x))
    want = decomp.crop_grid(y_global)
    np.testing.assert_allclose(y, want, rtol=1e-11, atol=1e-11)


def test_norm_and_wdot(decomp):
    part = decomp.part
    x = rand_state(decomp, seed=13)
    y = rand_state(decomp, seed=17)
    u = part.unique_mask.reshape(decomp.grid_shape)
    want = np.sqrt(np.sum((np.conj(x) * x).real * u))
    got = float(decomp.norm(jnp.asarray(x)))
    assert np.isclose(got, want, rtol=1e-12)
    want_dot = np.sum(np.conj(x) * y * u)
    got_dot = complex(decomp.wdot(jnp.asarray(x), jnp.asarray(y)))
    assert np.isclose(got_dot, want_dot, rtol=1e-12)
    # batched
    X = np.stack([x, y, np.zeros_like(x)])
    got_b = np.asarray(decomp.wdot(jnp.asarray(X), jnp.asarray(y)))
    want_b = np.array([np.sum(np.conj(x) * y * u),
                       np.sum(np.conj(y) * y * u), 0.0])
    np.testing.assert_allclose(got_b, want_b, rtol=1e-12)
