"""Streaming CG for general BANDED matrices (DIA storage, real f32).

The reference's two largest benchmark matrices (m_t1 n=97,578 ~100
diagonals; parabolic_fem n=525,825 7 diagonals -- report Table I) are
banded but NOT 2-D grid stencils, so the stencil kernel families don't
apply and they previously ran on the XLA shift-multiply path
(``DiaMatrix.matvec``) at ~100 GB/s effective (~57 GFLOPS for the
m_t1 class, benchmarks/GENERAL_SPARSE.md).

This kernel maps the 1-D banded operator onto a COLUMN-MAJOR 2-D grid:
the vector is laid out as ``xg[r, c] = x[c*nv + r]`` over (nv, nh=128)
-- consecutive 1-D indices run DOWN a column -- so a diagonal offset k
becomes a pure VERTICAL shift (k, 0) plus one lane-wrap companion
offset ((k - nv, +1) for k > 0, (k + nv, -1) for k < 0) that carries
the shift across column boundaries.  Zero-padding the vertical pad
buffer makes the two taps self-gating: exactly one of them reads
in-range data for any row, the other reads zeros, so BOTH apply the
same value plane unconditionally -- no masks, no gathers.

The CG state (x/r/d/q, ~0.4 MB per plane at m_t1 size) is fully
VMEM-resident; only the diagonal VALUE planes stream, once per
iteration (~39 MB for the m_t1 class), through a (K, G) grid -- K
iterations per pallas call, G value-blocks per iteration.  The
per-iteration vector updates DEFER one iteration (the same fp ops,
executed at the next iteration's first grid step -- the v5 qx trick),
so there is no separate update phase; the final pending update is
applied in XLA by the wrapper.

Reference semantics: fixed iteration count (``clcg.c:297``), residual
history sqrt(<r,r>) per iteration (``cl.py:120``); serves the CSR
``cg()`` surface (``clcg.h:3-5``) for banded real Matrix Market inputs
(``main.c:20-33``).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F = jnp.float32
_NH = 128
# iterations per pallas call (bounds SMEM history + grid size)
_CHUNK = 256


def _chunks(n, cap):
    out = [cap] * (n // cap)
    if n % cap:
        out.append(n % cap)
    return out or [n]


def prepare_dia_stream(dia, block_rows: int = None):
    """Host-side preprocessing: (offsets2d, grid, Bv, value planes).

    offsets2d : static ((dm, dj), value-plane index) pairs -- each
                diagonal contributes its direct tap and its lane-wrap
                companion, both indexing the SAME value plane.
    planes    : (ndiag, nv, nh) f32 -- ``planes[d][r, c] =
                data[d, c*nv + r]`` (zero beyond n).
    """
    n = int(dia.n)
    offs = [int(k) for k in dia.offsets]
    nv = -(-n // _NH)
    Bv = block_rows
    if Bv is None:
        # largest block size that still gives >= 2 value blocks
        Bv = next((c for c in (256, 128, 64, 32, 16, 8)
                   if -(-nv // c) >= 2), 8)
    nv = max(-(-nv // Bv), 2) * Bv
    data = np.asarray(dia.data, dtype=np.float32)
    planes = np.zeros((len(offs), nv * _NH), np.float32)
    planes[:, :n] = data[:, :n]
    # column-major regrid: plane[r, c] = flat[c*nv + r]
    planes = planes.reshape(len(offs), _NH, nv).transpose(0, 2, 1)
    taps = []
    for d, k in enumerate(offs):
        # r + k spans [k, k + nv) over a column, crossing at most two
        # column boundaries w = floor((r+k)/nv) in {k//nv, k//nv + 1};
        # each becomes one (vertical, lane) tap pair on the SAME value
        # plane (floor division handles negative k)
        w0 = k // nv
        taps.append(((k - w0 * nv, w0), d))
        if k % nv != 0:
            taps.append(((k - (w0 + 1) * nv, w0 + 1), d))
    return tuple(taps), (nv, _NH), Bv, jnp.asarray(planes)


def to_dia_grid(x, nv):
    """(n,) -> (nv, 128) column-major grid (zero-padded)."""
    x = jnp.asarray(x, _F)
    xp = jnp.zeros((nv * _NH,), _F).at[:x.shape[0]].set(x)
    return xp.reshape(_NH, nv).T


def from_dia_grid(xg, n):
    """(nv, 128) column-major grid -> (n,)."""
    return xg.T.reshape(-1)[:n]


def _build_dia(taps, grid, Bv, K, interpret):
    """K-iteration banded-streaming kernel.

    step(planes, beta1, delta1, x, r, d, q) ->
        (x_pre, r_pre, dnew, q, alpha (1,1), delta (1,1), hist (K,1))
    where x_pre/r_pre trail by the final alpha update (applied by the
    wrapper in XLA) and hist[i] = sqrt(delta_{i+1}) for i < K-1.
    """
    nv, nh = grid
    assert nv % Bv == 0 and Bv % 8 == 0, (nv, Bv)
    G = nv // Bv
    # vertical pad, 8-aligned: dynamic sublane slices must be provably
    # 8-divisible, so window loads use 8-floored bases and the residual
    # 0..7-row offset becomes a STATIC slice of the loaded value
    Pv = -(-max(abs(dm) for (dm, _), _ in taps) // 8) * 8
    Pc = max(abs(dj) for (_, dj), _ in taps)
    ndiag = 1 + max(d for _, d in taps)
    # group taps by (8-aligned base, lane shift): one window load per
    # group, shared by its taps
    tgroups = {}
    for (dm, dj), d in taps:
        dm8 = (dm // 8) * 8
        tgroups.setdefault((dm8, dj), []).append((dm - dm8, d))

    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)
    coef_spec = pl.BlockSpec((ndiag, Bv, nh),
                             lambda it, j: (0, j, 0))
    full = pl.BlockSpec((nv, nh), lambda it, j: (0, 0))

    def smem_out(shape):
        return pl.BlockSpec(shape, lambda it, j: (0, 0),
                            memory_space=pltpu.SMEM)

    def kernel(beta0_ref, delta0_ref, coef_ref, x_ref, r_ref, d_ref,
               q_ref, xn_ref, rn_ref, dn_ref, qn_ref, alphan_ref,
               deltan_ref, hist_ref, x_scr, r_scr, d_scr, q_scr, dpd,
               al, dqa, bd):
        it = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((it == 0) & (j == 0))
        def _():
            x_scr[...] = x_ref[...]
            r_scr[...] = r_ref[...]
            d_scr[...] = d_ref[...]
            q_scr[...] = q_ref[...]
            al[0, 0] = 0.0
            al[1, 0] = 0.0
            bd[0, 0] = beta0_ref[0, 0]
            bd[1, 0] = delta0_ref[0, 0]
            dpd[...] = jnp.zeros((nv + 2 * Pv + 8, nh + 2 * Pc), _F)

        @pl.when(j == 0)
        def _():
            dqa[0, 0] = 0.0

            # deferred update from the previous iteration (exact: the
            # same fp ops, executed one iteration later), then the new
            # beta/delta/history scalars
            @pl.when(it > 0)
            def _():
                a = al[0, 0]
                x_scr[...] = x_scr[...] + a * d_scr[...]
                nr = r_scr[...] - a * q_scr[...]
                r_scr[...] = nr
                dnew_ = jnp.sum(nr * nr)
                de = bd[1, 0]
                done = al[1, 0] > 0.5
                bd[0, 0] = jnp.where(
                    done, 0.0,
                    dnew_ / jnp.where(done | (de == 0.0), 1.0, de))
                bd[1, 0] = jnp.where(done, de, dnew_)
                hist_ref[it - 1, 0] = jnp.sqrt(bd[1, 0])

            dn = r_scr[...] + bd[0, 0] * d_scr[...]
            d_scr[...] = dn
            dpd[Pv:Pv + nv, Pc:Pc + nh] = dn

        # q rows for this value block: every diagonal applies its
        # direct vertical tap and its lane-wrap companion; the zero
        # pad regions of dpd gate which one is live per row
        qb = jnp.zeros((Bv, nh), _F)
        for (dm8, dj), items in tgroups.items():
            win = dpd[pl.ds(Pv + j * Bv + dm8, Bv + 8),
                      Pc + dj:Pc + dj + nh]
            for o, d in items:
                qb = qb + coef_ref[d] * win[o:o + Bv, :]
        q_scr[pl.ds(j * Bv, Bv), :] = qb
        dqa[0, 0] += jnp.sum(d_scr[pl.ds(j * Bv, Bv), :] * qb)

        @pl.when(j == G - 1)
        def _():
            dq = dqa[0, 0]
            de = bd[1, 0]
            done = (de == 0.0) | (dq == 0.0) | (al[1, 0] > 0.5)
            al[0, 0] = jnp.where(done, 0.0,
                                 de / jnp.where(done, 1.0, dq))
            al[1, 0] = jnp.where(done, 1.0, 0.0)

            @pl.when(it == K - 1)
            def _():
                xn_ref[...] = x_scr[...]
                rn_ref[...] = r_scr[...]
                dn_ref[...] = d_scr[...]
                qn_ref[...] = q_scr[...]
                alphan_ref[0, 0] = al[0, 0]
                deltan_ref[0, 0] = bd[1, 0]

    scratch = [pltpu.VMEM((nv, nh), _F),               # x
               pltpu.VMEM((nv, nh), _F),               # r
               pltpu.VMEM((nv, nh), _F),               # d
               pltpu.VMEM((nv, nh), _F),               # q
               pltpu.VMEM((nv + 2 * Pv + 8, nh + 2 * Pc), _F),  # dpd
               pltpu.SMEM((2, 1), _F),                 # alpha+done
               pltpu.SMEM((1, 1), _F),                 # <d,q>
               pltpu.SMEM((2, 1), _F)]                 # beta,delta

    def step(planes, beta1, delta1, x, r, d, q):
        return pl.pallas_call(
            kernel,
            grid=(K, G),
            in_specs=[smem_in, smem_in, coef_spec] + [full] * 4,
            out_specs=(full, full, full, full, smem_out((1, 1)),
                       smem_out((1, 1)), smem_out((K, 1))),
            out_shape=(jax.ShapeDtypeStruct((nv, nh), _F),
                       jax.ShapeDtypeStruct((nv, nh), _F),
                       jax.ShapeDtypeStruct((nv, nh), _F),
                       jax.ShapeDtypeStruct((nv, nh), _F),
                       jax.ShapeDtypeStruct((1, 1), _F),
                       jax.ShapeDtypeStruct((1, 1), _F),
                       jax.ShapeDtypeStruct((K, 1), _F)),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=interpret,
        )(beta1, delta1, planes, x, r, d, q)

    return step


def stream_cg_dia_grid(taps, grid, Bv, planes, bg, x0g,
                       n_iterations: int, chunk: int = _CHUNK,
                       interpret: bool = False):
    """Grid-layout solve: bg/x0g are (nv, 128) column-major grids.

    Returns (x_grid, history (n_iterations+1,)).
    """
    nv, nh = grid
    steps = {}

    def get_step(K):
        if K not in steps:
            steps[K] = _build_dia(taps, grid, Bv, K, interpret)
        return steps[K]

    Pv = max(abs(dm) for (dm, _), _ in taps)
    Pc = max(abs(dj) for (_, dj), _ in taps)

    def apply_xla(xg):
        # the same tap application, full-grid XLA (init + oracle)
        xp = jnp.pad(xg, ((Pv, Pv), (Pc, Pc)))
        q = jnp.zeros((nv, nh), _F)
        for (dm, dj), d in taps:
            q = q + planes[d] * xp[Pv + dm:Pv + dm + nv,
                                   Pc + dj:Pc + dj + nh]
        return q
    r0 = bg - apply_xla(x0g)
    delta0 = jnp.sum(r0 * r0)
    hists = [jnp.sqrt(delta0)[None]]
    x, r, d = x0g, r0, jnp.zeros_like(bg)
    q = jnp.zeros_like(bg)
    beta = jnp.zeros((1, 1), _F)
    delta = delta0.reshape(1, 1)
    for K in _chunks(n_iterations, chunk):
        step = get_step(K)
        x, r, d, q, alpha, delta_pre, hk = step(planes, beta, delta,
                                                x, r, d, q)
        # the kernel's state trails by the final alpha update
        a = alpha[0, 0]
        x = x + a * d
        r = r - a * q
        delta_new = jnp.sum(r * r)
        done = (delta_pre[0, 0] == 0.0) | (a == 0.0)
        beta = jnp.where(
            done, 0.0,
            delta_new / jnp.where(delta_pre[0, 0] == 0.0, 1.0,
                                  delta_pre[0, 0])).reshape(1, 1)
        delta = delta_new.reshape(1, 1)
        hists.append(hk[:K - 1, 0])
        hists.append(jnp.sqrt(delta_new)[None])
    return x, jnp.concatenate(hists)


def stream_cg_dia(dia, b, x0=None, n_iterations: int = 10,
                  block_rows: int = None, chunk: int = _CHUNK,
                  interpret: bool = False):
    """Banded-streaming CG on a real :class:`tpcg.sparse.DiaMatrix`.

    b, x0 : (n,) real vectors.  Returns (x (n,), history).
    """
    taps, grid, Bv, planes = prepare_dia_stream(dia, block_rows)
    nv, _ = grid
    bg = to_dia_grid(b, nv)
    x0g = (jnp.zeros_like(bg) if x0 is None else to_dia_grid(x0, nv))
    xg, hist = stream_cg_dia_grid(taps, grid, Bv, planes, bg, x0g,
                                  n_iterations, chunk=chunk,
                                  interpret=interpret)
    return from_dia_grid(xg, int(dia.n)), hist
