"""Fused whole-solve CG for small BANDED complex matrices (DIA, COCG).

The mhd1280b class (report Table I: complex n=1,280, ~18 diagonals) is
small enough that the ENTIRE problem -- diagonal value planes plus the
full CG state -- fits in VMEM, yet the streaming kernel
(:mod:`tpcg.ops.stream_cg_dia`) still pays a (K, G)-grid step per
value block: ~17.7 us/iteration of pure Mosaic grid overhead for a
matrix whose per-iteration arithmetic is ~0.2 MFLOP (12.7 GFLOPS,
benchmarks/FIG5.md).  This kernel removes the grid entirely, the
:mod:`tpcg.ops.fused_cg` pattern applied to the DIA layout: ONE
``pallas_call`` with the fixed-iteration COCG loop as an in-kernel
``lax.fori_loop``; values are fetched from HBM once per solve and per
iteration nothing touches HBM at all.

Layout is the streaming kernel's column-major (nv, 128) grid with the
wrap-filled halo pad (``stream_cg_dia`` module docstring): a diagonal
offset k is ONE static lane-aligned window read of the pad buffer, and
the pad rows are rebuilt from the new direction grid by 2*Ht lane-rolls
per iteration.  Complex = two float32 planes (never ship complex64 to
the device), COCG unconjugated dots (``kernel/complex/vdot.cl:15``),
Smith-scaled complex alpha/beta, fixed iteration count (``clcg.c:297``),
residual history |<r,r>|^(1/2) per iteration (``cl.py:120``).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stream_cg import _mag2_zero, _smith_cdiv
from .stream_cg_dia import (_NH, _halo_depth, from_dia_grid_cplx,
                            prepare_dia_stream_cplx, to_dia_grid_cplx)

_F = jnp.float32
# resident-tier budget: value planes + 4 state planes + the wrap pad
# must fit with pipeline headroom.  Small by design -- the large banded
# classes (m_t1, parabolic_fem) are better served by the streaming
# kernel's value pipeline; this tier is for the latency-bound small-n
# class where grid-step overhead dominates.
_FUSED_DIA_VMEM_BYTES = 32 * 1024 * 1024


def fused_dia_cplx_fits(dia, budget: int = _FUSED_DIA_VMEM_BYTES) -> bool:
    """True if the whole complex DIA problem is VMEM-resident for the
    fused kernel: 2*ndiag value planes, 8 state planes (x/r in scratch,
    b/x0/xout whole-array blocks), the (2, DS, nh) wrap pad."""
    n, offs = int(dia.n), [int(k) for k in dia.offsets]
    nv = -(-n // _NH)
    nv = max(-(-nv // 8), 2) * 8
    ht = -(-max((abs(k) for k in offs), default=0) // nv)
    plane = nv * _NH * 4
    ds = (2 * ht + 1) * nv + 8
    need = (2 * len(offs) * plane          # value planes (resident)
            + 8 * plane                    # b, x0, xout, x, r scratch...
            + 2 * ds * _NH * 4)            # wrap pad
    return need <= budget


def _build_fused_dia_cplx(taps, grid, K, interpret):
    """Whole-solve kernel: (planes2, bg2, x0g2) -> (x (2, nv, nh),
    hist (K+1, 1)).  All operands VMEM-resident; K iterations inside
    one ``lax.fori_loop`` carrying the four COCG scalars
    (beta_re, beta_im, delta_re, delta_im)."""
    nv, nh = grid
    Ht = _halo_depth(taps, nv)
    C0 = Ht * nv
    DS = 2 * C0 + nv + 8
    tgroups = {}
    for k, d in taps:
        k8 = (k // 8) * 8
        tgroups.setdefault(k8, []).append((k - k8, d))

    def kernel(coef_ref, b_ref, x0_ref, xout_ref, hist_ref,
               xs, rs, dpd):

        def fill_pad(zr, zi):
            """Direction grid -> wrap-filled pad (the streaming
            kernel's halo fill, ``stream_cg_dia.wrap_pad_grid``)."""
            dpd[0, C0:C0 + nv, :] = zr
            dpd[1, C0:C0 + nv, :] = zi
            for w in range(1, Ht + 1):
                dpd[0, C0 + w * nv:C0 + (w + 1) * nv, :] = \
                    pltpu.roll(zr, nh - w, 1)
                dpd[1, C0 + w * nv:C0 + (w + 1) * nv, :] = \
                    pltpu.roll(zi, nh - w, 1)
                dpd[0, C0 - w * nv:C0 - (w - 1) * nv, :] = \
                    pltpu.roll(zr, w, 1)
                dpd[1, C0 - w * nv:C0 - (w - 1) * nv, :] = \
                    pltpu.roll(zi, w, 1)

        def apply_pad():
            """q = A d from the pad: one static window per 8-aligned
            offset group, one fused multiply-add pair per diagonal."""
            qr = jnp.zeros((nv, nh), _F)
            qi = jnp.zeros((nv, nh), _F)
            for k8, items in tgroups.items():
                winr = dpd[0, C0 + k8:C0 + k8 + nv + 8, :]
                wini = dpd[1, C0 + k8:C0 + k8 + nv + 8, :]
                for o, d in items:
                    pr = coef_ref[0, d]
                    pi = coef_ref[1, d]
                    wr = winr[o:o + nv, :]
                    wi = wini[o:o + nv, :]
                    qr = qr + pr * wr - pi * wi
                    qi = qi + pr * wi + pi * wr
            return qr, qi

        # ---- init: r0 = b - A x0, delta0 = <r0, r0> (unconjugated) ----
        dpd[...] = jnp.zeros((2, DS, nh), _F)
        fill_pad(x0_ref[0], x0_ref[1])
        q0r, q0i = apply_pad()
        r0r = b_ref[0] - q0r
        r0i = b_ref[1] - q0i
        xs[0] = x0_ref[0]
        xs[1] = x0_ref[1]
        rs[0] = r0r
        rs[1] = r0i
        d0r = jnp.sum(r0r * r0r - r0i * r0i)
        d0i = 2.0 * jnp.sum(r0r * r0i)
        hist_ref[0:1, 0:1] = jnp.full(
            (1, 1), jnp.sqrt(jnp.sqrt(d0r * d0r + d0i * d0i)))
        # the direction grid lives in the pad centre; zero it so the
        # first update dn = r + beta*d with beta=0 reads d=0
        dpd[...] = jnp.zeros((2, DS, nh), _F)

        def body(it, carry):
            br, bi, der, dei = carry
            dr = dpd[0, C0:C0 + nv, :]
            di = dpd[1, C0:C0 + nv, :]
            rr = rs[0]
            ri = rs[1]
            dnr = rr + br * dr - bi * di
            dni = ri + br * di + bi * dr
            fill_pad(dnr, dni)
            qr, qi = apply_pad()
            dqr = jnp.sum(dnr * qr - dni * qi)
            dqi = jnp.sum(dnr * qi + dni * qr)
            # |.|^2-underflow freeze (see stream_cg._mag2_zero): exact-
            # zero tests miss denormal deltas and the un-frozen
            # recurrence grows to overflow post-convergence
            done = _mag2_zero(der, dei) | _mag2_zero(dqr, dqi)
            ar, ai = _smith_cdiv(der, dei,
                                 jnp.where(done, 1.0, dqr),
                                 jnp.where(done, 1.0, dqi))
            ar = jnp.where(done, 0.0, ar)
            ai = jnp.where(done, 0.0, ai)
            xs[0] = xs[0] + ar * dnr - ai * dni
            xs[1] = xs[1] + ar * dni + ai * dnr
            nrr = rr - (ar * qr - ai * qi)
            nri = ri - (ar * qi + ai * qr)
            rs[0] = nrr
            rs[1] = nri
            dnr_ = jnp.sum(nrr * nrr - nri * nri)
            dni_ = 2.0 * jnp.sum(nrr * nri)
            hist_ref[pl.ds(it + 1, 1), 0:1] = jnp.full(
                (1, 1), jnp.sqrt(jnp.sqrt(dnr_ * dnr_ + dni_ * dni_)))
            nbr, nbi = _smith_cdiv(dnr_, dni_,
                                   jnp.where(done, 1.0, der),
                                   jnp.where(done, 1.0, dei))
            return (jnp.where(done, 0.0, nbr),
                    jnp.where(done, 0.0, nbi), dnr_, dni_)

        lax.fori_loop(0, K, body, (jnp.float32(0.0), jnp.float32(0.0),
                                   d0r, d0i))
        xout_ref[0] = xs[0]
        xout_ref[1] = xs[1]

    def solve(planes2, bg2, x0g2):
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((2, nv, nh), _F),
                       jax.ShapeDtypeStruct((K + 1, 1), _F)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            scratch_shapes=[pltpu.VMEM((2, nv, nh), _F),   # x
                            pltpu.VMEM((2, nv, nh), _F),   # r
                            pltpu.VMEM((2, DS, nh), _F)],  # wrap pad
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(planes2, bg2, x0g2)

    return solve


def fused_cg_dia_grid_cplx(taps, grid, planes2, bg2, x0g2,
                           n_iterations: int, interpret: bool = False):
    """Grid-layout whole solve: bg2/x0g2 (2, nv, 128) plane pairs.
    Returns (x (2, nv, 128), history (n_iterations+1,))."""
    solve = _build_fused_dia_cplx(taps, grid, n_iterations, interpret)
    x, hist = solve(planes2, bg2, x0g2)
    return x, hist[:, 0]


def fused_cg_dia_cplx(dia, b, x0=None, n_iterations: int = 10,
                      interpret: bool = False):
    """Whole-solve fused CG on a small complex :class:`DiaMatrix`.
    b, x0 : complex (n,).  Returns (x complex (n,), history)."""
    taps, grid, _Bv, planes2 = prepare_dia_stream_cplx(dia)
    nv, _ = grid
    bg2 = to_dia_grid_cplx(b, nv)
    x0g2 = (jnp.zeros_like(bg2) if x0 is None
            else to_dia_grid_cplx(x0, nv))
    xg2, hist = fused_cg_dia_grid_cplx(taps, grid, planes2, bg2, x0g2,
                                       n_iterations, interpret=interpret)
    return from_dia_grid_cplx(xg2, int(dia.n)), hist


def fused_cg_dia_cplx_block(dia, B, X0=None, n_iterations: int = 10,
                            interpret: bool = False):
    """Multi-RHS fused whole-solve: ``B``/``X0`` complex (n, nrhs);
    columns run as ONE ``lax.map`` device program of single-RHS fused
    solves (block CG shares no cross-RHS state, and at this scale the
    value planes are resident -- nothing for a fat batch to amortize).
    Returns (X complex (n, nrhs), history (n_iterations+1, nrhs))."""
    taps, grid, _Bv, planes2 = prepare_dia_stream_cplx(dia)
    nv, _ = grid
    n = int(dia.n)
    B = np.asarray(B)
    nrhs = B.shape[1]
    bgs = jnp.stack([to_dia_grid_cplx(B[:, c], nv) for c in range(nrhs)])
    x0gs = (jnp.zeros_like(bgs) if X0 is None
            else jnp.stack([to_dia_grid_cplx(np.asarray(X0)[:, c], nv)
                            for c in range(nrhs)]))

    def one(args):
        bg2, xg2 = args
        return fused_cg_dia_grid_cplx(taps, grid, planes2, bg2, xg2,
                                      n_iterations, interpret=interpret)

    xs, hists = jax.lax.map(one, (bgs, x0gs))
    X = np.stack([from_dia_grid_cplx(xs[c], n)
                  for c in range(nrhs)], axis=1)
    return X, np.asarray(hists).T
