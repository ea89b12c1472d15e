"""Fused block-CG Pallas kernel: the whole solver in VMEM.

The reference's report (SVI) identifies the per-iteration host round-trips
for the dot-product scalars as the main bottleneck; our XLA path already
removes those, but still streams the matrix + vectors from HBM every
iteration.  This kernel goes the rest of the way: for grid problems that
fit in VMEM (~16 MB: N up to ~256 with a full complex multi-RHS state),
the *entire* fixed-iteration CG loop runs inside one ``pallas_call`` --
stencil coefficients, solution, residual and direction vectors stay
resident in VMEM; per iteration nothing touches HBM at all.  The kernel
is then VPU-compute-bound instead of HBM-bandwidth-bound.

Design notes (see /opt/skills/guides/pallas_guide.md):
 * complex = two float32 planes (the TPU backend here has no complex64);
   the complex stencil apply uses the same Karatsuba 3-multiply form as
   ``tpcg.ops.cplx.PairOperator``.
 * the direction vector lives in a zero-border padded scratch buffer, so
   each stencil tap is a *static* 2-D slice -- no rolls, no gathers.
 * per-RHS alpha/beta (B independent COCG recurrences, ``clcg.c:317``)
   are *statically unrolled scalar recurrences*: Mosaic's layout inference
   aborts on reshapes/broadcasts of tiny (B,)-shaped vectors, so each RHS
   keeps rank-0 scalars (scalar reductions and scalar*matrix broadcasts
   are the well-supported forms).  This bounds the practical batch at a
   few dozen RHS -- beyond the reference's b=47 GPU cap.
 * the zero border is written once and never touched again (taps only
   read it), which implements the zero fill of ``Stencil2D.apply_grid``
   exactly.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_for(offsets) -> int:
    return max(max(abs(dm), abs(dj)) for dm, dj in offsets)


def _cdiv_scalar(ar, ai, br, bi):
    """Smith-scaled complex division on rank-0 scalars (see
    ``tpcg.ops.cplx.cdiv``)."""
    m = jnp.maximum(jnp.abs(br), jnp.abs(bi))
    ms = jnp.where(m == 0, 1.0, m)
    b0, b1 = br / ms, bi / ms
    d = (b0 * b0 + b1 * b1) * ms
    return (ar * b0 + ai * b1) / d, (ai * b0 - ar * b1) / d


def _cg_scalar_step(it, deltas, nb, qr, qi, read_d, write_d, xr, xi,
                    rr, ri, hist_ref):
    """One CG update sweep: statically-unrolled per-RHS scalar recurrences
    shared by the fused kernels.

    read_d(r) -> (dcur_r, dcur_i) current direction of RHS r;
    write_d(r, wr, wi) stores the next direction.
    Returns the new delta scalars tuple.
    """
    new_deltas = []
    for r in range(nb):
        delta_r, delta_i = deltas[2 * r], deltas[2 * r + 1]
        dcr, dci = read_d(r)
        qrr, qir = qr[r], qi[r]
        dq_r = jnp.sum(dcr * qrr - dci * qir)
        dq_i = jnp.sum(dcr * qir + dci * qrr)
        done = ((delta_r == 0) & (delta_i == 0)) \
            | ((dq_r == 0) & (dq_i == 0))
        a_r, a_i = _cdiv_scalar(delta_r, delta_i,
                                jnp.where(done, 1.0, dq_r),
                                jnp.where(done, 0.0, dq_i))
        a_r = jnp.where(done, 0.0, a_r)
        a_i = jnp.where(done, 0.0, a_i)
        xr[r] = xr[r] + (a_r * dcr - a_i * dci)
        xi[r] = xi[r] + (a_r * dci + a_i * dcr)
        new_rr = rr[r] - (a_r * qrr - a_i * qir)
        new_ri = ri[r] - (a_r * qir + a_i * qrr)
        rr[r] = new_rr
        ri[r] = new_ri
        dn_r = jnp.sum(new_rr * new_rr - new_ri * new_ri)
        dn_i = 2.0 * jnp.sum(new_rr * new_ri)
        hist_ref[pl.ds(it + 1, 1), r:r + 1] = jnp.full(
            (1, 1), jnp.sqrt(jnp.sqrt(dn_r * dn_r + dn_i * dn_i)))
        be_r, be_i = _cdiv_scalar(dn_r, dn_i,
                                  jnp.where(done, 1.0, delta_r),
                                  jnp.where(done, 0.0, delta_i))
        be_r = jnp.where(done, 0.0, be_r)
        be_i = jnp.where(done, 0.0, be_i)
        write_d(r, new_rr + (be_r * dcr - be_i * dci),
                new_ri + (be_r * dci + be_i * dcr))
        new_deltas += [dn_r, dn_i]
    return tuple(new_deltas)


def _packed_reduce(prod, ones_red):
    """Grid reduction of ``prod`` (B, nv, nh) -> (B, nh) lane-replicated.

    Sublane-axis ``jnp.sum`` then a ones-matrix MXU contraction: the only
    Mosaic-safe way to carry B independent scalars without the
    small-vector reshapes that crash layout inference (see module
    docstring / the per-RHS unrolled fallback).

    precision=HIGHEST is load-bearing: with the default precision the
    MXU rounds the f32 inputs to bf16, and the ~1e-3 dot error amplifies
    through the COCG recurrence (measured on HW: 1e-2 divergence from
    the XLA oracle by iteration 4, final residual 380x worse --
    benchmarks/exp_fused128.py round-5 notes).  The contraction is a
    (B, nh) x (nh, nh) ones-matmul, so the 3-pass f32 algorithm costs
    nothing measurable."""
    return jnp.dot(jnp.sum(prod, axis=1), ones_red,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _cg_packed_body(nb, nv, nh, apply_q, read_d, write_d, xr, xi, rr, ri,
                    hist_ref, it, deltas):
    """One CG iteration with lane-packed per-RHS scalars.

    Scalars live as (B, nh) lane-replicated float32 tiles; all B COCG
    recurrences advance in one vector program (no per-RHS unrolling), so
    the batch capacity is bounded by VMEM, not code size -- this is what
    lifts the reference's b=47 cap (report SV) entirely.
    """
    from jax import lax as _lax

    ones_red = jnp.ones((nh, nh), jnp.float32)
    eye = jnp.eye(nb, nh, dtype=jnp.float32)
    ones_row = jnp.ones((1, nb), jnp.float32)

    def bc(t):
        return _lax.broadcast_in_dim(t, (nb, nv, nh), (0, 2))

    delta_r, delta_i = deltas
    qr, qi = apply_q()
    dcr, dci = read_d()
    dq_r = _packed_reduce(dcr * qr - dci * qi, ones_red)
    dq_i = _packed_reduce(dcr * qi + dci * qr, ones_red)
    done = ((delta_r == 0) & (delta_i == 0)) | ((dq_r == 0) & (dq_i == 0))
    a_r, a_i = _cdiv_scalar(delta_r, delta_i,
                            jnp.where(done, 1.0, dq_r),
                            jnp.where(done, 0.0, dq_i))
    a_r = jnp.where(done, 0.0, a_r)
    a_i = jnp.where(done, 0.0, a_i)
    xr[...] = xr[...] + (bc(a_r) * dcr - bc(a_i) * dci)
    xi[...] = xi[...] + (bc(a_r) * dci + bc(a_i) * dcr)
    new_rr = rr[...] - (bc(a_r) * qr - bc(a_i) * qi)
    new_ri = ri[...] - (bc(a_r) * qi + bc(a_i) * qr)
    rr[...] = new_rr
    ri[...] = new_ri
    dn_r = _packed_reduce(new_rr * new_rr - new_ri * new_ri, ones_red)
    dn_i = 2.0 * _packed_reduce(new_rr * new_ri, ones_red)
    histv = jnp.sqrt(jnp.sqrt(dn_r * dn_r + dn_i * dn_i))
    # (B,)-worth of scalars live on the tile diagonal; extract as a (1, B)
    # row via an eye mask + ones contraction (no small-vector reshapes),
    # then a dynamic-sublane store (lane index static).
    row = jnp.dot(ones_row, histv * eye,
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    hist_ref[pl.ds(it + 1, 1), 0:nb] = row[0:1, 0:nb]
    be_r, be_i = _cdiv_scalar(dn_r, dn_i,
                              jnp.where(done, 1.0, delta_r),
                              jnp.where(done, 0.0, delta_i))
    be_r = jnp.where(done, 0.0, be_r)
    be_i = jnp.where(done, 0.0, be_i)
    write_d(new_rr + (bc(be_r) * dcr - bc(be_i) * dci),
            new_ri + (bc(be_r) * dci + bc(be_i) * dcr))
    return dn_r, dn_i


def _packed_init(nb, nv, nh, P, b_ref, x0_ref, xr, xi, rr, ri,
                 dr_pad, di_pad, hist_ref, q0r, q0i):
    """Packed-scalar twin of :func:`_init_state`."""
    ones_red = jnp.ones((nh, nh), jnp.float32)
    eye = jnp.eye(nb, nh, dtype=jnp.float32)
    ones_row = jnp.ones((1, nb), jnp.float32)
    rr[...] = b_ref[0] - q0r
    ri[...] = b_ref[1] - q0i
    xr[...] = x0_ref[0]
    xi[...] = x0_ref[1]
    dr_pad[:, P:P + nv, P:P + nh] = rr[...]
    di_pad[:, P:P + nv, P:P + nh] = ri[...]
    d0r = _packed_reduce(rr[...] * rr[...] - ri[...] * ri[...], ones_red)
    d0i = 2.0 * _packed_reduce(rr[...] * ri[...], ones_red)
    histv = jnp.sqrt(jnp.sqrt(d0r * d0r + d0i * d0i))
    row = jnp.dot(ones_row, histv * eye,
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    hist_ref[0:1, 0:nb] = row[0:1, 0:nb]
    return d0r, d0i


def _init_state(nb, nv, nh, P, b_ref, x0_ref, xr, xi, rr, ri,
                dr_pad, di_pad, hist_ref, q0r, q0i):
    """Shared init: r0 = b - A x0, d0 = r0, delta0 scalars, hist[0]."""
    rr[...] = b_ref[0] - q0r
    ri[...] = b_ref[1] - q0i
    xr[...] = x0_ref[0]
    xi[...] = x0_ref[1]
    dr_pad[:, P:P + nv, P:P + nh] = rr[...]
    di_pad[:, P:P + nv, P:P + nh] = ri[...]
    deltas = []
    for r in range(nb):
        d0r = jnp.sum(rr[r] * rr[r] - ri[r] * ri[r])
        d0i = 2.0 * jnp.sum(rr[r] * ri[r])
        hist_ref[0:1, r:r + 1] = jnp.full(
            (1, 1), jnp.sqrt(jnp.sqrt(d0r * d0r + d0i * d0i)))
        deltas += [d0r, d0i]
    return tuple(deltas)


def fused_cg_stencil(offsets: Tuple[Tuple[int, int], ...],
                     coef3: jnp.ndarray, b: jnp.ndarray,
                     x0: jnp.ndarray, n_iterations: int,
                     interpret: bool = False, packed: bool = None,
                     unroll: int = 1):
    """Run ``n_iterations`` of block CG on a complex 2-D stencil operator.

    offsets : static stencil offsets ((dm, dj), ...).
    unroll  : iterations per ``fori_loop`` trip (scalar path only;
              identical fp ops, amortizes loop control on tiny grids --
              benchmarks/exp_fused128.py).  Requires
              ``n_iterations % unroll == 0`` to take effect.
    coef3   : (3, noff, Nv, Nh) float32 planes [Ar, Ai, Ar+Ai]
              (build with :func:`prepare_coef3`).
    b, x0   : (2, B, Nv, Nh) float32 RHS / initial-guess planes.
    packed  : lane-packed per-RHS scalars ((B, nh) tiles, batch capacity
              bounded only by VMEM) vs statically-unrolled rank-0 scalars
              (the conservative original).  Default: packed for B >= 2.
    Returns (x, residual_history): (2, B, Nv, Nh) and (n_iterations+1, B)
    with the same COCG numerics as ``tpcg.ops.cplx.block_cg_planes``.
    """
    _, noff, nv, nh = coef3.shape
    _, nb, bv, bh = b.shape
    assert (bv, bh) == (nv, nh), (b.shape, coef3.shape)
    if packed is None:
        packed = nb >= 2
    # the lane-packed scalar layout carries the nb per-RHS scalars in
    # one (nb, nh) tile (eye-extract for the history); more RHS than
    # lanes cannot pack -- fall back to the unrolled scalar recurrences
    if packed and nb > nh:
        packed = False
    P = _pad_for(offsets)
    pv, ph = nv + 2 * P, nh + 2 * P
    dt = b.dtype

    def apply_stencil(coef_ref, dr_pad, di_pad):
        """Karatsuba complex stencil apply of the padded direction."""
        qr = jnp.zeros((nb, nv, nh), dtype=dt)
        qi = jnp.zeros((nb, nv, nh), dtype=dt)
        for s, (dm, dj) in enumerate(offsets):
            xr = dr_pad[:, P + dm:P + dm + nv, P + dj:P + dj + nh]
            xi = di_pad[:, P + dm:P + dm + nv, P + dj:P + dj + nh]
            ar = coef_ref[0, s]
            ai = coef_ref[1, s]
            ars = coef_ref[2, s]
            m1 = ar * xr
            m2 = ai * xi
            m3 = ars * (xr + xi)
            qr = qr + (m1 - m2)
            qi = qi + (m3 - m1 - m2)
        return qr, qi

    def kernel(coef_ref, b_ref, x0_ref, xout_ref, hist_ref,
               xr, xi, rr, ri, dr_pad, di_pad):
        # zero the padded buffers once; the border stays zero forever.
        dr_pad[...] = jnp.zeros((nb, pv, ph), dt)
        di_pad[...] = jnp.zeros((nb, pv, ph), dt)
        # r0 = b - A x0  (stage x0 through the padded scratch)
        dr_pad[:, P:P + nv, P:P + nh] = x0_ref[0]
        di_pad[:, P:P + nv, P:P + nh] = x0_ref[1]
        q0r, q0i = apply_stencil(coef_ref, dr_pad, di_pad)

        if packed:
            deltas0 = _packed_init(nb, nv, nh, P, b_ref, x0_ref, xr, xi,
                                   rr, ri, dr_pad, di_pad, hist_ref,
                                   q0r, q0i)

            def read_d_all():
                return (dr_pad[:, P:P + nv, P:P + nh],
                        di_pad[:, P:P + nv, P:P + nh])

            def write_d_all(wr, wi):
                dr_pad[:, P:P + nv, P:P + nh] = wr
                di_pad[:, P:P + nv, P:P + nh] = wi

            def body(it, deltas):
                return _cg_packed_body(
                    nb, nv, nh,
                    lambda: apply_stencil(coef_ref, dr_pad, di_pad),
                    read_d_all, write_d_all, xr, xi, rr, ri, hist_ref,
                    it, deltas)

            lax.fori_loop(0, n_iterations, body, deltas0)
            xout_ref[0] = xr[...]
            xout_ref[1] = xi[...]
            return

        deltas0 = _init_state(nb, nv, nh, P, b_ref, x0_ref, xr, xi, rr, ri,
                              dr_pad, di_pad, hist_ref, q0r, q0i)

        def read_d(r):
            return (dr_pad[r, P:P + nv, P:P + nh],
                    di_pad[r, P:P + nv, P:P + nh])

        def write_d(r, wr, wi):
            dr_pad[r, P:P + nv, P:P + nh] = wr
            di_pad[r, P:P + nv, P:P + nh] = wi

        def body(it, deltas):
            qr, qi = apply_stencil(coef_ref, dr_pad, di_pad)
            return _cg_scalar_step(it, deltas, nb, qr, qi, read_d,
                                   write_d, xr, xi, rr, ri, hist_ref)

        if unroll > 1 and n_iterations % unroll == 0:
            # identical fp ops, `unroll` iterations per loop trip --
            # amortizes Mosaic's per-trip loop control on tiny grids
            def bodyu(tr, deltas):
                for u in range(unroll):
                    deltas = body(tr * unroll + u, deltas)
                return deltas
            lax.fori_loop(0, n_iterations // unroll, bodyu, deltas0)
        else:
            lax.fori_loop(0, n_iterations, body, deltas0)
        xout_ref[0] = xr[...]
        xout_ref[1] = xi[...]

    out_shapes = (
        jax.ShapeDtypeStruct((2, nb, nv, nh), dt),
        # (iters+1, nb): per-RHS scalar (1, 1) stores, dynamic iteration
        # index on the sublane dim, static lane index per RHS.  One shared
        # buffer (nb <= 128 lanes) -- a per-RHS lane-padded layout would
        # burn 2.5 MB of VMEM per RHS.
        jax.ShapeDtypeStruct((n_iterations + 1, nb), dt),
    )
    x, hist = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((nb, nv, nh), dt),    # xr
            pltpu.VMEM((nb, nv, nh), dt),    # xi
            pltpu.VMEM((nb, nv, nh), dt),    # rr
            pltpu.VMEM((nb, nv, nh), dt),    # ri
            pltpu.VMEM((nb, pv, ph), dt),    # d_pad re
            pltpu.VMEM((nb, pv, ph), dt),    # d_pad im
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(coef3, b, x0)
    return x, hist


# largest batch the monolithic fused kernel compiles on the remote
# Mosaic backend (nb=32 crashes the compiler outright, HTTP 500);
# larger batches run as a scan of chunk-sized kernels in one program
_FUSED_RHS_CAP = 16


def fused_cg_stencil_chunked(offsets, coef3, b, x0, n_iterations: int,
                             chunk: int = _FUSED_RHS_CAP,
                             interpret: bool = False):
    """Arbitrary-batch fused CG: a ``lax.scan`` of chunk-sized fused
    kernels inside ONE device program.

    Lifts the reference's hard b=47 resource cap (report SV,
    ``CL_OUT_OF_RESOURCES``) -- and this backend's own compile cliff at
    nb=32 -- by construction: per-RHS recurrences are independent
    (``clcg.c:317-333``), so chunks solve back-to-back at the b=chunk
    throughput with zero cross-chunk cost.  b, x0: (2, nb, Nv, Nh);
    returns the same (x, history) layout as ``fused_cg_stencil``.
    """
    from jax import lax as _lax

    _, nb, nv, nh = b.shape
    if nb <= chunk:
        return fused_cg_stencil(offsets, coef3, b, x0, n_iterations,
                                interpret=interpret)
    pad = (-nb) % chunk
    if pad:
        zb = jnp.zeros((2, pad, nv, nh), b.dtype)
        b = jnp.concatenate([b, zb], axis=1)
        x0 = jnp.concatenate([x0, zb], axis=1)
    nc = b.shape[1] // chunk
    bs = b.reshape(2, nc, chunk, nv, nh).transpose(1, 0, 2, 3, 4)
    x0s = x0.reshape(2, nc, chunk, nv, nh).transpose(1, 0, 2, 3, 4)

    def body(carry, bx):
        bc_, x0c = bx
        x, hist = fused_cg_stencil(offsets, coef3, bc_, x0c,
                                   n_iterations, interpret=interpret)
        return carry, (x, hist)

    _, (xs, hists) = _lax.scan(body, 0, (bs, x0s))
    x = xs.transpose(1, 0, 2, 3, 4).reshape(2, nc * chunk, nv, nh)
    hist = jnp.concatenate([hists[c] for c in range(nc)], axis=1)
    return x[:, :nb], hist[:, :nb]


def prepare_coef3(stencil, dtype=np.float32) -> jnp.ndarray:
    """Stencil2D (complex coef) -> (3, noff, Nv, Nh) [Ar, Ai, Ar+Ai]."""
    c = np.asarray(stencil.coef)
    re = c.real.astype(dtype)
    im = c.imag.astype(dtype)
    return jnp.asarray(np.stack([re, im, re + im]))


def fused_cg(stencil, b, x0=None, n_iterations: int = 10,
             interpret: bool = False, packed: bool = None):
    """Convenience wrapper: complex grid arrays in / out.

    stencil : Stencil2D (complex or real coefficients).
    b       : complex (B, Nv, Nh) or (Nv, Nh).
    """
    nv, nh = stencil.grid
    b = np.asarray(b).reshape(-1, nv, nh)
    nb = b.shape[0]
    coef3 = prepare_coef3(stencil)
    bp = jnp.asarray(np.stack([b.real, b.imag]).astype(np.float32))
    if x0 is None:
        x0p = jnp.zeros((2, nb, nv, nh), jnp.float32)
    else:
        x0 = np.asarray(x0).reshape(-1, nv, nh)
        x0p = jnp.asarray(np.stack([x0.real, x0.imag]).astype(np.float32))
    x, hist = fused_cg_stencil(stencil.offsets, coef3, bp, x0p,
                               n_iterations, interpret=interpret,
                               packed=packed)
    return x, hist
