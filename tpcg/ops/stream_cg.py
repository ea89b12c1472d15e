"""HBM-streaming fused CG for constant-coefficient stencils (large N).

The VMEM-resident kernels (``tpcg.ops.fused_cg`` / ``fused_cg_const``)
cover grids up to N=512; the remote Mosaic compiler rejects the
monolithic N=1024 program outright.  This module is the large-N path:
CG state (x, r, d, q) lives in HBM and each iteration runs exactly TWO
grid-blocked Pallas kernels whose row-block pipelines stream it at HBM
bandwidth -- and *nothing else*: no per-iteration XLA glue at all.

  K1:  d_new = r + beta * d     (on block rows + P halo rows)
       q     = A d_new          (const interior taps + static edge taps)
       dq    = <d_new, q>       (unconjugated; SMEM accumulator)
       alpha = delta / dq       (scalar SMEM math at the last grid step)
  K2:  x    += alpha * d_new
       r    -= alpha * q
       delta'= <r, r>           (SMEM accumulator)
       beta  = delta' / delta   (last grid step)

Halo rows travel through side outputs: every block writes its first/last
P rows into a (G, 2P, Nh) boundary array, and the next kernel reads its
neighbours' entries via shifted BlockSpec index maps (clamped at the
edges and masked by a scalar).  The whole fixed-iteration loop is one
``lax.scan`` of two pallas calls -- zero host round-trips (the reference
pays 4 per iteration, ``clcg.c:297-419``; report section VI calls that
the main bottleneck) and zero XLA kernel launches between them.

HBM traffic: 10 state planes/iteration (~40 B per complex unknown) and
NO coefficient traffic at all -- the interior taps and the left/right
edge taps are compile-time scalars (``prepare_stream`` validates the
edge constancy; the corner deviations live in the two row strips, which
absorb the uniform edge application on rows 0 / Nv-1).  The XLA
streaming path moves ~4x more (27 coefficient planes + 16 state planes).

Reference semantics preserved exactly: COCG unconjugated dots
(``kernel/complex/vdot.cl:15``), fixed iteration count with the
exact-convergence freeze guard of ``tpcg.ops.cplx.block_cg_planes``,
identical residual-history definition.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_cg import _pad_for
from .fused_cg_const import split_const_stencil

_F = jnp.float32


def prepare_stream(stencil, dtype=np.float32):
    """Host-side preprocessing for :func:`stream_cg_const_planes`.

    Returns ``(taps, strips2)``:
      taps    : static nested tuple (cr, ci, lcr, lci, rcr, rci) -- the
                interior taps and the left/right edge taps, all python
                floats (compile-time scalars).
      strips2 : (sb, st) jnp arrays (2, noff, 1, Nh) -- bottom/top row
                corrections ADJUSTED at the corner lanes so that the
                kernel's uniform edge-tap application over all rows is
                exact (the strips subtract the double-counted edge taps
                on rows 0 / Nv-1).
    Raises ValueError when the stencil is not constant along each edge
    (then use the general coefficient path instead).
    """
    consts, strips = split_const_stencil(stencil)
    noff = len(stencil.offsets)
    nv, nh = stencil.grid

    def _edge_const(a, name):
        if not np.allclose(a, a[:, :1], rtol=1e-12, atol=1e-14):
            raise ValueError(f"{name} edge coefficients not constant")
        return a[:, 0].copy()

    lc = _edge_const(strips["left"], "left")     # (noff,) complex
    rc = _edge_const(strips["right"], "right")
    sb = strips["bot"].copy()                    # (noff, Nh) complex
    st = strips["top"].copy()
    sb[:, 0] -= lc
    sb[:, nh - 1] -= rc
    st[:, 0] -= lc
    st[:, nh - 1] -= rc
    taps = (tuple(float(v) for v in consts.real),
            tuple(float(v) for v in consts.imag),
            tuple(float(v) for v in lc.real),
            tuple(float(v) for v in lc.imag),
            tuple(float(v) for v in rc.real),
            tuple(float(v) for v in rc.imag))
    strips2 = (
        jnp.asarray(np.stack([sb.real, sb.imag])[:, :, None, :]
                    .astype(dtype)),
        jnp.asarray(np.stack([st.real, st.imag])[:, :, None, :]
                    .astype(dtype)),
    )
    assert strips2[0].shape == (2, noff, 1, nh)
    return taps, strips2


def _pick_block_rows(nv: int) -> int:
    """Largest viable row-block size: prefers the measured sweet spot
    (128), falls back to any divisor <= 256 so odd grid heights (e.g.
    the distributed solver's N = (W-1)*M + 1 grids) still stream in
    blocks instead of degenerating to one whole-grid block."""
    for bv in (128, 64, 256, 32, 16, 8):
        if nv % bv == 0 and nv // bv >= 2:
            return bv
    for bv in range(min(nv // 2, 256), 0, -1):
        if nv % bv == 0:
            return bv
    return nv


def _check_block_rows(nv: int, Bv: int, P: int, where: str) -> None:
    """Public-entry-point guard: a viable row-block decomposition needs
    Bv | nv, at least two blocks, and Bv >= the stencil pad P (the halo
    side-output slices read the first/last P rows of a block -- a smaller
    block fails at trace time with an opaque shape mismatch, e.g. any
    prime nv where ``_pick_block_rows`` degenerates to Bv=1).  The
    planner's ``_streamable`` pre-screens this; direct kernel callers get
    the clear error here instead."""
    if nv % Bv != 0 or nv // Bv < 2 or Bv < P:
        raise ValueError(
            f"{where}: grid height {nv} has no viable row-block "
            f"decomposition (block_rows={Bv}, stencil pad={P}; need "
            f"nv % Bv == 0, nv // Bv >= 2 and Bv >= P) -- pad the grid "
            "or use the XLA path (plan_stencil_cg picks automatically)")


def _boundary(v, G, Bv, P, nh):
    """(2, nv, nh) -> (2, G, 2P, nh): each block's own first/last P rows
    (the layout the kernels emit as side outputs)."""
    v3 = v.reshape(2, G, Bv, nh)
    return jnp.concatenate([v3[:, :, :P, :], v3[:, :, Bv - P:, :]], axis=2)


def _smith_cdiv(ar, ai, br, bi):
    """Scalar Smith-scaled complex division (mirrors cplx.cdiv)."""
    m = jnp.maximum(jnp.abs(br), jnp.abs(bi))
    ms = jnp.where(m == 0, 1.0, m)
    b0 = br / ms
    b1 = bi / ms
    dd = (b0 * b0 + b1 * b1) * ms
    return (ar * b0 + ai * b1) / dd, (ai * b0 - ar * b1) / dd


def _mag2_zero(ar, ai):
    """Freeze trigger for the COCG recurrences: True when |a|^2
    underflows to exact zero in f32.

    Testing the squared magnitude instead of ``(ar == 0) & (ai == 0)``
    also catches DENORMAL-range scalars: a delta of ~1e-30 passes the
    exact-zero test, so the recurrence keeps dividing by garbage-scale
    quantities -- measured on an mhd1280b-class solve, the residual
    history displays 0 (its fourth root of |delta|^2 underflows) for
    ~90 iterations and then the un-frozen recurrence wakes up and grows
    geometrically to overflow (round-5 notes).  |delta|^2 == 0 fires
    exactly when the DISPLAYED history hits zero, so "history shows 0"
    and "recurrence frozen" coincide; live trajectories (|delta| >>
    1e-19) are bit-unaffected."""
    return ar * ar + ai * ai == 0.0


def _build_kernels(offsets, grid, taps, Bv, interpret=False):
    """Build (k1, k2) pallas callables for one (grid, Bv) configuration.

    k1(strips2, beta2, delta2, r, d, Sr, Sd)
        -> (dnew, q, Sdnew, alpha_done (4,1))
    k2(alpha_done, delta2, x, d, r, q)
        -> (xn, rn, Srn, beta2 (2,1), delta_new2 (2,1), hist (1,1))
    S* are the (2, G, 2P, Nh) boundary-row side arrays (_boundary).
    Module-level so probes/tests can drive the kernels in isolation.
    """
    nv, nh = grid
    cr, ci, lcr, lci, rcr, rci = taps
    P = _pad_for(offsets)
    assert nv % Bv == 0, (nv, Bv)
    G = nv // Bv
    W = min(nh, 128)
    noff = len(offsets)

    blk = pl.BlockSpec((2, Bv, nh), lambda i: (0, i, 0))
    sblk = pl.BlockSpec((2, 1, 2 * P, nh), lambda i: (0, i, 0, 0))
    sblk_m1 = pl.BlockSpec((2, 1, 2 * P, nh),
                           lambda i: (0, jnp.maximum(i - 1, 0), 0, 0))
    sblk_p1 = pl.BlockSpec((2, 1, 2 * P, nh),
                           lambda i: (0, jnp.minimum(i + 1, G - 1), 0, 0))
    strip = pl.BlockSpec((2, noff, 1, nh), lambda i: (0, 0, 0, 0))
    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)

    def smem_out(m):
        return pl.BlockSpec((m, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    def k1_kernel(beta_ref, delta_ref, r_ref, d_ref, srm_ref, srp_ref,
                  sdm_ref, sdp_ref, sb_ref, st_ref,
                  dnew_ref, q_ref, sdn_ref, al_ref, dpr, dpi, dq_acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dq_acc[0, 0] = 0.0
            dq_acc[1, 0] = 0.0
            # zero the padded scratch once per call; lane borders and
            # (for edge blocks) missing halo rows stay zero because the
            # per-step writes below never touch them out of range.
            dpr[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)
            dpi[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)

        br = beta_ref[0, 0]
        bi = beta_ref[1, 0]
        tm = jnp.where(i > 0, 1.0, 0.0).astype(_F)
        bm = jnp.where(i < G - 1, 1.0, 0.0).astype(_F)
        dnr = r_ref[0] + br * d_ref[0] - bi * d_ref[1]
        dni = r_ref[1] + br * d_ref[1] + bi * d_ref[0]
        # halo rows: top = last P rows of block i-1, bottom = first P
        # rows of block i+1 (index maps clamped; masked at the edges)
        tr_r = tm * (srm_ref[0, 0, P:2 * P, :]
                     + br * sdm_ref[0, 0, P:2 * P, :]
                     - bi * sdm_ref[1, 0, P:2 * P, :])
        tr_i = tm * (srm_ref[1, 0, P:2 * P, :]
                     + br * sdm_ref[1, 0, P:2 * P, :]
                     + bi * sdm_ref[0, 0, P:2 * P, :])
        br_r = bm * (srp_ref[0, 0, 0:P, :]
                     + br * sdp_ref[0, 0, 0:P, :]
                     - bi * sdp_ref[1, 0, 0:P, :])
        br_i = bm * (srp_ref[1, 0, 0:P, :]
                     + br * sdp_ref[1, 0, 0:P, :]
                     + bi * sdp_ref[0, 0, 0:P, :])
        dnew_ref[0] = dnr
        dnew_ref[1] = dni
        sdn_ref[0, 0, 0:P, :] = dnr[0:P]
        sdn_ref[1, 0, 0:P, :] = dni[0:P]
        sdn_ref[0, 0, P:2 * P, :] = dnr[Bv - P:Bv]
        sdn_ref[1, 0, P:2 * P, :] = dni[Bv - P:Bv]
        dpr[0:P, P:P + nh] = tr_r
        dpi[0:P, P:P + nh] = tr_i
        dpr[P:P + Bv, P:P + nh] = dnr
        dpi[P:P + Bv, P:P + nh] = dni
        dpr[P + Bv:2 * P + Bv, P:P + nh] = br_r
        dpi[P + Bv:2 * P + Bv, P:P + nh] = br_i
        # interior constant taps (compile-time scalars: zero VMEM, zero
        # HBM -- the matrix costs nothing).  Taps with EQUAL coefficients
        # (FE stencils: 4 edge neighbours, 2/4 diagonals) are grouped:
        # sum the shifted fields first, multiply by the coefficient once
        # -- cuts the VPU work of the 7-point helm_fe apply by ~40%.
        igroups = {}
        for s, (dm, dj) in enumerate(offsets):
            if cr[s] == 0.0 and ci[s] == 0.0:
                continue
            igroups.setdefault((cr[s], ci[s]), []).append((dm, dj))
        qr = jnp.zeros((Bv, nh), _F)
        qi = jnp.zeros((Bv, nh), _F)
        for (gr, gi), offs in igroups.items():
            (dm, dj) = offs[0]
            sxr = dpr[P + dm:P + dm + Bv, P + dj:P + dj + nh]
            sxi = dpi[P + dm:P + dm + Bv, P + dj:P + dj + nh]
            for (dm, dj) in offs[1:]:
                sxr = sxr + dpr[P + dm:P + dm + Bv, P + dj:P + dj + nh]
                sxi = sxi + dpi[P + dm:P + dm + Bv, P + dj:P + dj + nh]
            if gr != 0.0:
                qr = qr + gr * sxr
                qi = qi + gr * sxi
            if gi != 0.0:
                qr = qr - gi * sxi
                qi = qi + gi * sxr
        # uniform left/right edge taps: one-hot W-wide masked blocks (a
        # width-1 column op is ~100x lane-inefficient; rows 0/Nv-1 are
        # compensated inside the adjusted row strips)
        lanes = lax.broadcasted_iota(jnp.int32, (Bv, W), 1)
        lm = (lanes == 0).astype(_F)
        rm = (lanes == W - 1).astype(_F)
        lgroups = {}
        rgroups = {}
        for s, (dm, dj) in enumerate(offsets):
            if lcr[s] != 0.0 or lci[s] != 0.0:
                lgroups.setdefault((lcr[s], lci[s]), []).append((dm, dj))
            if rcr[s] != 0.0 or rci[s] != 0.0:
                rgroups.setdefault((rcr[s], rci[s]), []).append((dm, dj))
        alr = jnp.zeros((Bv, W), _F)
        ali = jnp.zeros((Bv, W), _F)
        arr = jnp.zeros((Bv, W), _F)
        ari = jnp.zeros((Bv, W), _F)
        for (gr, gi), offs in lgroups.items():
            sxr = jnp.zeros((Bv, W), _F)
            sxi = jnp.zeros((Bv, W), _F)
            for (dm, dj) in offs:
                sxr = sxr + dpr[P + dm:P + dm + Bv, P + dj:P + dj + W]
                sxi = sxi + dpi[P + dm:P + dm + Bv, P + dj:P + dj + W]
            alr = alr + gr * sxr - gi * sxi
            ali = ali + gr * sxi + gi * sxr
        for (gr, gi), offs in rgroups.items():
            sxr = jnp.zeros((Bv, W), _F)
            sxi = jnp.zeros((Bv, W), _F)
            for (dm, dj) in offs:
                sxr = sxr + dpr[P + dm:P + dm + Bv,
                                P + nh - W + dj:P + nh + dj]
                sxi = sxi + dpi[P + dm:P + dm + Bv,
                                P + nh - W + dj:P + nh + dj]
            arr = arr + gr * sxr - gi * sxi
            ari = ari + gr * sxi + gi * sxr
        q_ref[0] = qr
        q_ref[1] = qi
        q_ref[0, :, 0:W] = q_ref[0, :, 0:W] + alr * lm
        q_ref[1, :, 0:W] = q_ref[1, :, 0:W] + ali * lm
        q_ref[0, :, nh - W:nh] = q_ref[0, :, nh - W:nh] + arr * rm
        q_ref[1, :, nh - W:nh] = q_ref[1, :, nh - W:nh] + ari * rm

        # bottom / top row strips (first / last block only)
        @pl.when(i == 0)
        def _():
            rbr = jnp.zeros((1, nh), _F)
            rbi = jnp.zeros((1, nh), _F)
            for s, (dm, dj) in enumerate(offsets):
                xr = dpr[P + dm:P + dm + 1, P + dj:P + dj + nh]
                xi = dpi[P + dm:P + dm + 1, P + dj:P + dj + nh]
                ar = sb_ref[0, s]
                ai = sb_ref[1, s]
                rbr = rbr + ar * xr - ai * xi
                rbi = rbi + ar * xi + ai * xr
            q_ref[0, 0:1, :] = q_ref[0, 0:1, :] + rbr
            q_ref[1, 0:1, :] = q_ref[1, 0:1, :] + rbi

        @pl.when(i == G - 1)
        def _():
            rtr = jnp.zeros((1, nh), _F)
            rti = jnp.zeros((1, nh), _F)
            for s, (dm, dj) in enumerate(offsets):
                xr = dpr[P + Bv - 1 + dm:P + Bv + dm, P + dj:P + dj + nh]
                xi = dpi[P + Bv - 1 + dm:P + Bv + dm, P + dj:P + dj + nh]
                ar = st_ref[0, s]
                ai = st_ref[1, s]
                rtr = rtr + ar * xr - ai * xi
                rti = rti + ar * xi + ai * xr
            q_ref[0, Bv - 1:Bv, :] = q_ref[0, Bv - 1:Bv, :] + rtr
            q_ref[1, Bv - 1:Bv, :] = q_ref[1, Bv - 1:Bv, :] + rti

        qfr = q_ref[0]
        qfi = q_ref[1]
        dq_acc[0, 0] += jnp.sum(dnr * qfr - dni * qfi)
        dq_acc[1, 0] += jnp.sum(dnr * qfi + dni * qfr)

        # alpha = delta / dq with the exact-convergence freeze guard
        # (matches block_cg_planes), computed once at the last step
        @pl.when(i == G - 1)
        def _():
            dqr = dq_acc[0, 0]
            dqi = dq_acc[1, 0]
            der = delta_ref[0, 0]
            dei = delta_ref[1, 0]
            done = (((der == 0.0) & (dei == 0.0))
                    | ((dqr == 0.0) & (dqi == 0.0)))
            sdr = jnp.where(done, 1.0, dqr)
            sdi = jnp.where(done, 1.0, dqi)
            ar, ai = _smith_cdiv(der, dei, sdr, sdi)
            al_ref[0, 0] = jnp.where(done, 0.0, ar)
            al_ref[1, 0] = jnp.where(done, 0.0, ai)
            al_ref[2, 0] = jnp.where(done, 1.0, 0.0)
            al_ref[3, 0] = 0.0

    def k1(strips2, beta2, delta2, r, d, Sr, Sd):
        sb, st = strips2
        return pl.pallas_call(
            k1_kernel,
            grid=(G,),
            in_specs=[smem_in, smem_in, blk, blk, sblk_m1, sblk_p1,
                      sblk_m1, sblk_p1, strip, strip],
            out_specs=(blk, blk, sblk, smem_out(4)),
            out_shape=(jax.ShapeDtypeStruct((2, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, G, 2 * P, nh), _F),
                       jax.ShapeDtypeStruct((4, 1), _F)),
            scratch_shapes=[pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),
                            pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),
                            pltpu.SMEM((2, 1), _F)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(beta2, delta2, r, d, Sr, Sr, Sd, Sd, sb, st)

    k2 = _make_k2(nv, nh, G, Bv, P, interpret)
    return k1, k2


def _make_k2(nv, nh, G, Bv, P, interpret=False):
    """The coefficient-free second kernel (x/r update + <r,r> + beta),
    shared by the constant-tap and variable-coefficient streaming paths."""
    blk = pl.BlockSpec((2, Bv, nh), lambda i: (0, i, 0))
    sblk = pl.BlockSpec((2, 1, 2 * P, nh), lambda i: (0, i, 0, 0))
    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)

    def smem_out(m):
        return pl.BlockSpec((m, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    def k2_kernel(al_ref, delta_ref, x_ref, d_ref, r_ref, q_ref,
                  xn_ref, rn_ref, srn_ref, beta_ref, dn_ref, hist_ref,
                  d_acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            d_acc[0, 0] = 0.0
            d_acc[1, 0] = 0.0

        ar = al_ref[0, 0]
        ai = al_ref[1, 0]
        xn_ref[0] = x_ref[0] + ar * d_ref[0] - ai * d_ref[1]
        xn_ref[1] = x_ref[1] + ar * d_ref[1] + ai * d_ref[0]
        nrr = r_ref[0] - (ar * q_ref[0] - ai * q_ref[1])
        nri = r_ref[1] - (ar * q_ref[1] + ai * q_ref[0])
        rn_ref[0] = nrr
        rn_ref[1] = nri
        srn_ref[0, 0, 0:P, :] = nrr[0:P]
        srn_ref[1, 0, 0:P, :] = nri[0:P]
        srn_ref[0, 0, P:2 * P, :] = nrr[Bv - P:Bv]
        srn_ref[1, 0, P:2 * P, :] = nri[Bv - P:Bv]
        d_acc[0, 0] += jnp.sum(nrr * nrr - nri * nri)
        d_acc[1, 0] += 2.0 * jnp.sum(nrr * nri)

        @pl.when(i == G - 1)
        def _():
            dnr = d_acc[0, 0]
            dni = d_acc[1, 0]
            done = al_ref[2, 0] > 0.5
            der = delta_ref[0, 0]
            dei = delta_ref[1, 0]
            sdr = jnp.where(done, 1.0, der)
            sdi = jnp.where(done, 1.0, dei)
            br, bi = _smith_cdiv(dnr, dni, sdr, sdi)
            beta_ref[0, 0] = jnp.where(done, 0.0, br)
            beta_ref[1, 0] = jnp.where(done, 0.0, bi)
            dn_ref[0, 0] = dnr
            dn_ref[1, 0] = dni
            hist_ref[0, 0] = jnp.sqrt(jnp.sqrt(dnr * dnr + dni * dni))

    def k2(alpha_done, delta2, x, d, r, q):
        return pl.pallas_call(
            k2_kernel,
            grid=(G,),
            in_specs=[smem_in, smem_in, blk, blk, blk, blk],
            out_specs=(blk, blk, sblk, smem_out(2), smem_out(2),
                       smem_out(1)),
            out_shape=(jax.ShapeDtypeStruct((2, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, G, 2 * P, nh), _F),
                       jax.ShapeDtypeStruct((2, 1), _F),
                       jax.ShapeDtypeStruct((2, 1), _F),
                       jax.ShapeDtypeStruct((1, 1), _F)),
            scratch_shapes=[pltpu.SMEM((2, 1), _F)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(alpha_done, delta2, x, d, r, q)

    return k2


def _build_k1_coef(offsets, grid, Bv, interpret=False):
    """K1 with per-node coefficient planes streamed from HBM.

    Variable-coefficient twin of the constant-tap K1: the full
    (2, noff, Nv, Nh) coefficient array rides the same row-block
    pipeline as the state (each block reads only its own coefficient
    rows), so no strip/edge special-casing is needed -- boundary
    modifications live in the coefficients themselves
    (``helm_fe_var``'s per-node assembly, ``helmFE_var.py:9-331``).

    k1v(coefp, beta2, delta2, r, d, Sr, Sd)
        -> (dnew, q, Sdnew, alpha_done (4,1))
    """
    nv, nh = grid
    P = _pad_for(offsets)
    assert nv % Bv == 0, (nv, Bv)
    G = nv // Bv
    noff = len(offsets)

    blk = pl.BlockSpec((2, Bv, nh), lambda i: (0, i, 0))
    cblk = pl.BlockSpec((2, noff, Bv, nh), lambda i: (0, 0, i, 0))
    sblk = pl.BlockSpec((2, 1, 2 * P, nh), lambda i: (0, i, 0, 0))
    sblk_m1 = pl.BlockSpec((2, 1, 2 * P, nh),
                           lambda i: (0, jnp.maximum(i - 1, 0), 0, 0))
    sblk_p1 = pl.BlockSpec((2, 1, 2 * P, nh),
                           lambda i: (0, jnp.minimum(i + 1, G - 1), 0, 0))
    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)

    def smem_out(m):
        return pl.BlockSpec((m, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    def k1v_kernel(beta_ref, delta_ref, coef_ref, r_ref, d_ref,
                   srm_ref, srp_ref, sdm_ref, sdp_ref,
                   dnew_ref, q_ref, sdn_ref, al_ref, dpr, dpi, dq_acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dq_acc[0, 0] = 0.0
            dq_acc[1, 0] = 0.0
            dpr[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)
            dpi[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)

        br = beta_ref[0, 0]
        bi = beta_ref[1, 0]
        tm = jnp.where(i > 0, 1.0, 0.0).astype(_F)
        bm = jnp.where(i < G - 1, 1.0, 0.0).astype(_F)
        dnr = r_ref[0] + br * d_ref[0] - bi * d_ref[1]
        dni = r_ref[1] + br * d_ref[1] + bi * d_ref[0]
        tr_r = tm * (srm_ref[0, 0, P:2 * P, :]
                     + br * sdm_ref[0, 0, P:2 * P, :]
                     - bi * sdm_ref[1, 0, P:2 * P, :])
        tr_i = tm * (srm_ref[1, 0, P:2 * P, :]
                     + br * sdm_ref[1, 0, P:2 * P, :]
                     + bi * sdm_ref[0, 0, P:2 * P, :])
        br_r = bm * (srp_ref[0, 0, 0:P, :]
                     + br * sdp_ref[0, 0, 0:P, :]
                     - bi * sdp_ref[1, 0, 0:P, :])
        br_i = bm * (srp_ref[1, 0, 0:P, :]
                     + br * sdp_ref[1, 0, 0:P, :]
                     + bi * sdp_ref[0, 0, 0:P, :])
        dnew_ref[0] = dnr
        dnew_ref[1] = dni
        sdn_ref[0, 0, 0:P, :] = dnr[0:P]
        sdn_ref[1, 0, 0:P, :] = dni[0:P]
        sdn_ref[0, 0, P:2 * P, :] = dnr[Bv - P:Bv]
        sdn_ref[1, 0, P:2 * P, :] = dni[Bv - P:Bv]
        dpr[0:P, P:P + nh] = tr_r
        dpi[0:P, P:P + nh] = tr_i
        dpr[P:P + Bv, P:P + nh] = dnr
        dpi[P:P + Bv, P:P + nh] = dni
        dpr[P + Bv:2 * P + Bv, P:P + nh] = br_r
        dpi[P + Bv:2 * P + Bv, P:P + nh] = br_i

        qr = jnp.zeros((Bv, nh), _F)
        qi = jnp.zeros((Bv, nh), _F)
        for s, (dm, dj) in enumerate(offsets):
            ar = coef_ref[0, s]
            ai = coef_ref[1, s]
            xr = dpr[P + dm:P + dm + Bv, P + dj:P + dj + nh]
            xi = dpi[P + dm:P + dm + Bv, P + dj:P + dj + nh]
            qr = qr + ar * xr - ai * xi
            qi = qi + ar * xi + ai * xr
        q_ref[0] = qr
        q_ref[1] = qi
        dq_acc[0, 0] += jnp.sum(dnr * qr - dni * qi)
        dq_acc[1, 0] += jnp.sum(dnr * qi + dni * qr)

        @pl.when(i == G - 1)
        def _():
            dqr = dq_acc[0, 0]
            dqi = dq_acc[1, 0]
            der = delta_ref[0, 0]
            dei = delta_ref[1, 0]
            done = (((der == 0.0) & (dei == 0.0))
                    | ((dqr == 0.0) & (dqi == 0.0)))
            sdr = jnp.where(done, 1.0, dqr)
            sdi = jnp.where(done, 1.0, dqi)
            ar, ai = _smith_cdiv(der, dei, sdr, sdi)
            al_ref[0, 0] = jnp.where(done, 0.0, ar)
            al_ref[1, 0] = jnp.where(done, 0.0, ai)
            al_ref[2, 0] = jnp.where(done, 1.0, 0.0)
            al_ref[3, 0] = 0.0

    def k1v(coefp, beta2, delta2, r, d, Sr, Sd):
        return pl.pallas_call(
            k1v_kernel,
            grid=(G,),
            in_specs=[smem_in, smem_in, cblk, blk, blk, sblk_m1,
                      sblk_p1, sblk_m1, sblk_p1],
            out_specs=(blk, blk, sblk, smem_out(4)),
            out_shape=(jax.ShapeDtypeStruct((2, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, G, 2 * P, nh), _F),
                       jax.ShapeDtypeStruct((4, 1), _F)),
            scratch_shapes=[pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),
                            pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),
                            pltpu.SMEM((2, 1), _F)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(beta2, delta2, coefp, r, d, Sr, Sr, Sd, Sd)

    return k1v


def _batched_specs(nb, Bv, P, nh, noff, G):
    """BlockSpecs shared by the batched K1/K2 kernels: 2-D grid
    (row-block i OUTER, RHS b INNER).  State/boundary blocks select one
    (block, RHS) pane each step, so the pipeline working set stays
    single-RHS sized; the coefficient/strip specs depend only on i, so
    Mosaic keeps them resident across the nb inner steps -- one matrix
    fetch per row block amortized over the whole batch (the reference's
    N_RHS block trick, ``kernel/complex/spmv.cl:25-33`` / report Fig. 6).
    """
    blk = pl.BlockSpec((2, 1, Bv, nh), lambda i, b: (0, b, i, 0))
    cblk = pl.BlockSpec((2, noff, Bv, nh), lambda i, b: (0, 0, i, 0))
    sblk = pl.BlockSpec((2, 1, 1, 2 * P, nh),
                        lambda i, b: (0, b, i, 0, 0))
    sblk_m1 = pl.BlockSpec(
        (2, 1, 1, 2 * P, nh),
        lambda i, b: (0, b, jnp.maximum(i - 1, 0), 0, 0))
    sblk_p1 = pl.BlockSpec(
        (2, 1, 1, 2 * P, nh),
        lambda i, b: (0, b, jnp.minimum(i + 1, G - 1), 0, 0))
    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)

    def smem_out(m):
        return pl.BlockSpec((m, nb), lambda i, b: (0, 0),
                            memory_space=pltpu.SMEM)

    return blk, cblk, sblk, sblk_m1, sblk_p1, smem_in, smem_out


def _build_k1_coef_batched(offsets, grid, nb, Bv, interpret=False):
    """Batched (nb-RHS) variable-coefficient K1 on a (G, nb) grid.

    The coefficient planes are fetched ONCE per row block and shared by
    all nb right-hand sides (see :func:`_batched_specs`): with the state
    at 10 planes/RHS and the coefficients at 2*noff planes total,
    per-RHS HBM traffic drops from 10 + 2*noff to 10 + 2*noff/nb.
    (The round-2 formulation processed all RHS per grid step instead,
    which grew every pipeline buffer nb-fold and lost to the sequential
    loop; this one keeps single-RHS block sizes.)

    Per-RHS scalars (alpha/beta/delta, the freeze guard) live in SMEM
    (2, nb) arrays indexed by the inner grid coordinate.
    k1(coefp, beta2, delta2, r, d, Sr, Sd)
        -> (dnew, q, Sdnew, alpha_done (4, nb))
    with state planes (2, nb, Nv, Nh), boundaries (2, nb, G, 2P, Nh).
    """
    nv, nh = grid
    P = _pad_for(offsets)
    assert nv % Bv == 0, (nv, Bv)
    G = nv // Bv
    noff = len(offsets)
    blk, cblk, sblk, sblk_m1, sblk_p1, smem_in, smem_out = \
        _batched_specs(nb, Bv, P, nh, noff, G)

    def k1_kernel(beta_ref, delta_ref, coef_ref, r_ref, d_ref,
                  srm_ref, srp_ref, sdm_ref, sdp_ref,
                  dnew_ref, q_ref, sdn_ref, al_ref, dpr, dpi, dq_acc):
        i = pl.program_id(0)
        b = pl.program_id(1)

        @pl.when((i == 0) & (b == 0))
        def _():
            dpr[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)
            dpi[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)

        @pl.when(i == 0)
        def _():
            dq_acc[0, b] = 0.0
            dq_acc[1, b] = 0.0

        tm = jnp.where(i > 0, 1.0, 0.0).astype(_F)
        bm = jnp.where(i < G - 1, 1.0, 0.0).astype(_F)
        br = beta_ref[0, b]
        bi = beta_ref[1, b]
        dnr = r_ref[0, 0] + br * d_ref[0, 0] - bi * d_ref[1, 0]
        dni = r_ref[1, 0] + br * d_ref[1, 0] + bi * d_ref[0, 0]
        tr_r = tm * (srm_ref[0, 0, 0, P:2 * P, :]
                     + br * sdm_ref[0, 0, 0, P:2 * P, :]
                     - bi * sdm_ref[1, 0, 0, P:2 * P, :])
        tr_i = tm * (srm_ref[1, 0, 0, P:2 * P, :]
                     + br * sdm_ref[1, 0, 0, P:2 * P, :]
                     + bi * sdm_ref[0, 0, 0, P:2 * P, :])
        br_r = bm * (srp_ref[0, 0, 0, 0:P, :]
                     + br * sdp_ref[0, 0, 0, 0:P, :]
                     - bi * sdp_ref[1, 0, 0, 0:P, :])
        br_i = bm * (srp_ref[1, 0, 0, 0:P, :]
                     + br * sdp_ref[1, 0, 0, 0:P, :]
                     + bi * sdp_ref[0, 0, 0, 0:P, :])
        dnew_ref[0, 0] = dnr
        dnew_ref[1, 0] = dni
        sdn_ref[0, 0, 0, 0:P, :] = dnr[0:P]
        sdn_ref[1, 0, 0, 0:P, :] = dni[0:P]
        sdn_ref[0, 0, 0, P:2 * P, :] = dnr[Bv - P:Bv]
        sdn_ref[1, 0, 0, P:2 * P, :] = dni[Bv - P:Bv]
        dpr[0:P, P:P + nh] = tr_r
        dpi[0:P, P:P + nh] = tr_i
        dpr[P:P + Bv, P:P + nh] = dnr
        dpi[P:P + Bv, P:P + nh] = dni
        dpr[P + Bv:2 * P + Bv, P:P + nh] = br_r
        dpi[P + Bv:2 * P + Bv, P:P + nh] = br_i

        qr = jnp.zeros((Bv, nh), _F)
        qi = jnp.zeros((Bv, nh), _F)
        for s, (dm, dj) in enumerate(offsets):
            ar = coef_ref[0, s]
            ai = coef_ref[1, s]
            xr = dpr[P + dm:P + dm + Bv, P + dj:P + dj + nh]
            xi = dpi[P + dm:P + dm + Bv, P + dj:P + dj + nh]
            qr = qr + ar * xr - ai * xi
            qi = qi + ar * xi + ai * xr
        q_ref[0, 0] = qr
        q_ref[1, 0] = qi
        dq_acc[0, b] += jnp.sum(dnr * qr - dni * qi)
        dq_acc[1, b] += jnp.sum(dnr * qi + dni * qr)

        @pl.when(i == G - 1)
        def _():
            dqr = dq_acc[0, b]
            dqi = dq_acc[1, b]
            der = delta_ref[0, b]
            dei = delta_ref[1, b]
            done = (((der == 0.0) & (dei == 0.0))
                    | ((dqr == 0.0) & (dqi == 0.0)))
            sdr = jnp.where(done, 1.0, dqr)
            sdi = jnp.where(done, 1.0, dqi)
            ar, ai = _smith_cdiv(der, dei, sdr, sdi)
            al_ref[0, b] = jnp.where(done, 0.0, ar)
            al_ref[1, b] = jnp.where(done, 0.0, ai)
            al_ref[2, b] = jnp.where(done, 1.0, 0.0)
            al_ref[3, b] = 0.0

    def k1(coefp, beta2, delta2, r, d, Sr, Sd):
        return pl.pallas_call(
            k1_kernel,
            grid=(G, nb),
            in_specs=[smem_in, smem_in, cblk, blk, blk, sblk_m1,
                      sblk_p1, sblk_m1, sblk_p1],
            out_specs=(blk, blk, sblk, smem_out(4)),
            out_shape=(jax.ShapeDtypeStruct((2, nb, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nb, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nb, G, 2 * P, nh), _F),
                       jax.ShapeDtypeStruct((4, nb), _F)),
            scratch_shapes=[
                pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),
                pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),
                pltpu.SMEM((2, nb), _F)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(beta2, delta2, coefp, r, d, Sr, Sr, Sd, Sd)

    return k1


def _build_k1_const_batched(offsets, grid, taps, nb, Bv, interpret=False):
    """Batched (nb-RHS) constant-tap K1 on a (G, nb) grid.

    The matrix costs zero HBM bytes here (compile-time taps + tiny
    strips), so batching buys dispatch amortization: one device program
    per iteration for the whole batch instead of nb sequential solves.
    Same contract as the coef variant with ``strips2`` in place of the
    coefficient planes."""
    nv, nh = grid
    cr, ci, lcr, lci, rcr, rci = taps
    P = _pad_for(offsets)
    assert nv % Bv == 0, (nv, Bv)
    G = nv // Bv
    W = min(nh, 128)
    noff = len(offsets)
    blk, _, sblk, sblk_m1, sblk_p1, smem_in, smem_out = \
        _batched_specs(nb, Bv, P, nh, noff, G)
    strip = pl.BlockSpec((2, noff, 1, nh), lambda i, b: (0, 0, 0, 0))

    def k1_kernel(beta_ref, delta_ref, r_ref, d_ref, srm_ref, srp_ref,
                  sdm_ref, sdp_ref, sb_ref, st_ref,
                  dnew_ref, q_ref, sdn_ref, al_ref, dpr, dpi, dq_acc):
        i = pl.program_id(0)
        b = pl.program_id(1)

        @pl.when((i == 0) & (b == 0))
        def _():
            dpr[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)
            dpi[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)

        @pl.when(i == 0)
        def _():
            dq_acc[0, b] = 0.0
            dq_acc[1, b] = 0.0

        br = beta_ref[0, b]
        bi = beta_ref[1, b]
        tm = jnp.where(i > 0, 1.0, 0.0).astype(_F)
        bm = jnp.where(i < G - 1, 1.0, 0.0).astype(_F)
        dnr = r_ref[0, 0] + br * d_ref[0, 0] - bi * d_ref[1, 0]
        dni = r_ref[1, 0] + br * d_ref[1, 0] + bi * d_ref[0, 0]
        tr_r = tm * (srm_ref[0, 0, 0, P:2 * P, :]
                     + br * sdm_ref[0, 0, 0, P:2 * P, :]
                     - bi * sdm_ref[1, 0, 0, P:2 * P, :])
        tr_i = tm * (srm_ref[1, 0, 0, P:2 * P, :]
                     + br * sdm_ref[1, 0, 0, P:2 * P, :]
                     + bi * sdm_ref[0, 0, 0, P:2 * P, :])
        br_r = bm * (srp_ref[0, 0, 0, 0:P, :]
                     + br * sdp_ref[0, 0, 0, 0:P, :]
                     - bi * sdp_ref[1, 0, 0, 0:P, :])
        br_i = bm * (srp_ref[1, 0, 0, 0:P, :]
                     + br * sdp_ref[1, 0, 0, 0:P, :]
                     + bi * sdp_ref[0, 0, 0, 0:P, :])
        dnew_ref[0, 0] = dnr
        dnew_ref[1, 0] = dni
        sdn_ref[0, 0, 0, 0:P, :] = dnr[0:P]
        sdn_ref[1, 0, 0, 0:P, :] = dni[0:P]
        sdn_ref[0, 0, 0, P:2 * P, :] = dnr[Bv - P:Bv]
        sdn_ref[1, 0, 0, P:2 * P, :] = dni[Bv - P:Bv]
        dpr[0:P, P:P + nh] = tr_r
        dpi[0:P, P:P + nh] = tr_i
        dpr[P:P + Bv, P:P + nh] = dnr
        dpi[P:P + Bv, P:P + nh] = dni
        dpr[P + Bv:2 * P + Bv, P:P + nh] = br_r
        dpi[P + Bv:2 * P + Bv, P:P + nh] = br_i

        # interior constant taps, equal-coefficient groups (see the
        # single-RHS kernel for the rationale)
        igroups = {}
        for s, (dm, dj) in enumerate(offsets):
            if cr[s] == 0.0 and ci[s] == 0.0:
                continue
            igroups.setdefault((cr[s], ci[s]), []).append((dm, dj))
        qr = jnp.zeros((Bv, nh), _F)
        qi = jnp.zeros((Bv, nh), _F)
        for (gr, gi), offs in igroups.items():
            (dm, dj) = offs[0]
            sxr = dpr[P + dm:P + dm + Bv, P + dj:P + dj + nh]
            sxi = dpi[P + dm:P + dm + Bv, P + dj:P + dj + nh]
            for (dm, dj) in offs[1:]:
                sxr = sxr + dpr[P + dm:P + dm + Bv, P + dj:P + dj + nh]
                sxi = sxi + dpi[P + dm:P + dm + Bv, P + dj:P + dj + nh]
            if gr != 0.0:
                qr = qr + gr * sxr
                qi = qi + gr * sxi
            if gi != 0.0:
                qr = qr - gi * sxi
                qi = qi + gi * sxr
        lanes = lax.broadcasted_iota(jnp.int32, (Bv, W), 1)
        lm = (lanes == 0).astype(_F)
        rm = (lanes == W - 1).astype(_F)
        lgroups = {}
        rgroups = {}
        for s, (dm, dj) in enumerate(offsets):
            if lcr[s] != 0.0 or lci[s] != 0.0:
                lgroups.setdefault((lcr[s], lci[s]), []).append((dm, dj))
            if rcr[s] != 0.0 or rci[s] != 0.0:
                rgroups.setdefault((rcr[s], rci[s]), []).append((dm, dj))
        alr = jnp.zeros((Bv, W), _F)
        ali = jnp.zeros((Bv, W), _F)
        arr = jnp.zeros((Bv, W), _F)
        ari = jnp.zeros((Bv, W), _F)
        for (gr, gi), offs in lgroups.items():
            sxr = jnp.zeros((Bv, W), _F)
            sxi = jnp.zeros((Bv, W), _F)
            for (dm, dj) in offs:
                sxr = sxr + dpr[P + dm:P + dm + Bv, P + dj:P + dj + W]
                sxi = sxi + dpi[P + dm:P + dm + Bv, P + dj:P + dj + W]
            alr = alr + gr * sxr - gi * sxi
            ali = ali + gr * sxi + gi * sxr
        for (gr, gi), offs in rgroups.items():
            sxr = jnp.zeros((Bv, W), _F)
            sxi = jnp.zeros((Bv, W), _F)
            for (dm, dj) in offs:
                sxr = sxr + dpr[P + dm:P + dm + Bv,
                                P + nh - W + dj:P + nh + dj]
                sxi = sxi + dpi[P + dm:P + dm + Bv,
                                P + nh - W + dj:P + nh + dj]
            arr = arr + gr * sxr - gi * sxi
            ari = ari + gr * sxi + gi * sxr
        q_ref[0, 0] = qr
        q_ref[1, 0] = qi
        q_ref[0, 0, :, 0:W] = q_ref[0, 0, :, 0:W] + alr * lm
        q_ref[1, 0, :, 0:W] = q_ref[1, 0, :, 0:W] + ali * lm
        q_ref[0, 0, :, nh - W:nh] = q_ref[0, 0, :, nh - W:nh] + arr * rm
        q_ref[1, 0, :, nh - W:nh] = q_ref[1, 0, :, nh - W:nh] + ari * rm

        @pl.when(i == 0)
        def _():
            rbr = jnp.zeros((1, nh), _F)
            rbi = jnp.zeros((1, nh), _F)
            for s, (dm, dj) in enumerate(offsets):
                xr = dpr[P + dm:P + dm + 1, P + dj:P + dj + nh]
                xi = dpi[P + dm:P + dm + 1, P + dj:P + dj + nh]
                ar = sb_ref[0, s]
                ai = sb_ref[1, s]
                rbr = rbr + ar * xr - ai * xi
                rbi = rbi + ar * xi + ai * xr
            q_ref[0, 0, 0:1, :] = q_ref[0, 0, 0:1, :] + rbr
            q_ref[1, 0, 0:1, :] = q_ref[1, 0, 0:1, :] + rbi

        @pl.when(i == G - 1)
        def _():
            rtr = jnp.zeros((1, nh), _F)
            rti = jnp.zeros((1, nh), _F)
            for s, (dm, dj) in enumerate(offsets):
                xr = dpr[P + Bv - 1 + dm:P + Bv + dm, P + dj:P + dj + nh]
                xi = dpi[P + Bv - 1 + dm:P + Bv + dm, P + dj:P + dj + nh]
                ar = st_ref[0, s]
                ai = st_ref[1, s]
                rtr = rtr + ar * xr - ai * xi
                rti = rti + ar * xi + ai * xr
            q_ref[0, 0, Bv - 1:Bv, :] = q_ref[0, 0, Bv - 1:Bv, :] + rtr
            q_ref[1, 0, Bv - 1:Bv, :] = q_ref[1, 0, Bv - 1:Bv, :] + rti

        qfr = q_ref[0, 0]
        qfi = q_ref[1, 0]
        dq_acc[0, b] += jnp.sum(dnr * qfr - dni * qfi)
        dq_acc[1, b] += jnp.sum(dnr * qfi + dni * qfr)

        @pl.when(i == G - 1)
        def _():
            dqr = dq_acc[0, b]
            dqi = dq_acc[1, b]
            der = delta_ref[0, b]
            dei = delta_ref[1, b]
            done = (((der == 0.0) & (dei == 0.0))
                    | ((dqr == 0.0) & (dqi == 0.0)))
            sdr = jnp.where(done, 1.0, dqr)
            sdi = jnp.where(done, 1.0, dqi)
            ar, ai = _smith_cdiv(der, dei, sdr, sdi)
            al_ref[0, b] = jnp.where(done, 0.0, ar)
            al_ref[1, b] = jnp.where(done, 0.0, ai)
            al_ref[2, b] = jnp.where(done, 1.0, 0.0)
            al_ref[3, b] = 0.0

    def k1(strips2, beta2, delta2, r, d, Sr, Sd):
        sb, st = strips2
        return pl.pallas_call(
            k1_kernel,
            grid=(G, nb),
            in_specs=[smem_in, smem_in, blk, blk, sblk_m1, sblk_p1,
                      sblk_m1, sblk_p1, strip, strip],
            out_specs=(blk, blk, sblk, smem_out(4)),
            out_shape=(jax.ShapeDtypeStruct((2, nb, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nb, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nb, G, 2 * P, nh), _F),
                       jax.ShapeDtypeStruct((4, nb), _F)),
            scratch_shapes=[
                pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),
                pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),
                pltpu.SMEM((2, nb), _F)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(beta2, delta2, r, d, Sr, Sr, Sd, Sd, sb, st)

    return k1


def _make_k2_batched(nv, nh, nb, G, Bv, P, interpret=False):
    """Batched second kernel on the (G, nb) grid: per-RHS x/r updates,
    <r,r>, beta (single-RHS-sized pipeline blocks, SMEM scalars indexed
    by the inner grid coordinate -- see :func:`_batched_specs`)."""
    blk, _, sblk, _, _, smem_in, smem_out = \
        _batched_specs(nb, Bv, P, nh, 1, G)

    def k2_kernel(al_ref, delta_ref, x_ref, d_ref, r_ref, q_ref,
                  xn_ref, rn_ref, srn_ref, beta_ref, dn_ref, hist_ref,
                  d_acc):
        i = pl.program_id(0)
        b = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            d_acc[0, b] = 0.0
            d_acc[1, b] = 0.0

        ar = al_ref[0, b]
        ai = al_ref[1, b]
        xn_ref[0, 0] = x_ref[0, 0] + ar * d_ref[0, 0] - ai * d_ref[1, 0]
        xn_ref[1, 0] = x_ref[1, 0] + ar * d_ref[1, 0] + ai * d_ref[0, 0]
        nrr = r_ref[0, 0] - (ar * q_ref[0, 0] - ai * q_ref[1, 0])
        nri = r_ref[1, 0] - (ar * q_ref[1, 0] + ai * q_ref[0, 0])
        rn_ref[0, 0] = nrr
        rn_ref[1, 0] = nri
        srn_ref[0, 0, 0, 0:P, :] = nrr[0:P]
        srn_ref[1, 0, 0, 0:P, :] = nri[0:P]
        srn_ref[0, 0, 0, P:2 * P, :] = nrr[Bv - P:Bv]
        srn_ref[1, 0, 0, P:2 * P, :] = nri[Bv - P:Bv]
        d_acc[0, b] += jnp.sum(nrr * nrr - nri * nri)
        d_acc[1, b] += 2.0 * jnp.sum(nrr * nri)

        @pl.when(i == G - 1)
        def _():
            dnr = d_acc[0, b]
            dni = d_acc[1, b]
            done = al_ref[2, b] > 0.5
            der = delta_ref[0, b]
            dei = delta_ref[1, b]
            sdr = jnp.where(done, 1.0, der)
            sdi = jnp.where(done, 1.0, dei)
            br, bi = _smith_cdiv(dnr, dni, sdr, sdi)
            beta_ref[0, b] = jnp.where(done, 0.0, br)
            beta_ref[1, b] = jnp.where(done, 0.0, bi)
            dn_ref[0, b] = dnr
            dn_ref[1, b] = dni
            hist_ref[0, b] = jnp.sqrt(jnp.sqrt(dnr * dnr + dni * dni))

    def k2(alpha_done, delta2, x, d, r, q):
        return pl.pallas_call(
            k2_kernel,
            grid=(G, nb),
            in_specs=[smem_in, smem_in, blk, blk, blk, blk],
            out_specs=(blk, blk, sblk, smem_out(2), smem_out(2),
                       smem_out(1)),
            out_shape=(jax.ShapeDtypeStruct((2, nb, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nb, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nb, G, 2 * P, nh), _F),
                       jax.ShapeDtypeStruct((2, nb), _F),
                       jax.ShapeDtypeStruct((2, nb), _F),
                       jax.ShapeDtypeStruct((1, nb), _F)),
            scratch_shapes=[pltpu.SMEM((2, nb), _F)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(alpha_done, delta2, x, d, r, q)

    return k2


def _build_k1_coef_batched_fat(offsets, grid, nb, Bv, interpret=False):
    """Batched (nb-RHS) variable-coefficient K1, all RHS per grid step.

    The coefficient planes are read ONCE per block and shared by all
    nb right-hand sides -- the whole point of block mode here: with the
    state at 10 planes/RHS and the coefficients at 2*noff planes total,
    per-RHS HBM traffic drops from 10 + 2*noff to 10 + 2*noff/nb
    (the reference's block trick amortizes kernel launches + matrix
    reads the same way, report section V / Fig. 6).

    Per-RHS scalars (alpha/beta/delta, the freeze guard) live in SMEM
    as (2, nb) arrays with the scalar recurrences unrolled over the
    static batch.
    k1(coefp, beta2, delta2, r, d, Sr, Sd)
        -> (dnew, q, Sdnew, alpha_done (4, nb))
    with state planes (2, nb, Nv, Nh), boundaries (2, nb, G, 2P, Nh).
    """
    nv, nh = grid
    P = _pad_for(offsets)
    assert nv % Bv == 0, (nv, Bv)
    G = nv // Bv
    noff = len(offsets)

    blk = pl.BlockSpec((2, nb, Bv, nh), lambda i: (0, 0, i, 0))
    cblk = pl.BlockSpec((2, noff, Bv, nh), lambda i: (0, 0, i, 0))
    sblk = pl.BlockSpec((2, nb, 1, 2 * P, nh), lambda i: (0, 0, i, 0, 0))
    sblk_m1 = pl.BlockSpec(
        (2, nb, 1, 2 * P, nh),
        lambda i: (0, 0, jnp.maximum(i - 1, 0), 0, 0))
    sblk_p1 = pl.BlockSpec(
        (2, nb, 1, 2 * P, nh),
        lambda i: (0, 0, jnp.minimum(i + 1, G - 1), 0, 0))
    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)

    def smem_out(m):
        return pl.BlockSpec((m, nb), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    def k1_kernel(beta_ref, delta_ref, coef_ref, r_ref, d_ref,
                  srm_ref, srp_ref, sdm_ref, sdp_ref,
                  dnew_ref, q_ref, sdn_ref, al_ref, dpr, dpi, dq_acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for b in range(nb):
                dq_acc[0, b] = 0.0
                dq_acc[1, b] = 0.0
            dpr[...] = jnp.zeros((nb, Bv + 2 * P, nh + 2 * P), _F)
            dpi[...] = jnp.zeros((nb, Bv + 2 * P, nh + 2 * P), _F)

        tm = jnp.where(i > 0, 1.0, 0.0).astype(_F)
        bm = jnp.where(i < G - 1, 1.0, 0.0).astype(_F)
        for b in range(nb):
            br = beta_ref[0, b]
            bi = beta_ref[1, b]
            dnr = r_ref[0, b] + br * d_ref[0, b] - bi * d_ref[1, b]
            dni = r_ref[1, b] + br * d_ref[1, b] + bi * d_ref[0, b]
            tr_r = tm * (srm_ref[0, b, 0, P:2 * P, :]
                         + br * sdm_ref[0, b, 0, P:2 * P, :]
                         - bi * sdm_ref[1, b, 0, P:2 * P, :])
            tr_i = tm * (srm_ref[1, b, 0, P:2 * P, :]
                         + br * sdm_ref[1, b, 0, P:2 * P, :]
                         + bi * sdm_ref[0, b, 0, P:2 * P, :])
            br_r = bm * (srp_ref[0, b, 0, 0:P, :]
                         + br * sdp_ref[0, b, 0, 0:P, :]
                         - bi * sdp_ref[1, b, 0, 0:P, :])
            br_i = bm * (srp_ref[1, b, 0, 0:P, :]
                         + br * sdp_ref[1, b, 0, 0:P, :]
                         + bi * sdp_ref[0, b, 0, 0:P, :])
            dnew_ref[0, b] = dnr
            dnew_ref[1, b] = dni
            sdn_ref[0, b, 0, 0:P, :] = dnr[0:P]
            sdn_ref[1, b, 0, 0:P, :] = dni[0:P]
            sdn_ref[0, b, 0, P:2 * P, :] = dnr[Bv - P:Bv]
            sdn_ref[1, b, 0, P:2 * P, :] = dni[Bv - P:Bv]
            dpr[b, 0:P, P:P + nh] = tr_r
            dpi[b, 0:P, P:P + nh] = tr_i
            dpr[b, P:P + Bv, P:P + nh] = dnr
            dpi[b, P:P + Bv, P:P + nh] = dni
            dpr[b, P + Bv:2 * P + Bv, P:P + nh] = br_r
            dpi[b, P + Bv:2 * P + Bv, P:P + nh] = br_i

        for b in range(nb):
            qr = jnp.zeros((Bv, nh), _F)
            qi = jnp.zeros((Bv, nh), _F)
            for s, (dm, dj) in enumerate(offsets):
                ar = coef_ref[0, s]
                ai = coef_ref[1, s]
                xr = dpr[b, P + dm:P + dm + Bv, P + dj:P + dj + nh]
                xi = dpi[b, P + dm:P + dm + Bv, P + dj:P + dj + nh]
                qr = qr + ar * xr - ai * xi
                qi = qi + ar * xi + ai * xr
            q_ref[0, b] = qr
            q_ref[1, b] = qi
            dnr = dnew_ref[0, b]
            dni = dnew_ref[1, b]
            dq_acc[0, b] += jnp.sum(dnr * qr - dni * qi)
            dq_acc[1, b] += jnp.sum(dnr * qi + dni * qr)

        @pl.when(i == G - 1)
        def _():
            for b in range(nb):
                dqr = dq_acc[0, b]
                dqi = dq_acc[1, b]
                der = delta_ref[0, b]
                dei = delta_ref[1, b]
                done = (((der == 0.0) & (dei == 0.0))
                        | ((dqr == 0.0) & (dqi == 0.0)))
                sdr = jnp.where(done, 1.0, dqr)
                sdi = jnp.where(done, 1.0, dqi)
                ar, ai = _smith_cdiv(der, dei, sdr, sdi)
                al_ref[0, b] = jnp.where(done, 0.0, ar)
                al_ref[1, b] = jnp.where(done, 0.0, ai)
                al_ref[2, b] = jnp.where(done, 1.0, 0.0)
                al_ref[3, b] = 0.0

    def k1(coefp, beta2, delta2, r, d, Sr, Sd):
        return pl.pallas_call(
            k1_kernel,
            grid=(G,),
            in_specs=[smem_in, smem_in, cblk, blk, blk, sblk_m1,
                      sblk_p1, sblk_m1, sblk_p1],
            out_specs=(blk, blk, sblk, smem_out(4)),
            out_shape=(jax.ShapeDtypeStruct((2, nb, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nb, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nb, G, 2 * P, nh), _F),
                       jax.ShapeDtypeStruct((4, nb), _F)),
            scratch_shapes=[
                pltpu.VMEM((nb, Bv + 2 * P, nh + 2 * P), _F),
                pltpu.VMEM((nb, Bv + 2 * P, nh + 2 * P), _F),
                pltpu.SMEM((2, nb), _F)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(beta2, delta2, coefp, r, d, Sr, Sr, Sd, Sd)

    return k1


def _make_k2_batched_fat(nv, nh, nb, G, Bv, P, interpret=False):
    """Batched second kernel: per-RHS x/r updates, <r,r>, beta."""
    blk = pl.BlockSpec((2, nb, Bv, nh), lambda i: (0, 0, i, 0))
    sblk = pl.BlockSpec((2, nb, 1, 2 * P, nh), lambda i: (0, 0, i, 0, 0))
    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)

    def smem_out(m):
        return pl.BlockSpec((m, nb), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    def k2_kernel(al_ref, delta_ref, x_ref, d_ref, r_ref, q_ref,
                  xn_ref, rn_ref, srn_ref, beta_ref, dn_ref, hist_ref,
                  d_acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for b in range(nb):
                d_acc[0, b] = 0.0
                d_acc[1, b] = 0.0

        for b in range(nb):
            ar = al_ref[0, b]
            ai = al_ref[1, b]
            xn_ref[0, b] = x_ref[0, b] + ar * d_ref[0, b] - ai * d_ref[1, b]
            xn_ref[1, b] = x_ref[1, b] + ar * d_ref[1, b] + ai * d_ref[0, b]
            nrr = r_ref[0, b] - (ar * q_ref[0, b] - ai * q_ref[1, b])
            nri = r_ref[1, b] - (ar * q_ref[1, b] + ai * q_ref[0, b])
            rn_ref[0, b] = nrr
            rn_ref[1, b] = nri
            srn_ref[0, b, 0, 0:P, :] = nrr[0:P]
            srn_ref[1, b, 0, 0:P, :] = nri[0:P]
            srn_ref[0, b, 0, P:2 * P, :] = nrr[Bv - P:Bv]
            srn_ref[1, b, 0, P:2 * P, :] = nri[Bv - P:Bv]
            d_acc[0, b] += jnp.sum(nrr * nrr - nri * nri)
            d_acc[1, b] += 2.0 * jnp.sum(nrr * nri)

        @pl.when(i == G - 1)
        def _():
            for b in range(nb):
                dnr = d_acc[0, b]
                dni = d_acc[1, b]
                done = al_ref[2, b] > 0.5
                der = delta_ref[0, b]
                dei = delta_ref[1, b]
                sdr = jnp.where(done, 1.0, der)
                sdi = jnp.where(done, 1.0, dei)
                br, bi = _smith_cdiv(dnr, dni, sdr, sdi)
                beta_ref[0, b] = jnp.where(done, 0.0, br)
                beta_ref[1, b] = jnp.where(done, 0.0, bi)
                dn_ref[0, b] = dnr
                dn_ref[1, b] = dni
                hist_ref[0, b] = jnp.sqrt(jnp.sqrt(dnr * dnr + dni * dni))

    def k2(alpha_done, delta2, x, d, r, q):
        return pl.pallas_call(
            k2_kernel,
            grid=(G,),
            in_specs=[smem_in, smem_in, blk, blk, blk, blk],
            out_specs=(blk, blk, sblk, smem_out(2), smem_out(2),
                       smem_out(1)),
            out_shape=(jax.ShapeDtypeStruct((2, nb, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nb, nv, nh), _F),
                       jax.ShapeDtypeStruct((2, nb, G, 2 * P, nh), _F),
                       jax.ShapeDtypeStruct((2, nb), _F),
                       jax.ShapeDtypeStruct((2, nb), _F),
                       jax.ShapeDtypeStruct((1, nb), _F)),
            scratch_shapes=[pltpu.SMEM((2, nb), _F)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(alpha_done, delta2, x, d, r, q)

    return k2


def _boundary_b(v, G, Bv, P, nh):
    """(2, nb, nv, nh) -> (2, nb, G, 2P, nh)."""
    nb = v.shape[1]
    v4 = v.reshape(2, nb, G, Bv, nh)
    return jnp.concatenate([v4[:, :, :, :P, :], v4[:, :, :, Bv - P:, :]],
                           axis=3)


def _stream_loop_batched(k1, k2, op_arg, bp, x0p, n_iterations,
                         nv, nh, nb, G, Bv, P):
    """Shared batched driver: r0/delta0 init pass + two-kernel scan."""
    zero2 = jnp.zeros((2, nb), _F)
    one2 = jnp.ones((2, nb), _F)
    zeros_v = jnp.zeros((2, nb, nv, nh), _F)
    zeros_s = jnp.zeros((2, nb, G, 2 * P, nh), _F)

    Sx0 = _boundary_b(x0p, G, Bv, P, nh)
    _, q0, _, _ = k1(op_arg, zero2, one2, x0p, zeros_v, Sx0, zeros_s)
    r0 = bp - q0
    # NOTE on parity vs the sequential loop: the kernels' arithmetic is
    # order-identical per RHS (the per-RHS-step and fat variants return
    # bit-identical histories), but this delta0 reduction fuses with
    # ``bp - q0`` and XLA tiles the 4-D fused reduction differently
    # from the single-RHS 3-D one -- a ~2e-6 seed difference that f32
    # CG on ill-conditioned Helmholtz amplifies to O(10) relative
    # history divergence by ~100 iterations (benchmarks/exp_batchdiv.py;
    # per-slice 2-D sums do NOT fix it -- the fusion context still
    # differs).  Batched vs sequential is therefore gated on SHORT
    # horizons + end-of-solve true residual, not full-history parity.
    delta0 = jnp.stack([
        jnp.sum(r0[0] * r0[0] - r0[1] * r0[1], axis=(1, 2)),
        2.0 * jnp.sum(r0[0] * r0[1], axis=(1, 2))])
    Sr0 = _boundary_b(r0, G, Bv, P, nh)

    def body(carry, _):
        x, r, d, Sr, Sd, delta2, beta2 = carry
        dnew, q, Sdnew, alpha_done = k1(op_arg, beta2, delta2, r, d,
                                        Sr, Sd)
        xn, rn, Srn, beta_new, delta_new, hist1 = k2(
            alpha_done, delta2, x, dnew, r, q)
        return (xn, rn, dnew, Srn, Sdnew, delta_new, beta_new), hist1

    carry0 = (x0p, r0, zeros_v, Sr0, zeros_s, delta0, zero2)
    (x, _, _, _, _, _, _), hist = lax.scan(body, carry0, None,
                                           length=n_iterations)
    h0 = jnp.sqrt(jnp.sqrt(delta0[0] ** 2 + delta0[1] ** 2))
    return x, jnp.concatenate([h0[None], hist[:, 0, :]])


def stream_cg_coef_planes_batched(offsets, grid, coefp, bp, x0p,
                                  n_iterations: int,
                                  block_rows: int = None,
                                  interpret: bool = False):
    """Multi-RHS variable-coefficient streaming CG.

    bp, x0p : (2, nb, Nv, Nh) float32 planes.
    Returns (x (2, nb, Nv, Nh), residual_history (n_iterations+1, nb))
    with per-RHS independent alpha/beta (the reference's block-CG
    semantics, ``clcg.c:317-333``).  The (G, nb) kernel grid fetches the
    coefficient planes once per row block for the whole batch, so
    per-RHS HBM traffic is 10 + 2*noff/nb planes vs the sequential
    loop's 10 + 2*noff.
    """
    nv, nh = grid
    nb = bp.shape[1]
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_coef_planes_batched")
    G = nv // Bv
    k1 = _build_k1_coef_batched(offsets, grid, nb, Bv,
                                interpret=interpret)
    k2 = _make_k2_batched(nv, nh, nb, G, Bv, P, interpret=interpret)
    return _stream_loop_batched(k1, k2, coefp, bp, x0p, n_iterations,
                                nv, nh, nb, G, Bv, P)


def stream_cg_coef_planes_batched_fat(offsets, grid, coefp, bp, x0p,
                                      n_iterations: int,
                                      block_rows: int = None,
                                      interpret: bool = False):
    """Fat-block batched variant: each grid step carries ALL nb RHS, so
    one coefficient fetch per row block is genuinely shared (true block
    amortization: 10 + 2*noff/nb planes per RHS).

    Buffers grow with nb, so Bv shrinks with the batch: the remote
    Mosaic compiler rejects configurations beyond nb*Bv*nh ~ 512*1024
    lane-rows (HTTP 500 at b=8/Bv=64/nh=2048; b=8/Bv=64/nh=1024 and
    b=8/Bv=32/nh=2048 both compile and run -- benchmarks/exp_batchfat.py),
    and measured throughput at the cap is also the best (N=2048: 1.20x
    the sequential loop at b=2, 1.32x at b=4, 1.37x at b=8; the
    remaining gap to the 1.7x traffic-model ceiling is VMEM-pressure
    pipelining, not coefficient re-fetch)."""
    nv, nh = grid
    nb = bp.shape[1]
    P = _pad_for(offsets)
    if block_rows:
        Bv = block_rows
    else:
        Bv = _pick_block_rows(nv)
        while (nb * Bv * nh > 512 * 1024 and Bv // 2 >= max(16, P)
                and Bv % 2 == 0 and nv % (Bv // 2) == 0
                and nv // (Bv // 2) >= 2):
            Bv //= 2
    _check_block_rows(nv, Bv, P, "stream_cg_coef_planes_batched_fat")
    G = nv // Bv
    k1 = _build_k1_coef_batched_fat(offsets, grid, nb, Bv,
                                    interpret=interpret)
    k2 = _make_k2_batched_fat(nv, nh, nb, G, Bv, P, interpret=interpret)
    return _stream_loop_batched(k1, k2, coefp, bp, x0p, n_iterations,
                                nv, nh, nb, G, Bv, P)


def stream_cg_const_planes_batched(offsets, grid, taps, strips2, bp, x0p,
                                   n_iterations: int,
                                   block_rows: int = None,
                                   interpret: bool = False):
    """Multi-RHS constant-tap streaming CG (one device program per
    iteration for the whole batch; same contract as the coef variant
    with ``(taps, strips2)`` from :func:`prepare_stream`)."""
    nv, nh = grid
    nb = bp.shape[1]
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_const_planes_batched")
    G = nv // Bv
    k1 = _build_k1_const_batched(offsets, grid, taps, nb, Bv,
                                 interpret=interpret)
    k2 = _make_k2_batched(nv, nh, nb, G, Bv, P, interpret=interpret)
    return _stream_loop_batched(k1, k2, strips2, bp, x0p, n_iterations,
                                nv, nh, nb, G, Bv, P)


def prepare_stream_coef(stencil, dtype=np.float32):
    """(2, noff, Nv, Nh) coefficient planes for the var-coeff streaming
    path.  Pass the result as a jit ARGUMENT (closure constants of this
    size blow up the remote compile request)."""
    c = np.asarray(stencil.coef)
    return jnp.asarray(np.stack([c.real, c.imag]).astype(dtype))


def _stream_loop(k1, k2, strips_or_coef, bp, x0p, n_iterations,
                 nv, nh, G, Bv, P):
    """Shared driver: r0/delta0 init pass + the two-kernel scan."""
    zero2 = jnp.zeros((2, 1), _F)
    one2 = jnp.ones((2, 1), _F)
    zeros_v = jnp.zeros((2, nv, nh), _F)
    zeros_s = jnp.zeros((2, G, 2 * P, nh), _F)

    # r0 = b - A x0 (one K1 pass: dnew = x0, q = A x0), delta0 = <r0,r0>
    Sx0 = _boundary(x0p, G, Bv, P, nh)
    _, q0, _, _ = k1(strips_or_coef, zero2, one2, x0p, zeros_v, Sx0,
                     zeros_s)
    r0 = bp - q0
    delta0 = jnp.stack([jnp.sum(r0[0] * r0[0] - r0[1] * r0[1]),
                        2.0 * jnp.sum(r0[0] * r0[1])])
    Sr0 = _boundary(r0, G, Bv, P, nh)

    def body(carry, _):
        x, r, d, Sr, Sd, delta2, beta2 = carry
        dnew, q, Sdnew, alpha_done = k1(strips_or_coef, beta2, delta2,
                                        r, d, Sr, Sd)
        xn, rn, Srn, beta_new, delta_new, hist1 = k2(
            alpha_done, delta2, x, dnew, r, q)
        return (xn, rn, dnew, Srn, Sdnew, delta_new, beta_new), hist1

    carry0 = (x0p, r0, zeros_v, Sr0, zeros_s, delta0.reshape(2, 1),
              zero2)
    (x, _, _, _, _, _, _), hist = lax.scan(body, carry0, None,
                                           length=n_iterations)
    h0 = jnp.sqrt(jnp.sqrt(delta0[0] * delta0[0] + delta0[1] * delta0[1]))
    return x, jnp.concatenate([h0[None], hist[:, 0, 0]])


def stream_cg_coef_planes(offsets, grid, coefp, bp, x0p,
                          n_iterations: int, block_rows: int = None,
                          interpret: bool = False):
    """Fixed-iteration single-RHS complex CG with HBM-streamed
    per-node coefficients (variable wave speed / general stencils).

    coefp : (2, noff, Nv, Nh) float32 planes (prepare_stream_coef).
    bp, x0p : (2, Nv, Nh) float32 planes.
    Returns (x_planes (2, Nv, Nh), residual_history (n_iterations+1,)).
    """
    nv, nh = grid
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_coef_planes")
    G = nv // Bv
    k1v = _build_k1_coef(offsets, grid, Bv, interpret=interpret)
    k2 = _make_k2(nv, nh, G, Bv, P, interpret=interpret)
    return _stream_loop(k1v, k2, coefp, bp, x0p, n_iterations,
                        nv, nh, G, Bv, P)


def stream_cg_coef(stencil, b, x0=None, n_iterations: int = 10,
                   block_rows: int = None, interpret: bool = False):
    """Convenience wrapper for :func:`stream_cg_coef_planes`:
    complex (Nv, Nh) grid in / out."""
    nv, nh = stencil.grid
    coefp = prepare_stream_coef(stencil)
    b = np.asarray(b).reshape(nv, nh)
    bp = jnp.asarray(np.stack([b.real, b.imag]).astype(np.float32))
    if x0 is None:
        x0p = jnp.zeros((2, nv, nh), np.float32)
    else:
        x0 = np.asarray(x0).reshape(nv, nh)
        x0p = jnp.asarray(np.stack([x0.real, x0.imag]).astype(np.float32))
    return stream_cg_coef_planes(stencil.offsets, stencil.grid, coefp,
                                 bp, x0p, n_iterations,
                                 block_rows=block_rows,
                                 interpret=interpret)


def stream_cg_const_planes(offsets, grid, taps, strips2, bp, x0p,
                           n_iterations: int, block_rows: int = None,
                           interpret: bool = False):
    """Fixed-iteration single-RHS complex CG, HBM-streaming kernels.

    offsets/grid/taps : static python structure (see prepare_stream).
    strips2 : (sb, st) from prepare_stream -- pass as jit ARGUMENTS.
    bp, x0p : (2, Nv, Nh) float32 planes.
    Returns (x_planes (2, Nv, Nh), residual_history (n_iterations+1,)).
    """
    nv, nh = grid
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_const_planes")
    G = nv // Bv

    k1, k2 = _build_kernels(offsets, grid, taps, Bv, interpret=interpret)
    return _stream_loop(k1, k2, strips2, bp, x0p, n_iterations,
                        nv, nh, G, Bv, P)


def stream_cg_const(stencil, b, x0=None, n_iterations: int = 10,
                    block_rows: int = None, interpret: bool = False):
    """Convenience wrapper: complex (Nv, Nh) grid in / out.

    For use under jit, call :func:`prepare_stream` once and jit
    :func:`stream_cg_const_planes` with strips/planes as arguments.
    """
    nv, nh = stencil.grid
    taps, strips2 = prepare_stream(stencil)
    b = np.asarray(b).reshape(nv, nh)
    bp = jnp.asarray(np.stack([b.real, b.imag]).astype(np.float32))
    if x0 is None:
        x0p = jnp.zeros((2, nv, nh), np.float32)
    else:
        x0 = np.asarray(x0).reshape(nv, nh)
        x0p = jnp.asarray(np.stack([x0.real, x0.imag]).astype(np.float32))
    return stream_cg_const_planes(stencil.offsets, stencil.grid, taps,
                                  strips2, bp, x0p, n_iterations,
                                  block_rows=block_rows,
                                  interpret=interpret)
