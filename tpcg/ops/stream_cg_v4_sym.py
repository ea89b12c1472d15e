"""Symmetric-coefficient VMEM-resident streaming CG.

CG is only defined for symmetric operators, so the variable-coefficient
path's ``noff`` coefficient planes are ~2x redundant:
``plane_{-s}(n) = A[n, n-s] = A[n-s, n] = plane_s(n - s)``.  This
module streams only the independent half -- the centre plane plus one
plane per offset pair -- and applies each pair as

    q(n) += c_s(n) * d(n+s)          (the "down" term)
          + c_s(n-s) * d(n-s)        (the mirrored "up" term)

where ``c_s(n-s)`` reads the SAME streamed plane at row/column-shifted
positions through a small padded VMEM buffer (top-halo rows arrive as
per-block boundary strips, exactly like the state halos).

Combined with the v4 residency scheme (:mod:`tpcg.ops.stream_cg_v4`)
this roughly halves the variable-coefficient HBM traffic:

  * keep_q tier (x/r/d/q resident): (nh+1) f32 planes per iteration
    instead of 2*noff  (helm 9-point: 10 vs 18),
  * recompute tier (x/r/d resident, q rebuilt in phase 1): the halved
    planes stream twice -- 2*(nh+1) = 20/iteration, still fewer bytes
    than v3's 12 state + 18 coefficient planes, with far better
    pipelining.  This is what finally makes N=2048 variable-coefficient
    solves resident-class (keep_q's x/r/d/q cannot fit there).

The pair split changes only the ADD ORDER of the matvec relative to the
per-plane kernels (the reconstructed coefficients are bit-identical,
pinned by tests), so histories drift at the f32 level vs the coef-planes
path; parity is gated against the XLA oracle like every streaming
kernel.  Reference semantics preserved: COCG unconjugated dots
(``kernel/complex/vdot.cl:15``), fixed iteration count (``clcg.c:297``).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_cg import _pad_for
from .stream_cg import (_build_k1_coef, _check_block_rows,
                        _pick_block_rows, _smith_cdiv)
from .stream_cg_v4 import (_CHUNK, _KEEPQ_BYTES, _RESIDENT_BYTES,
                           _v4_loop)

_F = jnp.float32


def prepare_stream_sym(stencil, dtype=np.float32):
    """Host-side prep: (half_offsets, cplanes, cstrips).

    half_offsets : [(0, 0)] + the lexicographically-positive offsets.
    cplanes      : (2, nH+1, Nv, Nh) f32 -- centre plane first.
    cstrips      : (2, nH+1, G?, ...) is built per block size at solve
                   time (cheap jnp reshape), so only planes return here.

    Raises ValueError when the stencil is not symmetric (then the
    general coef path applies), or when some offset lacks its mirror.
    """
    c = np.asarray(stencil.coef)
    offsets = [tuple(o) for o in stencil.offsets]
    nv, nh = stencil.grid
    idx = {o: i for i, o in enumerate(offsets)}
    half = [o for o in offsets if o > (0, 0)]
    if (0, 0) not in idx:
        raise ValueError("stencil has no centre tap")
    for o in offsets:
        if o != (0, 0) and (-o[0], -o[1]) not in idx:
            raise ValueError(f"offset {o} has no mirror; not symmetric")
    # verify A symmetric: plane_{-s}(n) == plane_s(n - s)
    def _shift(ps, dm, dj):
        out = np.zeros_like(ps)
        rs = slice(max(dm, 0), nv + min(dm, 0))
        cs = slice(max(dj, 0), nh + min(dj, 0))
        rs0 = slice(max(-dm, 0), nv + min(-dm, 0))
        cs0 = slice(max(-dj, 0), nh + min(-dj, 0))
        out[rs, cs] = ps[rs0, cs0]
        return out

    for (dm, dj) in half:
        ps = c[idx[(dm, dj)]]
        pm = c[idx[(-dm, -dj)]]
        if not np.allclose(pm, _shift(ps, dm, dj), rtol=1e-12,
                           atol=1e-13):
            raise ValueError(
                f"coefficients not symmetric across offset {(dm, dj)}")
    planes = np.stack([c[idx[(0, 0)]]]
                      + [c[idx[o]] for o in half])   # (nH+1, Nv, Nh)
    cplanes = jnp.asarray(np.stack([planes.real, planes.imag])
                          .astype(dtype))
    return [(0, 0)] + half, cplanes


def _coef_boundary(cplanes, G, Bv, P, nh):
    """(2, nH1, nv, nh) -> (2, nH1, G, P, nh): each block's LAST P rows
    (the next block's top halo)."""
    two, nH1 = cplanes.shape[0], cplanes.shape[1]
    v = cplanes.reshape(two, nH1, G, Bv, nh)
    return v[:, :, :, Bv - P:, :]


def _build_resident_sym(half_offsets, grid, Bv, K, keep_q, interpret,
                        q_hbm=False):
    """K-iteration resident kernel, symmetric coefficient streaming.

    step(op_arg=(cplanes, cstrips), beta2, delta2, x, r, d, Sr, Sd) ->
        (xn, rn, dn, beta', delta', hist (K,1))
    q_hbm (only with keep_q=False): round-trip q through an HBM buffer
    with explicit DMA instead of recomputing it in phase 1 -- which
    also removes the phase-1 coefficient re-fetch (per-iteration
    traffic drops from 2*(nH+1) coefficient planes to (nH+1) + 4 q
    planes).  See stream_cg_v4._build_resident.
    """
    nv, nh = grid
    offsets_all = (half_offsets
                   + [(-dm, -dj) for (dm, dj) in half_offsets[1:]])
    P = _pad_for(offsets_all)
    assert nv % Bv == 0, (nv, Bv)
    G = nv // Bv
    nH1 = len(half_offsets)
    assert not (keep_q and q_hbm)

    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)
    # coefficient blocks: fetched in phase 0 always; in phase 1 too
    # only when q is recomputed there (neither keep_q nor q_hbm)
    if keep_q or q_hbm:
        cmap = lambda it, ph, j: (0, 0, jnp.where(ph == 0, j, G - 1), 0)
        smap = lambda it, ph, j: (0, 0,
                                  jnp.where(ph == 0,
                                            jnp.maximum(j - 1, 0), 0),
                                  0, 0)
    else:
        cmap = lambda it, ph, j: (0, 0, j, 0)
        smap = lambda it, ph, j: (0, 0, jnp.maximum(j - 1, 0), 0, 0)
    c_in = pl.BlockSpec((2, nH1, Bv, nh), cmap)
    cs_in = pl.BlockSpec((2, nH1, 1, P, nh), smap)
    r_in = pl.BlockSpec((2, Bv, nh),
                        lambda it, ph, j:
                        (0, jnp.where((it == 0) & (ph == 0), j, G - 1),
                         0))
    d_in = pl.BlockSpec((2, Bv, nh),
                        lambda it, ph, j:
                        (0, jnp.where((it == 0) & (ph == 0), j, G - 1),
                         0))
    x_in = pl.BlockSpec((2, Bv, nh),
                        lambda it, ph, j:
                        (0, jnp.where((it == 0) & (ph == 1), j,
                                      jnp.where(it == 0, 0, G - 1)), 0))
    s_p1 = pl.BlockSpec((2, 1, 2 * P, nh),
                        lambda it, ph, j:
                        (0, jnp.where((it == 0) & (ph == 0),
                                      jnp.minimum(j + 1, G - 1), G - 1),
                         0, 0))
    x_out = pl.BlockSpec((2, Bv, nh),
                         lambda it, ph, j:
                         (0, jnp.where((it == K - 1) & (ph == 1), j, 0),
                          0))
    r_out = pl.BlockSpec((2, Bv, nh),
                         lambda it, ph, j:
                         (0, jnp.where((it == K - 1) & (ph == 1), j, 0),
                          0))
    d_out = pl.BlockSpec((2, Bv, nh),
                         lambda it, ph, j:
                         (0, jnp.where((it == K - 1) & (ph == 0), j,
                                       G - 1), 0))

    def smem_out(shape):
        return pl.BlockSpec(shape, lambda it, ph, j: (0, 0),
                            memory_space=pltpu.SMEM)

    def kernel(*refs):
        (beta0_ref, delta0_ref, c_ref, cs_ref, x_ref, r_ref,
         d_ref, sr_ref, sd_ref) = refs[0:9]
        nout = 7 if q_hbm else 6
        outs = refs[9:9 + nout]
        scr = refs[9 + nout:]
        if q_hbm:
            (xn_ref, rn_ref, dn_ref, betan_ref, deltan_ref, hist_ref,
             qo_ref) = outs
            (x_scr, r_scr, d_scr, q_scr, dpr, dpi, cpr, cpi,
             al, dqa, dda, bd, qb, sems) = scr
        else:
            (xn_ref, rn_ref, dn_ref, betan_ref, deltan_ref,
             hist_ref) = outs
            (x_scr, r_scr, d_scr, q_scr, dpr, dpi, cpr, cpi,
             al, dqa, dda, bd) = scr
            qo_ref = qb = sems = None
        it = pl.program_id(0)
        ph = pl.program_id(1)
        j = pl.program_id(2)

        def q_out_dma(blk):
            return pltpu.make_async_copy(
                q_scr, qo_ref.at[:, pl.ds(blk * Bv, Bv), :],
                sems.at[2])

        def q_in_dma(blk, slot):
            return pltpu.make_async_copy(
                qo_ref.at[:, pl.ds(blk * Bv, Bv), :], qb.at[slot],
                sems.at[slot])

        def qrows():
            return pl.ds(j * Bv, Bv) if keep_q else slice(0, Bv)

        def load_cpad():
            """Stage this block's coefficient planes (+ top halo rows
            from the neighbour strips) into the padded scratch."""
            for t in range(nH1):
                cpr[t, 0:P, P:P + nh] = jnp.where(
                    j > 0, cs_ref[0, t, 0], 0.0)
                cpi[t, 0:P, P:P + nh] = jnp.where(
                    j > 0, cs_ref[1, t, 0], 0.0)
                cpr[t, P:P + Bv, P:P + nh] = c_ref[0, t]
                cpi[t, P:P + Bv, P:P + nh] = c_ref[1, t]

        def emit_q():
            """q = A d from the padded d and HALF coefficient planes:
            centre + (down term + mirrored up term) per pair."""
            qr = jnp.zeros((Bv, nh), _F)
            qi = jnp.zeros((Bv, nh), _F)
            for t, (dm, dj) in enumerate(half_offsets):
                car = cpr[t, P:P + Bv, P:P + nh]
                cai = cpi[t, P:P + Bv, P:P + nh]
                xr_ = dpr[P + dm:P + dm + Bv, P + dj:P + dj + nh]
                xi_ = dpi[P + dm:P + dm + Bv, P + dj:P + dj + nh]
                qr = qr + car * xr_ - cai * xi_
                qi = qi + car * xi_ + cai * xr_
                if (dm, dj) != (0, 0):
                    # mirrored term: c_s(n-s) * d(n-s)
                    cbr = cpr[t, P - dm:P - dm + Bv,
                              P - dj:P - dj + nh]
                    cbi = cpi[t, P - dm:P - dm + Bv,
                              P - dj:P - dj + nh]
                    yr_ = dpr[P - dm:P - dm + Bv, P - dj:P - dj + nh]
                    yi_ = dpi[P - dm:P - dm + Bv, P - dj:P - dj + nh]
                    qr = qr + cbr * yr_ - cbi * yi_
                    qi = qi + cbr * yi_ + cbi * yr_
            q_scr[0, qrows(), :] = qr
            q_scr[1, qrows(), :] = qi
            return qr, qi

        @pl.when((it == 0) & (ph == 0) & (j == 0))
        def _():
            bd[0, 0] = beta0_ref[0, 0]
            bd[1, 0] = beta0_ref[1, 0]
            bd[2, 0] = delta0_ref[0, 0]
            bd[3, 0] = delta0_ref[1, 0]
            dpr[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)
            dpi[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)
            cpr[...] = jnp.zeros((nH1, Bv + 2 * P, nh + 2 * P), _F)
            cpi[...] = jnp.zeros((nH1, Bv + 2 * P, nh + 2 * P), _F)

        @pl.when(ph == 0)
        def _():
            @pl.when(j == 0)
            def _():
                dqa[0, 0] = 0.0
                dqa[1, 0] = 0.0

            @pl.when(it == 0)
            def _():
                r_scr[0, pl.ds(j * Bv, Bv), :] = r_ref[0]
                r_scr[1, pl.ds(j * Bv, Bv), :] = r_ref[1]
                d_scr[0, pl.ds(j * Bv, Bv), :] = d_ref[0]
                d_scr[1, pl.ds(j * Bv, Bv), :] = d_ref[1]

            br = bd[0, 0]
            bi = bd[1, 0]
            rr_ = r_scr[0, pl.ds(j * Bv, Bv), :]
            ri_ = r_scr[1, pl.ds(j * Bv, Bv), :]
            dr_ = d_scr[0, pl.ds(j * Bv, Bv), :]
            di_ = d_scr[1, pl.ds(j * Bv, Bv), :]
            dnr = rr_ + br * dr_ - bi * di_
            dni = ri_ + br * di_ + bi * dr_
            to = jnp.maximum(j * Bv - P, 0)
            dpr[0:P, P:P + nh] = jnp.where(
                j > 0, d_scr[0, pl.ds(to, P), :], 0.0)
            dpi[0:P, P:P + nh] = jnp.where(
                j > 0, d_scr[1, pl.ds(to, P), :], 0.0)
            dpr[P:P + Bv, P:P + nh] = dnr
            dpi[P:P + Bv, P:P + nh] = dni
            bo = jnp.minimum((j + 1) * Bv, nv - P)

            @pl.when(it == 0)
            def _():
                bhr = (sr_ref[0, 0, 0:P, :]
                       + br * sd_ref[0, 0, 0:P, :]
                       - bi * sd_ref[1, 0, 0:P, :])
                bhi = (sr_ref[1, 0, 0:P, :]
                       + br * sd_ref[1, 0, 0:P, :]
                       + bi * sd_ref[0, 0, 0:P, :])
                dpr[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                    j < G - 1, bhr, 0.0)
                dpi[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                    j < G - 1, bhi, 0.0)

            @pl.when(it > 0)
            def _():
                rr2 = r_scr[0, pl.ds(bo, P), :]
                ri2 = r_scr[1, pl.ds(bo, P), :]
                dr2 = d_scr[0, pl.ds(bo, P), :]
                di2 = d_scr[1, pl.ds(bo, P), :]
                bhr = rr2 + br * dr2 - bi * di2
                bhi = ri2 + br * di2 + bi * dr2
                dpr[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                    j < G - 1, bhr, 0.0)
                dpi[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                    j < G - 1, bhi, 0.0)

            d_scr[0, pl.ds(j * Bv, Bv), :] = dnr
            d_scr[1, pl.ds(j * Bv, Bv), :] = dni

            @pl.when(it == K - 1)
            def _():
                dn_ref[0] = dnr
                dn_ref[1] = dni

            if q_hbm:
                @pl.when(j > 0)
                def _():
                    q_out_dma(j - 1).wait()

            load_cpad()
            qfr, qfi = emit_q()
            if q_hbm:
                q_out_dma(j).start()
            dqa[0, 0] += jnp.sum(dnr * qfr - dni * qfi)
            dqa[1, 0] += jnp.sum(dnr * qfi + dni * qfr)

            @pl.when(j == G - 1)
            def _():
                dqr = dqa[0, 0]
                dqi = dqa[1, 0]
                der = bd[2, 0]
                dei = bd[3, 0]
                done = (((der == 0.0) & (dei == 0.0))
                        | ((dqr == 0.0) & (dqi == 0.0)))
                sdr = jnp.where(done, 1.0, dqr)
                sdi = jnp.where(done, 1.0, dqi)
                ar_, ai_ = _smith_cdiv(der, dei, sdr, sdi)
                al[0, 0] = jnp.where(done, 0.0, ar_)
                al[1, 0] = jnp.where(done, 0.0, ai_)
                al[2, 0] = jnp.where(done, 1.0, 0.0)

        @pl.when(ph == 1)
        def _():
            @pl.when(j == 0)
            def _():
                dda[0, 0] = 0.0
                dda[1, 0] = 0.0

            ar_ = al[0, 0]
            ai_ = al[1, 0]
            dnr = d_scr[0, pl.ds(j * Bv, Bv), :]
            dni = d_scr[1, pl.ds(j * Bv, Bv), :]
            if keep_q:
                qr = q_scr[0, pl.ds(j * Bv, Bv), :]
                qi = q_scr[1, pl.ds(j * Bv, Bv), :]
            elif q_hbm:
                slot = j % 2

                @pl.when(j == 0)
                def _():
                    q_out_dma(G - 1).wait()
                    q_in_dma(0, 0).start()

                @pl.when(j + 1 < G)
                def _():
                    q_in_dma(j + 1, (j + 1) % 2).start()

                q_in_dma(j, slot).wait()
                qr = qb[slot, 0]
                qi = qb[slot, 1]
            else:
                to = jnp.maximum(j * Bv - P, 0)
                bo = jnp.minimum((j + 1) * Bv, nv - P)
                dpr[0:P, P:P + nh] = jnp.where(
                    j > 0, d_scr[0, pl.ds(to, P), :], 0.0)
                dpi[0:P, P:P + nh] = jnp.where(
                    j > 0, d_scr[1, pl.ds(to, P), :], 0.0)
                dpr[P:P + Bv, P:P + nh] = dnr
                dpi[P:P + Bv, P:P + nh] = dni
                dpr[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                    j < G - 1, d_scr[0, pl.ds(bo, P), :], 0.0)
                dpi[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                    j < G - 1, d_scr[1, pl.ds(bo, P), :], 0.0)
                load_cpad()
                emit_q()
                qr = q_scr[0, 0:Bv, :]
                qi = q_scr[1, 0:Bv, :]

            @pl.when(it == 0)
            def _():
                x_scr[0, pl.ds(j * Bv, Bv), :] = x_ref[0]
                x_scr[1, pl.ds(j * Bv, Bv), :] = x_ref[1]

            xr = x_scr[0, pl.ds(j * Bv, Bv), :]
            xi = x_scr[1, pl.ds(j * Bv, Bv), :]
            nxr = xr + ar_ * dnr - ai_ * dni
            nxi = xi + ar_ * dni + ai_ * dnr
            x_scr[0, pl.ds(j * Bv, Bv), :] = nxr
            x_scr[1, pl.ds(j * Bv, Bv), :] = nxi
            rr_ = r_scr[0, pl.ds(j * Bv, Bv), :]
            ri_ = r_scr[1, pl.ds(j * Bv, Bv), :]
            nrr = rr_ - (ar_ * qr - ai_ * qi)
            nri = ri_ - (ar_ * qi + ai_ * qr)
            r_scr[0, pl.ds(j * Bv, Bv), :] = nrr
            r_scr[1, pl.ds(j * Bv, Bv), :] = nri
            dda[0, 0] += jnp.sum(nrr * nrr - nri * nri)
            dda[1, 0] += 2.0 * jnp.sum(nrr * nri)

            @pl.when(it == K - 1)
            def _():
                xn_ref[0] = nxr
                xn_ref[1] = nxi
                rn_ref[0] = nrr
                rn_ref[1] = nri

            @pl.when(j == G - 1)
            def _():
                dnr_ = dda[0, 0]
                dni_ = dda[1, 0]
                done = al[2, 0] > 0.5
                der = bd[2, 0]
                dei = bd[3, 0]
                sdr = jnp.where(done, 1.0, der)
                sdi = jnp.where(done, 1.0, dei)
                br_, bi_ = _smith_cdiv(dnr_, dni_, sdr, sdi)
                bd[0, 0] = jnp.where(done, 0.0, br_)
                bd[1, 0] = jnp.where(done, 0.0, bi_)
                bd[2, 0] = dnr_
                bd[3, 0] = dni_
                hist_ref[it, 0] = jnp.sqrt(jnp.sqrt(dnr_ * dnr_
                                                    + dni_ * dni_))

                @pl.when(it == K - 1)
                def _():
                    betan_ref[0, 0] = bd[0, 0]
                    betan_ref[1, 0] = bd[1, 0]
                    deltan_ref[0, 0] = dnr_
                    deltan_ref[1, 0] = dni_

    scratch = [pltpu.VMEM((2, nv, nh), _F),                   # x
               pltpu.VMEM((2, nv, nh), _F),                   # r
               pltpu.VMEM((2, nv, nh), _F),                   # d(new)
               pltpu.VMEM((2, nv if keep_q else Bv, nh), _F),  # q
               pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),      # dpr
               pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),      # dpi
               pltpu.VMEM((nH1, Bv + 2 * P, nh + 2 * P), _F),  # cpr
               pltpu.VMEM((nH1, Bv + 2 * P, nh + 2 * P), _F),  # cpi
               pltpu.SMEM((3, 1), _F),                        # alpha+done
               pltpu.SMEM((2, 1), _F),                        # <d,q> acc
               pltpu.SMEM((2, 1), _F),                        # <r,r> acc
               pltpu.SMEM((4, 1), _F)]                        # beta,delta

    out_specs = [x_out, r_out, d_out, smem_out((2, 1)),
                 smem_out((2, 1)), smem_out((K, 1))]
    out_shape = [jax.ShapeDtypeStruct((2, nv, nh), _F),
                 jax.ShapeDtypeStruct((2, nv, nh), _F),
                 jax.ShapeDtypeStruct((2, nv, nh), _F),
                 jax.ShapeDtypeStruct((2, 1), _F),
                 jax.ShapeDtypeStruct((2, 1), _F),
                 jax.ShapeDtypeStruct((K, 1), _F)]
    if q_hbm:
        scratch = scratch + [pltpu.VMEM((2, 2, Bv, nh), _F),
                             pltpu.SemaphoreType.DMA((3,))]
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct((2, nv, nh), _F))

    def step(op_arg, beta2, delta2, x, r, d, Sr, Sd):
        cplanes, cstrips = op_arg
        ret = pl.pallas_call(
            kernel,
            grid=(K, 2, G),
            in_specs=[smem_in, smem_in, c_in, cs_in,
                      x_in, r_in, d_in, s_p1, s_p1],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=interpret,
        )(beta2, delta2, cplanes, cstrips, x, r, d, Sr, Sd)
        return ret[:6] if q_hbm else ret

    return step


def stream_cg_v4_sym_planes(offsets, grid, half_offsets, cplanes, bp,
                            x0p, n_iterations: int,
                            block_rows: int = None, keep_q: bool = None,
                            q_hbm: bool = False, chunk: int = _CHUNK,
                            interpret: bool = False):
    """Symmetric-coefficient resident streaming CG (single RHS).

    half_offsets, cplanes : from :func:`prepare_stream_sym`.
    Same returns as ``stream_cg_coef_planes``.  ``q_hbm`` (keep_q=False
    only) replaces the phase-1 recompute (and its coefficient re-fetch)
    with an explicit-DMA HBM round-trip of q.
    """
    nv, nh = grid
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_v4_sym_planes")
    G = nv // Bv
    if keep_q is None:
        keep_q = 8 * nv * nh * 4 <= _KEEPQ_BYTES
    if keep_q:
        q_hbm = False
    if not keep_q and 6 * nv * nh * 4 > _RESIDENT_BYTES:
        raise ValueError(
            f"grid {grid} exceeds the v4 resident VMEM budget; use the "
            "v3/v2 coef streaming kernels")
    # the r0/delta0 init pass reuses the general coef K1 (exact coef
    # planes reconstructed host-side would change nothing: the planes
    # ARE the coefficients)
    init_k1 = _build_k1_coef(offsets, grid, Bv, interpret=interpret)
    cstrips = _coef_boundary(cplanes, G, Bv, P, nh)
    steps = {}

    def get_step(K):
        if K not in steps:
            steps[K] = _build_resident_sym(half_offsets, grid, Bv, K,
                                           keep_q, interpret,
                                           q_hbm=q_hbm)
        return steps[K]

    # init needs the full coefficient planes once; reconstruct them from
    # the half planes (bit-identical to the originals, see tests)
    coefp_full = reconstruct_coef(offsets, half_offsets, cplanes, grid)
    return _v4_loop(get_step, init_k1, coefp_full, (cplanes, cstrips),
                    bp, x0p, n_iterations, nv, nh, G, Bv, P, chunk)


def reconstruct_coef(offsets, half_offsets, cplanes, grid):
    """(2, nH+1, Nv, Nh) half planes -> (2, noff, Nv, Nh) full planes
    in the ``offsets`` order (host/XLA, used for the init pass and by
    the reconstruction-parity test)."""
    nv, nh = grid
    half_idx = {tuple(o): i for i, o in enumerate(half_offsets)}
    planes = []
    for (dm, dj) in [tuple(o) for o in offsets]:
        if (dm, dj) in half_idx:
            planes.append(cplanes[:, half_idx[(dm, dj)]])
        else:
            src = cplanes[:, half_idx[(-dm, -dj)]]   # plane_s
            # plane_{-s}(n) = plane_s(n - s) with zero fill
            sm, sj = -dm, -dj
            shifted = jnp.zeros_like(src)
            rs = slice(max(sm, 0), nv + min(sm, 0))
            cs = slice(max(sj, 0), nh + min(sj, 0))
            rs0 = slice(max(-sm, 0), nv + min(-sm, 0))
            cs0 = slice(max(-sj, 0), nh + min(-sj, 0))
            shifted = shifted.at[:, rs, cs].set(src[:, rs0, cs0])
            planes.append(shifted)
    return jnp.stack(planes, axis=1)


def stream_cg_v4_sym(stencil, b, x0=None, n_iterations: int = 10,
                     block_rows: int = None, keep_q: bool = None,
                     chunk: int = _CHUNK, interpret: bool = False):
    """Convenience wrapper: complex (Nv, Nh) grid in / out."""
    nv, nh = stencil.grid
    half_offsets, cplanes = prepare_stream_sym(stencil)
    b = np.asarray(b).reshape(nv, nh)
    bp = jnp.asarray(np.stack([b.real, b.imag]).astype(np.float32))
    if x0 is None:
        x0p = jnp.zeros((2, nv, nh), np.float32)
    else:
        x0 = np.asarray(x0).reshape(nv, nh)
        x0p = jnp.asarray(np.stack([x0.real, x0.imag]).astype(np.float32))
    return stream_cg_v4_sym_planes(stencil.offsets, stencil.grid,
                                   half_offsets, cplanes, bp, x0p,
                                   n_iterations, block_rows=block_rows,
                                   keep_q=keep_q, chunk=chunk,
                                   interpret=interpret)
