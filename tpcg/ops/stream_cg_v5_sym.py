"""Variable-coefficient panel-round-trip streaming CG (v5-sym).

The missing large-N tier for VARIABLE-coefficient symmetric operators:
``stream_cg_v4_sym`` keeps the whole CG state resident in VMEM, which
caps it at ~2048^2 complex; beyond that the planner used to fall to the
v3/v2 coefficient pipelines (~400-585 GFLOPS) while CONSTANT-tap grids
of the same size got 853-945 GFLOPS from the v5 state-panel DMA tier.
This module closes that gap by composing the two proven mechanisms:

  * the CG state (x/r/d) lives in HBM and round-trips as row PANELS
    with explicit double-buffered async DMA -- byte-for-byte the
    machinery of :mod:`tpcg.ops.stream_cg_v5` (``d_resident`` tier A
    keeps the direction field in VMEM scratch; tier B round-trips it
    too),
  * the coefficients stream as the HALF planes of
    :mod:`tpcg.ops.stream_cg_v4_sym` (CG's symmetry contract:
    ``plane_{-s}(n) = plane_s(n-s)``, so only the centre plane plus one
    plane per offset pair is fetched; each pair applies as a down term
    ``c_s(n)*d(n+s)`` plus a mirrored up term ``c_s(n-s)*d(n-s)`` read
    through a small padded VMEM buffer).  The coefficient blocks ride
    the normal Pallas grid pipeline (BlockSpec index maps over the
    ``(K, 2, G)`` iteration/phase/row-block grid) -- they need no
    explicit DMA because they are read-only streams.

Two q-handling modes, exactly as in v5:
  * recompute (default): phase 1 re-applies the operator to the updated
    direction values -- bit-identical q by construction, but the
    coefficient planes stream TWICE per iteration,
  * ``qx=True`` (production): q round-trips HBM with explicit DMA and
    the x update defers into the next iteration's phase-0 sweep (the
    same fp ops one sweep later), so phase 1 is a lean r-update sweep
    and the coefficients stream ONCE per iteration.

Per-iteration HBM plane traffic (complex, nH1 = #half planes):
tier A qx: 10 state + 4 q + 2*nH1 coefficient (helm 9-point: 24);
tier B qx: 16 state + 4 q + 2*nH1 (30).  The v4-sym kernel at its
largest size moves 2*(nH1)+... but cannot exist here at all -- this
tier's competitor is v3-coef at 12 state + 2*noff = 30 planes with far
worse pipelining.

Reference semantics preserved: COCG unconjugated dots
(``kernel/complex/vdot.cl:15``), fixed iteration count (``clcg.c:297``),
per-iteration residual history (``cl.py:120``).  The reference's
variable-wave-speed operator class is ``helm_fe_var``
(``p_h-PY_C-CL-multi-GPU.py:616-1330``, ``helmFE_var.py:9-331``).
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
from .stream_cg_v4 import _CHUNK, _v4_loop
from .stream_cg_v4_sym import _coef_boundary, reconstruct_coef
from .stream_cg_v5 import (_N_SEMS, _S_D0, _S_DN1, _S_DNO, _S_DNS, _S_DS,
                           _S_Q1, _S_QO, _S_R0, _S_R1, _S_RO, _S_RS,
                           _S_X1, _S_XO, _V5_DRES_BYTES)

_F = jnp.float32


def _build_v5_sym(half_offsets, offsets_all, grid, Bv, K, d_resident,
                  interpret, qx=False):
    """K-iteration panel-round-trip kernel, symmetric coefficient
    streaming.  Same step contract as ``stream_cg_v5._build_v5``:

    step((cplanes, cstrips), beta2, delta2, x, r, d, Sr, Sd) ->
        (xn, rn, dn, beta' (2,1), delta' (2,1), hist (K,1))
    (Sr/Sd accepted for ``_v4_loop`` compatibility and ignored -- entry
    halos arrive by DMA from the ANY-space x/r/d operands directly.)
    """
    nv, nh = grid
    P = _pad_for(offsets_all)
    assert nv % Bv == 0 and Bv >= 8, (nv, Bv)
    assert P <= 8, P
    assert interpret or nh % 128 == 0, \
        (nh, "v5-sym DMA panels need 128-aligned lanes on hardware")
    G = nv // Bv
    assert G >= 2, (nv, Bv)
    nH1 = len(half_offsets)

    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    # coefficient blocks ride the normal grid pipeline.  qx fetches them
    # in phase 0 only (the index freezes at G-1 through phase 1, so the
    # pipeline re-fetches nothing); recompute mode fetches both phases.
    if qx:
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
    if d_resident:
        d_out = pl.BlockSpec((2, Bv, nh),
                             lambda it, ph, j:
                             (0, jnp.where((it == K - 1) & (ph == 0), j,
                                           G - 1), 0))
    else:
        d_out = any_spec

    def smem_out(shape):
        return pl.BlockSpec(shape, lambda it, ph, j: (0, 0),
                            memory_space=pltpu.SMEM)

    def kernel(*refs):
        (beta0_ref, delta0_ref, c_ref, cs_ref, x_hbm, r_hbm,
         d_hbm) = refs[0:7]
        nout = 8 if qx else 6
        (xn_ref, rn_ref, dn_ref, betan_ref, deltan_ref,
         hist_ref) = refs[7:13]
        alphan_ref = refs[13] if qx else None
        qo_ref = refs[14] if qx else None
        scr = refs[7 + nout:]
        qb = dnb = dnsb = carry1 = None
        if d_resident:
            if qx:
                (d_scr, q_scr, dpr, dpi, cpr, cpi, al, dqa, dda, bd,
                 rb, rsb, xb, rb1, xo, ro, qb, sems) = scr
            else:
                (d_scr, q_scr, dpr, dpi, cpr, cpi, al, dqa, dda, bd,
                 rb, rsb, xb, rb1, xo, ro, sems) = scr
            db = dsb = dno = carry0 = None
        else:
            if qx:
                (q_scr, dpr, dpi, cpr, cpi, al, dqa, dda, bd, rb, rsb,
                 xb, rb1, xo, ro, db, dsb, dno, carry0, qb, sems) = scr
            else:
                (q_scr, dpr, dpi, cpr, cpi, al, dqa, dda, bd, rb, rsb,
                 xb, rb1, xo, ro, db, dsb, dno, carry0, dnb, dnsb,
                 carry1, sems) = scr
            d_scr = None

        it = pl.program_id(0)
        ph = pl.program_id(1)
        j = pl.program_id(2)

        # ---- DMA descriptor helpers (v5's, verbatim) -------------------
        def panel(ref, blk):
            return ref.at[:, pl.ds(blk * Bv, Bv), :]

        def strip_off(blk):
            if Bv % 8 == 0 and nv % 8 == 0:
                return 8 * jnp.minimum((blk + 1) * (Bv // 8),
                                       nv // 8 - 1)
            assert interpret, (Bv, nv)
            return jnp.minimum((blk + 1) * Bv, nv - 8)

        def strip(ref, blk):
            return ref.at[:, pl.ds(strip_off(blk), 8), :]

        def r0_in(blk, slot, src):
            return pltpu.make_async_copy(panel(src, blk), rb.at[slot],
                                         sems.at[_S_R0 + slot])

        def rs_in(blk, slot, src):
            return pltpu.make_async_copy(strip(src, blk), rsb.at[slot],
                                         sems.at[_S_RS + slot])

        def x1_in(blk, slot, src):
            return pltpu.make_async_copy(panel(src, blk), xb.at[slot],
                                         sems.at[_S_X1 + slot])

        def r1_in(blk, slot, src):
            return pltpu.make_async_copy(panel(src, blk), rb1.at[slot],
                                         sems.at[_S_R1 + slot])

        def xo_out(blk):
            return pltpu.make_async_copy(xo, panel(xn_ref, blk),
                                         sems.at[_S_XO])

        def ro_out(blk):
            return pltpu.make_async_copy(ro, panel(rn_ref, blk),
                                         sems.at[_S_RO])

        if d_resident:
            def dload(blk, slot):
                return pltpu.make_async_copy(
                    panel(d_hbm, blk),
                    d_scr.at[:, pl.ds(blk * Bv, Bv), :],
                    sems.at[_S_D0 + slot])

            def dload_s(blk, slot):
                return pltpu.make_async_copy(
                    strip(d_hbm, blk),
                    d_scr.at[:, pl.ds(strip_off(blk), 8), :],
                    sems.at[_S_DS + slot])
        else:
            def d0_in(blk, slot, src):
                return pltpu.make_async_copy(panel(src, blk),
                                             db.at[slot],
                                             sems.at[_S_D0 + slot])

            def ds_in(blk, slot, src):
                return pltpu.make_async_copy(strip(src, blk),
                                             dsb.at[slot],
                                             sems.at[_S_DS + slot])

            def dn_out(blk):
                return pltpu.make_async_copy(dno, panel(dn_ref, blk),
                                             sems.at[_S_DNO])

            def dn1_in(blk, slot):
                return pltpu.make_async_copy(panel(dn_ref, blk),
                                             dnb.at[slot],
                                             sems.at[_S_DN1 + slot])

            def dns_in(blk, slot):
                return pltpu.make_async_copy(strip(dn_ref, blk),
                                             dnsb.at[slot],
                                             sems.at[_S_DNS + slot])

        if qx:
            def q_out(blk):
                return pltpu.make_async_copy(q_scr, panel(qo_ref, blk),
                                             sems.at[_S_QO])

            def q1_in(blk, slot):
                return pltpu.make_async_copy(panel(qo_ref, blk),
                                             qb.at[slot],
                                             sems.at[_S_Q1 + slot])

        # ---- symmetric coefficient application (v4-sym's, verbatim) ----
        def load_cpad():
            """Stage this block's half coefficient planes (+ top halo
            rows from the neighbour strips) into the padded scratch."""
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
                    cbr = cpr[t, P - dm:P - dm + Bv,
                              P - dj:P - dj + nh]
                    cbi = cpi[t, P - dm:P - dm + Bv,
                              P - dj:P - dj + nh]
                    yr_ = dpr[P - dm:P - dm + Bv, P - dj:P - dj + nh]
                    yi_ = dpi[P - dm:P - dm + Bv, P - dj:P - dj + nh]
                    qr = qr + cbr * yr_ - cbi * yi_
                    qi = qi + cbr * yi_ + cbi * yr_
            q_scr[0, 0:Bv, :] = qr
            q_scr[1, 0:Bv, :] = qi

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
            if qx:
                al[0, 0] = 0.0
                al[1, 0] = 0.0
                al[2, 0] = 0.0

        # ================= phase 0: direction + matvec + <d,q> ==========
        @pl.when(ph == 0)
        def _():
            slot = j % 2

            def start_in(blk, s):
                @pl.when(it == 0)
                def _():
                    r0_in(blk, s, r_hbm).start()
                    rs_in(blk, s, r_hbm).start()
                    if qx:
                        x1_in(blk, s, x_hbm).start()
                    if d_resident:
                        dload(blk, s).start()
                        dload_s(blk, s).start()
                    else:
                        d0_in(blk, s, d_hbm).start()
                        ds_in(blk, s, d_hbm).start()

                @pl.when(it > 0)
                def _():
                    r0_in(blk, s, rn_ref).start()
                    rs_in(blk, s, rn_ref).start()
                    if qx:
                        x1_in(blk, s, xn_ref).start()
                    if not d_resident:
                        d0_in(blk, s, dn_ref).start()
                        ds_in(blk, s, dn_ref).start()

            @pl.when(j == 0)
            def _():
                dqa[0, 0] = 0.0
                dqa[1, 0] = 0.0

                @pl.when(it > 0)
                def _():
                    ro_out(G - 1).wait()
                    if qx:
                        xo_out(G - 1).wait()
                        if not d_resident:
                            dn_out(G - 1).wait()
                start_in(0, 0)

            @pl.when(j + 1 < G)
            def _():
                start_in(j + 1, (j + 1) % 2)

            r0_in(j, slot, r_hbm).wait()
            rs_in(j, slot, r_hbm).wait()
            if qx:
                x1_in(j, slot, x_hbm).wait()
            if d_resident:
                @pl.when(it == 0)
                def _():
                    dload(j, slot).wait()
                    dload_s(j, slot).wait()
            else:
                d0_in(j, slot, d_hbm).wait()
                ds_in(j, slot, d_hbm).wait()

            br = bd[0, 0]
            bi = bd[1, 0]
            rr_ = rb[slot, 0]
            ri_ = rb[slot, 1]
            if d_resident:
                dr_ = d_scr[0, pl.ds(j * Bv, Bv), :]
                di_ = d_scr[1, pl.ds(j * Bv, Bv), :]
            else:
                dr_ = db[slot, 0]
                di_ = db[slot, 1]
            if qx:
                # deferred x update with the PREVIOUS iteration's alpha
                ar_p = al[0, 0]
                ai_p = al[1, 0]
                nxr = xb[slot, 0] + ar_p * dr_ - ai_p * di_
                nxi = xb[slot, 1] + ar_p * di_ + ai_p * dr_

                @pl.when(j > 0)
                def _():
                    xo_out(j - 1).wait()
                xo[0] = nxr
                xo[1] = nxi
                xo_out(j).start()
            dnr = rr_ + br * dr_ - bi * di_
            dni = ri_ + br * di_ + bi * dr_
            if d_resident:
                to = jnp.maximum(j * Bv - P, 0)
                dpr[0:P, P:P + nh] = jnp.where(
                    j > 0, d_scr[0, pl.ds(to, P), :], 0.0)
                dpi[0:P, P:P + nh] = jnp.where(
                    j > 0, d_scr[1, pl.ds(to, P), :], 0.0)
            else:
                dpr[0:P, P:P + nh] = jnp.where(
                    j > 0, carry0[0, 8 - P:8, :], 0.0)
                dpi[0:P, P:P + nh] = jnp.where(
                    j > 0, carry0[1, 8 - P:8, :], 0.0)
            dpr[P:P + Bv, P:P + nh] = dnr
            dpi[P:P + Bv, P:P + nh] = dni
            if d_resident:
                bo = jnp.minimum((j + 1) * Bv, nv - P)
                dr2 = d_scr[0, pl.ds(bo, P), :]
                di2 = d_scr[1, pl.ds(bo, P), :]
            else:
                dr2 = dsb[slot, 0, 0:P, :]
                di2 = dsb[slot, 1, 0:P, :]
            rr2 = rsb[slot, 0, 0:P, :]
            ri2 = rsb[slot, 1, 0:P, :]
            bhr = rr2 + br * dr2 - bi * di2
            bhi = ri2 + br * di2 + bi * dr2
            dpr[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                j < G - 1, bhr, 0.0)
            dpi[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                j < G - 1, bhi, 0.0)

            if d_resident:
                d_scr[0, pl.ds(j * Bv, Bv), :] = dnr
                d_scr[1, pl.ds(j * Bv, Bv), :] = dni

                @pl.when(it == K - 1)
                def _():
                    dn_ref[0] = dnr
                    dn_ref[1] = dni
            else:
                carry0[0] = dnr[Bv - 8:Bv, :]
                carry0[1] = dni[Bv - 8:Bv, :]

                @pl.when(j > 0)
                def _():
                    dn_out(j - 1).wait()
                dno[0] = dnr
                dno[1] = dni
                dn_out(j).start()

            if qx:
                @pl.when(j > 0)
                def _():
                    q_out(j - 1).wait()
            load_cpad()
            emit_q()
            qfr = q_scr[0, 0:Bv, :]
            qfi = q_scr[1, 0:Bv, :]
            if qx:
                q_out(j).start()
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

        # ================= phase 1: updates + <r,r> ======================
        @pl.when(ph == 1)
        def _():
            slot = j % 2

            def start_in(blk, s):
                @pl.when(it == 0)
                def _():
                    if not qx:
                        x1_in(blk, s, x_hbm).start()
                    r1_in(blk, s, r_hbm).start()

                @pl.when(it > 0)
                def _():
                    if not qx:
                        x1_in(blk, s, xn_ref).start()
                    r1_in(blk, s, rn_ref).start()
                if qx:
                    q1_in(blk, s).start()
                elif not d_resident:
                    dn1_in(blk, s).start()
                    dns_in(blk, s).start()

            @pl.when(j == 0)
            def _():
                dda[0, 0] = 0.0
                dda[1, 0] = 0.0
                if qx:
                    q_out(G - 1).wait()

                    @pl.when(it == K - 1)
                    def _():
                        xo_out(G - 1).wait()
                        if not d_resident:
                            dn_out(G - 1).wait()
                else:
                    if not d_resident:
                        dn_out(G - 1).wait()

                    @pl.when(it > 0)
                    def _():
                        xo_out(G - 1).wait()
                start_in(0, 0)

            @pl.when(j + 1 < G)
            def _():
                start_in(j + 1, (j + 1) % 2)

            if not qx:
                x1_in(j, slot, x_hbm).wait()
            r1_in(j, slot, r_hbm).wait()
            if qx:
                q1_in(j, slot).wait()
            elif not d_resident:
                dn1_in(j, slot).wait()
                dns_in(j, slot).wait()

            ar_ = al[0, 0]
            ai_ = al[1, 0]
            if qx:
                qr = qb[slot, 0]
                qi = qb[slot, 1]
            else:
                if d_resident:
                    dnr = d_scr[0, pl.ds(j * Bv, Bv), :]
                    dni = d_scr[1, pl.ds(j * Bv, Bv), :]
                else:
                    dnr = dnb[slot, 0]
                    dni = dnb[slot, 1]
                if d_resident:
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
                else:
                    dpr[0:P, P:P + nh] = jnp.where(
                        j > 0, carry1[0, 8 - P:8, :], 0.0)
                    dpi[0:P, P:P + nh] = jnp.where(
                        j > 0, carry1[1, 8 - P:8, :], 0.0)
                    dpr[P:P + Bv, P:P + nh] = dnr
                    dpi[P:P + Bv, P:P + nh] = dni
                    dpr[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                        j < G - 1, dnsb[slot, 0, 0:P, :], 0.0)
                    dpi[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                        j < G - 1, dnsb[slot, 1, 0:P, :], 0.0)
                    carry1[0] = dnr[Bv - 8:Bv, :]
                    carry1[1] = dni[Bv - 8:Bv, :]
                load_cpad()
                emit_q()
                qr = q_scr[0, 0:Bv, :]
                qi = q_scr[1, 0:Bv, :]

            rr_ = rb1[slot, 0]
            ri_ = rb1[slot, 1]
            nrr = rr_ - (ar_ * qr - ai_ * qi)
            nri = ri_ - (ar_ * qi + ai_ * qr)
            dda[0, 0] += jnp.sum(nrr * nrr - nri * nri)
            dda[1, 0] += 2.0 * jnp.sum(nrr * nri)

            if not qx:
                xr = xb[slot, 0]
                xi = xb[slot, 1]
                nxr = xr + ar_ * dnr - ai_ * dni
                nxi = xi + ar_ * dni + ai_ * dnr

                @pl.when(j > 0)
                def _():
                    xo_out(j - 1).wait()
                xo[0] = nxr
                xo[1] = nxi
                xo_out(j).start()

            @pl.when(j > 0)
            def _():
                ro_out(j - 1).wait()
            ro[0] = nrr
            ro[1] = nri
            ro_out(j).start()

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
                    if qx:
                        alphan_ref[0, 0] = ar_
                        alphan_ref[1, 0] = ai_
                    if not qx:
                        xo_out(j).wait()
                    ro_out(j).wait()

    scratch = []
    if d_resident:
        scratch.append(pltpu.VMEM((2, nv, nh), _F))        # d (resident)
    scratch += [pltpu.VMEM((2, Bv, nh), _F),               # q (block)
                pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),  # dpr
                pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),  # dpi
                pltpu.VMEM((nH1, Bv + 2 * P, nh + 2 * P), _F),  # cpr
                pltpu.VMEM((nH1, Bv + 2 * P, nh + 2 * P), _F),  # cpi
                pltpu.SMEM((3, 1), _F),                    # alpha+done
                pltpu.SMEM((2, 1), _F),                    # <d,q> acc
                pltpu.SMEM((2, 1), _F),                    # <r,r> acc
                pltpu.SMEM((4, 1), _F),                    # beta,delta
                pltpu.VMEM((2, 2, Bv, nh), _F),            # rb   (ph0 in)
                pltpu.VMEM((2, 2, 8, nh), _F),             # rsb  (ph0 in)
                pltpu.VMEM((2, 2, Bv, nh), _F),            # xb   (ph1 in)
                pltpu.VMEM((2, 2, Bv, nh), _F),            # rb1  (ph1 in)
                pltpu.VMEM((2, Bv, nh), _F),               # xo   (out)
                pltpu.VMEM((2, Bv, nh), _F)]               # ro   (out)
    if not d_resident:
        scratch += [pltpu.VMEM((2, 2, Bv, nh), _F),        # db   (ph0 in)
                    pltpu.VMEM((2, 2, 8, nh), _F),         # dsb  (ph0 in)
                    pltpu.VMEM((2, Bv, nh), _F),           # dno  (out)
                    pltpu.VMEM((2, 8, nh), _F)]            # carry0
        if not qx:
            scratch += [pltpu.VMEM((2, 2, Bv, nh), _F),    # dnb  (ph1 in)
                        pltpu.VMEM((2, 2, 8, nh), _F),     # dnsb (ph1 in)
                        pltpu.VMEM((2, 8, nh), _F)]        # carry1
    if qx:
        scratch.append(pltpu.VMEM((2, 2, Bv, nh), _F))     # qb   (ph1 in)
    scratch.append(pltpu.SemaphoreType.DMA((_N_SEMS,)))

    in_specs = [smem_in, smem_in, c_in, cs_in] + [any_spec] * 3
    out_specs = [any_spec, any_spec, d_out, smem_out((2, 1)),
                 smem_out((2, 1)), smem_out((K, 1))]
    out_shape = [jax.ShapeDtypeStruct((2, nv, nh), _F),
                 jax.ShapeDtypeStruct((2, nv, nh), _F),
                 jax.ShapeDtypeStruct((2, nv, nh), _F),
                 jax.ShapeDtypeStruct((2, 1), _F),
                 jax.ShapeDtypeStruct((2, 1), _F),
                 jax.ShapeDtypeStruct((K, 1), _F)]
    if qx:
        out_specs += [smem_out((2, 1)), any_spec]
        out_shape += [jax.ShapeDtypeStruct((2, 1), _F),
                      jax.ShapeDtypeStruct((2, nv, nh), _F)]

    def step(op_arg, beta2, delta2, x, r, d, Sr, Sd):
        cplanes, cstrips = op_arg
        ret = pl.pallas_call(
            kernel,
            grid=(K, 2, G),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=interpret,
        )(beta2, delta2, cplanes, cstrips, x, r, d)
        if not qx:
            return ret
        xo_, ro_, do_, b2, d2, hist, a2, _qo = ret
        ar = a2[0, 0]
        ai = a2[1, 0]
        xf = jnp.stack([xo_[0] + ar * do_[0] - ai * do_[1],
                        xo_[1] + ar * do_[1] + ai * do_[0]])
        return xf, ro_, do_, b2, d2, hist

    return step


def stream_cg_v5_sym_planes(offsets, grid, half_offsets, cplanes, bp,
                            x0p, n_iterations: int,
                            block_rows: int = None,
                            d_resident: bool = None, qx: bool = False,
                            chunk: int = _CHUNK,
                            interpret: bool = False):
    """Symmetric-coefficient panel-round-trip streaming CG (single RHS).

    half_offsets, cplanes : from
    :func:`tpcg.ops.stream_cg_v4_sym.prepare_stream_sym`.
    Same returns as ``stream_cg_coef_planes``.  ``d_resident`` defaults
    by the v5 VMEM budget; ``qx`` selects the one-apply variant (q
    through HBM + deferred x update, coefficients streamed once per
    iteration) over the default two-apply recompute.
    """
    nv, nh = grid
    if nh % 128 != 0 and not interpret:
        raise ValueError(
            f"v5-sym needs 128-aligned lane width, got nh={nh}")
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_v5_sym_planes")
    G = nv // Bv
    if d_resident is None:
        d_resident = 2 * nv * nh * 4 <= _V5_DRES_BYTES
    init_k1 = _build_k1_coef(offsets, grid, Bv, interpret=interpret)
    cstrips = _coef_boundary(cplanes, G, Bv, P, nh)
    offsets_all = [tuple(o) for o in offsets]
    steps = {}

    def get_step(K):
        if K not in steps:
            steps[K] = _build_v5_sym(half_offsets, offsets_all, grid,
                                     Bv, K, d_resident, interpret,
                                     qx=qx)
        return steps[K]

    coefp_full = reconstruct_coef(offsets, half_offsets, cplanes, grid)
    return _v4_loop(get_step, init_k1, coefp_full, (cplanes, cstrips),
                    bp, x0p, n_iterations, nv, nh, G, Bv, P, chunk)


def stream_cg_v5_sym(stencil, b, x0=None, n_iterations: int = 10,
                     block_rows: int = None, d_resident: bool = None,
                     qx: bool = False, chunk: int = _CHUNK,
                     interpret: bool = False):
    """Convenience wrapper: complex (Nv, Nh) grid in / out."""
    from .stream_cg_v4_sym import prepare_stream_sym
    nv, nh = stencil.grid
    half_offsets, cplanes = prepare_stream_sym(stencil)
    b = np.asarray(b).reshape(nv, nh)
    bp = jnp.asarray(np.stack([b.real, b.imag]).astype(np.float32))
    if x0 is None:
        x0p = jnp.zeros((2, nv, nh), np.float32)
    else:
        x0 = np.asarray(x0).reshape(nv, nh)
        x0p = jnp.asarray(np.stack([x0.real, x0.imag]).astype(np.float32))
    return stream_cg_v5_sym_planes(stencil.offsets, stencil.grid,
                                   half_offsets, cplanes, bp, x0p,
                                   n_iterations, block_rows=block_rows,
                                   d_resident=d_resident, qx=qx,
                                   chunk=chunk, interpret=interpret)
