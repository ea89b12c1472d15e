"""HBM-streaming CG v5: explicit-DMA state-panel round-trips for grids
beyond the v4 resident budget.

v4 (``tpcg.ops.stream_cg_v4``) keeps the whole CG state in VMEM scratch
across iterations, which caps it at ~2048^2 complex (x/r/d = 101 MB).
Beyond that the planner used to fall two tiers to the v2 two-kernel
pipeline (410-482 GFLOPS at N=2896/4096 vs 1307 in the v4 class).  v5
keeps v4's ONE-pallas-call multi-iteration structure -- grid
``(K, 2, G)``: iteration, phase (0 = direction+matvec+<d,q>,
1 = updates+<r,r>), row block -- but round-trips the state planes
through HBM with EXPLICIT async DMA, the mechanism the q_hbm tier
proved costs ~nothing when double-buffered (NOTES_R3):

  * ``x`` and ``r`` live in HBM (ANY-memory-space operands/outputs);
    each phase copies the needed row panels in (double-buffered: panel
    j+1 prefetches while j is consumed) and copies results out
    (lazily waited: the copy-out overlaps the next block's compute),
  * ``d`` has two tiers: ``d_resident=True`` keeps the direction field
    in VMEM scratch across iterations (fits to ~3300^2 complex -- one
    field instead of v4's three), halos are direct VMEM reads and the
    per-iteration HBM traffic is 10 state planes (r read twice, r/x
    written once, x read once); ``d_resident=False`` round-trips d
    panels too (any size, 16 planes/iteration),
  * ``q`` is never stored: phase 1 recomputes it from the
    already-updated direction values (bit-identical by construction --
    the stored dnew values ARE the phase-0 halo expressions, the same
    argument as v4's recompute tier).

Per-iteration scalars (alpha/beta/delta, the two dot accumulators) live
in SMEM exactly as in v2/v3/v4, so residual histories are bit-exact vs
the v2 pipeline at matched ``block_rows`` (pinned by tests).

DMA alignment: HBM<->VMEM async copies require the lane (minor)
dimension to be a multiple of 128 (unaligned widths reproducibly fail
the Mosaic compile -- the q_hbm gate); the entry point enforces
``nh % 128 == 0``.  Row-panel slices are sublane-dim slices at any
block size >= 8.

Reference semantics preserved: COCG unconjugated dots
(``kernel/complex/vdot.cl:15``), fixed iteration count (``clcg.c:297``),
per-iteration residual history (``cl.py:120``).  The reference's
largest benchmark matrices (m_t1 n=97k, parabolic_fem n=526k, report
Table I) are exactly the beyond-VMEM class this tier exists for.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_cg import _pad_for
from .stream_cg import (_build_kernels, _check_block_rows,
                        _pick_block_rows, _smith_cdiv, prepare_stream)
from .stream_cg_v4 import _CHUNK, _v4_loop

_F = jnp.float32

# VMEM budget for the tier-A resident direction field (bytes): one
# complex field (2 f32 planes) + the panel staging buffers must fit
# under the 127 MB compiler limit.
_V5_DRES_BYTES = 96 * 1024 * 1024

# semaphore indices (see _build_v5)
_S_R0, _S_RS, _S_X1, _S_R1 = 0, 2, 4, 6          # +slot (2 each)
_S_XO, _S_RO = 8, 9
_S_D0, _S_DS = 10, 12                             # +slot (2 each)
_S_DNO = 14
_S_DN1, _S_DNS = 15, 17                           # +slot (2 each)
_S_QO = 19
_S_Q1 = 20                                        # +slot (2)
_N_SEMS = 22


def _build_v5(offsets, grid, taps, Bv, K, d_resident, interpret,
              qx=False, cpos=None):
    """K-iteration panel-round-trip kernel (constant taps).

    Returned step matches the v4 contract:
    step((sb, st), beta2, delta2, x, r, d, Sr, Sd) ->
        (xn, rn, dn, beta' (2,1), delta' (2,1), hist (K,1))
    (Sr/Sd are accepted for loop compatibility and ignored -- v5 reads
    entry halos by DMA from the ANY-space x/r/d operands directly.)

    qx=False ("recompute"): phase 1 re-applies the stencil to the
    updated direction values (two applies/iteration, least traffic).
    qx=True: q round-trips HBM with explicit DMA (the v4 q_hbm trick)
    and the x-update DEFERS into the next iteration's phase-0 sweep
    (the same fp ops executed one sweep later -- bit-exact), so phase 1
    collapses to a lean r-update sweep: ONE apply/iteration, 18 state
    planes (tier B) / 14 (tier A).  In qx mode the returned x trails by
    one update; step applies the final ``x += alpha*dnew`` in XLA and
    additionally returns nothing extra (the 6-tuple contract holds).

    cpos: real right-edge column for COLUMN-ZERO-PADDED grids (the DMA
    lane-alignment fix for widths like 2896): the right-edge tap
    correction applies at column ``cpos`` (one-hot inside the last
    128-lane window) instead of nh-1, and q is zero-masked at columns
    beyond it, so the pad columns stay exactly zero through the whole
    solve (b/x0 are zero there; every update multiplies or adds
    zeros).  The strips operand must be zero-padded to the padded
    width (``pad_strips``).
    """
    nv, nh = grid
    P = _pad_for(offsets)
    assert nv % Bv == 0 and Bv >= 8, (nv, Bv)
    assert P <= 8, P
    assert interpret or nh % 128 == 0, \
        (nh, "v5 DMA panels need 128-aligned lanes on hardware")
    G = nv // Bv
    assert G >= 2, (nv, Bv)
    noff = len(offsets)
    cr, ci, lcr, lci, rcr, rci = taps
    W = min(nh, 128)
    # local position of the right-edge one-hot inside the last W-window
    cl_ = (cpos if cpos is not None else nh - 1) - (nh - W)
    assert 0 <= cl_ < W, (cpos, nh, W)
    igroups = {}
    lgroups = {}
    rgroups = {}
    for s, (dm, dj) in enumerate(offsets):
        if cr[s] != 0.0 or ci[s] != 0.0:
            igroups.setdefault((cr[s], ci[s]), []).append((dm, dj))
        if lcr[s] != 0.0 or lci[s] != 0.0:
            lgroups.setdefault((lcr[s], lci[s]), []).append((dm, dj))
        if rcr[s] != 0.0 or rci[s] != 0.0:
            rgroups.setdefault((rcr[s], rci[s]), []).append((dm, dj))

    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    op_specs = [pl.BlockSpec((2, noff, 1, nh),
                             lambda it, ph, j: (0, 0, 0, 0))] * 2
    if d_resident:
        # d leaves the chip only at the chunk's last phase-0 sweep
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
        (beta0_ref, delta0_ref, sb_ref, st_ref, x_hbm, r_hbm,
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
                (d_scr, q_scr, dpr, dpi, al, dqa, dda, bd, rb, rsb,
                 xb, rb1, xo, ro, qb, sems) = scr
            else:
                (d_scr, q_scr, dpr, dpi, al, dqa, dda, bd, rb, rsb,
                 xb, rb1, xo, ro, sems) = scr
            db = dsb = dno = carry0 = None
        else:
            if qx:
                (q_scr, dpr, dpi, al, dqa, dda, bd, rb, rsb, xb, rb1,
                 xo, ro, db, dsb, dno, carry0, qb, sems) = scr
            else:
                (q_scr, dpr, dpi, al, dqa, dda, bd, rb, rsb, xb, rb1,
                 xo, ro, db, dsb, dno, carry0, dnb, dnsb,
                 carry1, sems) = scr
            d_scr = None

        it = pl.program_id(0)
        ph = pl.program_id(1)
        j = pl.program_id(2)

        # ---- DMA descriptor helpers ------------------------------------
        def panel(ref, blk):
            return ref.at[:, pl.ds(blk * Bv, Bv), :]

        def strip_off(blk):
            # 8-row bottom-halo strip, clamped inside the grid (the
            # clamped last-block read is garbage-masked by j < G-1).
            # The x8 stays OUTSIDE the min so Mosaic can prove the
            # sublane index divisible by the (8,128) tiling -- a raw
            # min((blk+1)*Bv, nv-8) fails its divisibility prover.
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
                # it==0 only: d panel straight into its resident slot
                return pltpu.make_async_copy(
                    panel(d_hbm, blk),
                    d_scr.at[:, pl.ds(blk * Bv, Bv), :],
                    sems.at[_S_D0 + slot])

            def dload_s(blk, slot):
                # bottom strip into the SAME rows of d_scr it belongs
                # to (block blk+1's leading rows, or a harmless
                # same-data rewrite when clamped at the grid end)
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

        # ---- stencil application (constant taps + edge corrections) ----
        def emit_q():
            """Apply the operator to the dp pad buffer; corrected q
            lands in q_scr[0:Bv] (block-local, v4 keep_q=False layout)."""
            qr = jnp.zeros((Bv, nh), _F)
            qi = jnp.zeros((Bv, nh), _F)
            for (gr, gi), offs in igroups.items():
                (dm, dj) = offs[0]
                sxr = dpr[P + dm:P + dm + Bv, P + dj:P + dj + nh]
                sxi = dpi[P + dm:P + dm + Bv, P + dj:P + dj + nh]
                for (dm, dj) in offs[1:]:
                    sxr = sxr + dpr[P + dm:P + dm + Bv,
                                    P + dj:P + dj + nh]
                    sxi = sxi + dpi[P + dm:P + dm + Bv,
                                    P + dj:P + dj + nh]
                if gr != 0.0:
                    qr = qr + gr * sxr
                    qi = qi + gr * sxi
                if gi != 0.0:
                    qr = qr - gi * sxi
                    qi = qi + gi * sxr
            q_scr[0, 0:Bv, :] = qr
            q_scr[1, 0:Bv, :] = qi
            lanes = lax.broadcasted_iota(jnp.int32, (Bv, W), 1)
            lm = (lanes == 0).astype(_F)
            rm = (lanes == cl_).astype(_F)
            alr = jnp.zeros((Bv, W), _F)
            ali = jnp.zeros((Bv, W), _F)
            arr = jnp.zeros((Bv, W), _F)
            ari = jnp.zeros((Bv, W), _F)
            for (gr, gi), offs in lgroups.items():
                sxr = jnp.zeros((Bv, W), _F)
                sxi = jnp.zeros((Bv, W), _F)
                for (dm, dj) in offs:
                    sxr = sxr + dpr[P + dm:P + dm + Bv,
                                    P + dj:P + dj + W]
                    sxi = sxi + dpi[P + dm:P + dm + Bv,
                                    P + dj:P + dj + W]
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
            q_scr[0, 0:Bv, 0:W] = q_scr[0, 0:Bv, 0:W] + alr * lm
            q_scr[1, 0:Bv, 0:W] = q_scr[1, 0:Bv, 0:W] + ali * lm
            q_scr[0, 0:Bv, nh - W:nh] = \
                q_scr[0, 0:Bv, nh - W:nh] + arr * rm
            q_scr[1, 0:Bv, nh - W:nh] = \
                q_scr[1, 0:Bv, nh - W:nh] + ari * rm

            @pl.when(j == 0)
            def _():
                rbr = jnp.zeros((1, nh), _F)
                rbi = jnp.zeros((1, nh), _F)
                for s, (dm, dj) in enumerate(offsets):
                    xr_ = dpr[P + dm:P + dm + 1, P + dj:P + dj + nh]
                    xi_ = dpi[P + dm:P + dm + 1, P + dj:P + dj + nh]
                    ar_ = sb_ref[0, s]
                    ai_ = sb_ref[1, s]
                    rbr = rbr + ar_ * xr_ - ai_ * xi_
                    rbi = rbi + ar_ * xi_ + ai_ * xr_
                q_scr[0, 0:1, :] = q_scr[0, 0:1, :] + rbr
                q_scr[1, 0:1, :] = q_scr[1, 0:1, :] + rbi

            @pl.when(j == G - 1)
            def _():
                rtr = jnp.zeros((1, nh), _F)
                rti = jnp.zeros((1, nh), _F)
                for s, (dm, dj) in enumerate(offsets):
                    xr_ = dpr[P + Bv - 1 + dm:P + Bv + dm,
                              P + dj:P + dj + nh]
                    xi_ = dpi[P + Bv - 1 + dm:P + Bv + dm,
                              P + dj:P + dj + nh]
                    ar_ = st_ref[0, s]
                    ai_ = st_ref[1, s]
                    rtr = rtr + ar_ * xr_ - ai_ * xi_
                    rti = rti + ar_ * xi_ + ai_ * xr_
                q_scr[0, Bv - 1:Bv, :] = q_scr[0, Bv - 1:Bv, :] + rtr
                q_scr[1, Bv - 1:Bv, :] = q_scr[1, Bv - 1:Bv, :] + rti

            if cl_ != W - 1:
                # column-padded grid: the operator maps pad columns to
                # exactly 0 (taps shifted in from real columns land
                # there otherwise), keeping the pads zero through the
                # whole solve
                keep = (lanes <= cl_).astype(_F)
                q_scr[0, 0:Bv, nh - W:nh] = \
                    q_scr[0, 0:Bv, nh - W:nh] * keep
                q_scr[1, 0:Bv, nh - W:nh] = \
                    q_scr[1, 0:Bv, nh - W:nh] * keep

        @pl.when((it == 0) & (ph == 0) & (j == 0))
        def _():
            bd[0, 0] = beta0_ref[0, 0]
            bd[1, 0] = beta0_ref[1, 0]
            bd[2, 0] = delta0_ref[0, 0]
            bd[3, 0] = delta0_ref[1, 0]
            dpr[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)
            dpi[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)
            if qx:
                # chunk entry: the previous chunk's final x-update was
                # applied in XLA by step(), so the deferred alpha is 0
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
                # the previous iteration's final copy-outs must land
                # before we prefetch panels from those buffers
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
                # DEFERRED x update: apply the PREVIOUS iteration's
                # alpha to the previous direction (= the incoming d of
                # this sweep) -- the same fp ops phase 1 used to do,
                # executed one sweep later, so bit-exact.  al still
                # holds alpha_{i-1} here (the new alpha lands at
                # j == G-1 below, after this read).
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
            # top halo: rows of block j-1 already updated with THIS
            # iteration's dnew (sweep order)
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
            # bottom halo: dnew of block j+1 = r + beta*d from the OLD
            # values (r strip DMA'd alongside the panel; d from the
            # resident field / the d strip) -- v2's strip expression
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

                # dnew panel out through the single staging buffer
                # (lazy wait: the copy-out overlaps the next block)
                @pl.when(j > 0)
                def _():
                    dn_out(j - 1).wait()
                dno[0] = dnr
                dno[1] = dni
                dn_out(j).start()

            if qx:
                # reclaim q_scr before emit_q overwrites it (the
                # copy-out overlapped this block's halo/direction work)
                @pl.when(j > 0)
                def _():
                    q_out(j - 1).wait()
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
                # phase 0's final copy-outs feed our panel reads; in qx
                # mode the x/dnew streams are only read again by the
                # NEXT phase 0, so their final drains land here only at
                # the chunk's last iteration
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
                # lean sweep: rn = r - alpha*q with the q phase 0
                # round-tripped through HBM; x was already advanced by
                # the phase-0 deferred update
                qr = qb[slot, 0]
                qi = qb[slot, 1]
            else:
                if d_resident:
                    dnr = d_scr[0, pl.ds(j * Bv, Bv), :]
                    dni = d_scr[1, pl.ds(j * Bv, Bv), :]
                else:
                    dnr = dnb[slot, 0]
                    dni = dnb[slot, 1]
                # recompute q from the updated direction (bit-identical
                # to the phase-0 result: same halo expressions, v4
                # argument)
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
                        # the final deferred alpha; step() applies it
                        # in XLA (same fp ops, executed post-kernel)
                        alphan_ref[0, 0] = ar_
                        alphan_ref[1, 0] = ai_
                    # drain the final copy-outs before the kernel ends
                    if not qx:
                        xo_out(j).wait()
                    ro_out(j).wait()

    scratch = []
    if d_resident:
        scratch.append(pltpu.VMEM((2, nv, nh), _F))        # d (resident)
    scratch += [pltpu.VMEM((2, Bv, nh), _F),               # q (block)
                pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),  # dpr
                pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),  # dpi
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

    in_specs = [smem_in, smem_in] + op_specs + [any_spec] * 3
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
        sb, st = op_arg
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
        )(beta2, delta2, sb, st, x, r, d)
        if not qx:
            return ret
        xo_, ro_, do_, b2, d2, hist, a2, _qo = ret
        # the kernel's x trails by one deferred update; apply the final
        # alpha here (identical fp ops to the in-kernel axpy)
        ar = a2[0, 0]
        ai = a2[1, 0]
        xf = jnp.stack([xo_[0] + ar * do_[0] - ai * do_[1],
                        xo_[1] + ar * do_[1] + ai * do_[0]])
        return xf, ro_, do_, b2, d2, hist

    return step


def pad_strips(strips2, nh_pad):
    """Zero-pad the (.., 1, Nh) boundary-row strips to a padded lane
    width (column-pad support; the pad columns contribute exactly 0)."""
    return tuple(jnp.pad(s, ((0, 0),) * (s.ndim - 1)
                         + ((0, nh_pad - s.shape[-1]),))
                 for s in strips2)


def apply_const_planes_xla(offsets, taps, strips2, xp, cpos=None):
    """XLA reference application of the const-tap streamed operator on
    (2, Nv, Nh) planes: interior taps + one-hot left/right edge-tap
    corrections + bottom/top boundary-row strips (exactly the kernels'
    emit_q math).  ``cpos`` marks the real right edge of a
    column-padded grid (pads map to 0).  Serves as the v5 init for
    padded grids -- no v2 kernel exists at unaligned lane widths -- and
    as a test oracle for the cpos machinery."""
    cr, ci, lcr, lci, rcr, rci = taps
    sb, st = strips2
    _, nv, nh = xp.shape
    P = _pad_for(offsets)
    xr = jnp.pad(xp[0], P)
    xi = jnp.pad(xp[1], P)
    qr = jnp.zeros((nv, nh), _F)
    qi = jnp.zeros((nv, nh), _F)
    col = jnp.arange(nh)
    redge = cpos if cpos is not None else nh - 1
    m0 = (col == 0).astype(_F)[None, :]
    mr = (col == redge).astype(_F)[None, :]
    row = jnp.arange(nv)
    rb = (row == 0).astype(_F)[:, None]
    rt = (row == nv - 1).astype(_F)[:, None]
    for s, (dm, dj) in enumerate(offsets):
        sxr = xr[P + dm:P + dm + nv, P + dj:P + dj + nh]
        sxi = xi[P + dm:P + dm + nv, P + dj:P + dj + nh]
        qr = qr + cr[s] * sxr - ci[s] * sxi
        qi = qi + cr[s] * sxi + ci[s] * sxr
        qr = qr + (lcr[s] * sxr - lci[s] * sxi) * m0
        qi = qi + (lcr[s] * sxi + lci[s] * sxr) * m0
        qr = qr + (rcr[s] * sxr - rci[s] * sxi) * mr
        qi = qi + (rcr[s] * sxi + rci[s] * sxr) * mr
        qr = qr + (sb[0, s, 0][None, :] * sxr
                   - sb[1, s, 0][None, :] * sxi) * rb
        qi = qi + (sb[0, s, 0][None, :] * sxi
                   + sb[1, s, 0][None, :] * sxr) * rb
        qr = qr + (st[0, s, 0][None, :] * sxr
                   - st[1, s, 0][None, :] * sxi) * rt
        qi = qi + (st[0, s, 0][None, :] * sxi
                   + st[1, s, 0][None, :] * sxr) * rt
    if cpos is not None and cpos != nh - 1:
        keep = (col <= cpos).astype(_F)[None, :]
        qr = qr * keep
        qi = qi * keep
    return jnp.stack([qr, qi])


def stream_cg_v5_const_planes(offsets, grid, taps, strips2, bp, x0p,
                              n_iterations: int, block_rows: int = None,
                              d_resident: bool = None, qx: bool = False,
                              cpos: int = None, chunk: int = _CHUNK,
                              interpret: bool = False):
    """Panel-round-trip constant-tap streaming CG (single RHS).

    Same contract as ``stream_cg_const_planes``.  ``d_resident``
    defaults by the VMEM budget (one complex field resident when it
    fits; everything panel-round-tripped otherwise).  ``qx`` selects
    the one-apply variant (q through HBM + deferred x update) over the
    default two-apply recompute; both are bit-exact vs v2.  ``cpos``
    marks the real right edge of a column-zero-padded grid (see
    _build_v5; ``grid``/``bp``/``strips2`` are then the PADDED shapes
    and the r0 init runs through the XLA apply -- no v2 kernel exists
    at unaligned widths).
    """
    nv, nh = grid
    if cpos is None and nh % 128 != 0 and not interpret:
        # HBM<->VMEM DMA requires 128-aligned lane widths on hardware
        # (unaligned widths reproducibly fail the Mosaic compile);
        # interpret mode has no such constraint, so tests may use
        # small grids.
        raise ValueError(
            f"v5 needs 128-aligned lane width, got nh={nh} (column-pad "
            "the grid; plan_stencil_cg does this automatically)")
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_v5_const_planes")
    G = nv // Bv
    if d_resident is None:
        d_resident = 2 * nv * nh * 4 <= _V5_DRES_BYTES
    if cpos is None:
        init_k1, _ = _build_kernels(offsets, grid, taps, Bv,
                                    interpret=interpret)
    else:
        def init_k1(op, _b2, _o2, x0_, _zv, _Sx, _zs):
            # column-padded init: q0 = A x0 via the XLA apply (matches
            # _v4_loop's k1-reuse calling convention)
            return None, apply_const_planes_xla(offsets, taps, op, x0_,
                                                cpos), None, None
    steps = {}

    def get_step(K):
        if K not in steps:
            steps[K] = _build_v5(offsets, grid, taps, Bv, K, d_resident,
                                 interpret, qx=qx, cpos=cpos)
        return steps[K]

    return _v4_loop(get_step, init_k1, strips2, strips2, bp, x0p,
                    n_iterations, nv, nh, G, Bv, P, chunk)


def stream_cg_v5_const(stencil, b, x0=None, n_iterations: int = 10,
                       block_rows: int = None, d_resident: bool = None,
                       chunk: int = _CHUNK, interpret: bool = False):
    """Convenience wrapper: complex (Nv, Nh) grid in / out."""
    nv, nh = stencil.grid
    taps, strips2 = prepare_stream(stencil)
    b = np.asarray(b).reshape(nv, nh)
    bp = jnp.asarray(np.stack([b.real, b.imag]).astype(np.float32))
    if x0 is None:
        x0p = jnp.zeros((2, nv, nh), np.float32)
    else:
        x0 = np.asarray(x0).reshape(nv, nh)
        x0p = jnp.asarray(np.stack([x0.real, x0.imag]).astype(np.float32))
    return stream_cg_v5_const_planes(stencil.offsets, stencil.grid, taps,
                                     strips2, bp, x0p, n_iterations,
                                     block_rows=block_rows,
                                     d_resident=d_resident,
                                     chunk=chunk, interpret=interpret)
