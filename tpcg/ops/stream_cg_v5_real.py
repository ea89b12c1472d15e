"""Explicit-DMA panel-round-trip streaming CG for REAL systems.

Real single-plane twin of :mod:`tpcg.ops.stream_cg_v5`: grids beyond
the real v4 resident budget (~2900^2) keep v4's one-pallas-call
multi-iteration structure with the state planes in HBM, row panels
DMA'd in/out per phase.  Real f32 planes are half the complex pair, so
tier A (direction field resident in VMEM) covers N=4096
parabolic_fem-class grids outright -- previously served by the v2 real
pipeline at ~180 GFLOPS.

Tiers and modes mirror the complex kernel exactly:

  * ``d_resident=True``: d in VMEM scratch, x/r panel round-trips
    (5 state planes/iteration); False: everything round-trips (8).
  * ``qx=False``: phase 1 recomputes q from the updated direction
    (bit-identical, v4 argument).  ``qx=True``: q round-trips HBM and
    the x-update defers one sweep (same fp ops -- bit-exact on HW; in
    interpret the extra outputs perturb XLA reduction fusion at
    rounding level, the q_hbm phenomenon).

Serves the reference's real CG (``kernel/real/*.cl``,
``clcg.c:111-466`` with isComplex=0) at sizes beyond every resident
budget; fixed iteration count (``clcg.c:297``), residual history
sqrt(<r,r>) per iteration (``cl.py:120``).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_cg import _pad_for
from .stream_cg import _check_block_rows, _pick_block_rows
from .stream_cg_real import _build_k1_real_const, prepare_stream_real
from .stream_cg_v4 import _CHUNK
from .stream_cg_v4_real import _v4_loop_real
from .stream_cg_v5 import (_N_SEMS, _S_D0, _S_DN1, _S_DNO, _S_DNS,
                           _S_DS, _S_Q1, _S_QO, _S_R0, _S_R1, _S_RO,
                           _S_RS, _S_X1, _S_XO)

_F = jnp.float32

# tier-A budget: one real f32 field + panel staging under the 127 MB
# compiler limit (the complex kernel's calibration halves over)
_V5R_DRES_BYTES = 96 * 1024 * 1024


def _build_v5_real(offsets, grid, taps, Bv, K, d_resident, interpret,
                   qx=False, cpos=None):
    """K-iteration real panel-round-trip kernel (constant taps).

    step((sb, st), beta1, delta1, x, r, d, Sr, Sd) ->
        (xn, rn, dn, beta' (1,1), delta' (1,1), hist (K,1));
    Sr/Sd accepted for loop compatibility and ignored.
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
    c, lc, rc = taps
    W = min(nh, 128)
    # right-edge one-hot position (column-padded grids, see
    # stream_cg_v5._build_v5)
    cl_ = (cpos if cpos is not None else nh - 1) - (nh - W)
    assert 0 <= cl_ < W, (cpos, nh, W)
    igroups = {}
    for s, (dm, dj) in enumerate(offsets):
        if c[s] != 0.0:
            igroups.setdefault(c[s], []).append((dm, dj))

    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    op_specs = [pl.BlockSpec((noff, 1, nh),
                             lambda it, ph, j: (0, 0, 0))] * 2
    if d_resident:
        d_out = pl.BlockSpec((Bv, nh),
                             lambda it, ph, j:
                             (jnp.where((it == K - 1) & (ph == 0), j,
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
                (d_scr, q_scr, dp, al, dqa, dda, bd, rb, rsb, xb, rb1,
                 xo, ro, qb, sems) = scr
            else:
                (d_scr, q_scr, dp, al, dqa, dda, bd, rb, rsb, xb, rb1,
                 xo, ro, sems) = scr
            db = dsb = dno = carry0 = None
        else:
            if qx:
                (q_scr, dp, al, dqa, dda, bd, rb, rsb, xb, rb1, xo,
                 ro, db, dsb, dno, carry0, qb, sems) = scr
            else:
                (q_scr, dp, al, dqa, dda, bd, rb, rsb, xb, rb1, xo,
                 ro, db, dsb, dno, carry0, dnb, dnsb,
                 carry1, sems) = scr
            d_scr = None

        it = pl.program_id(0)
        ph = pl.program_id(1)
        j = pl.program_id(2)

        def panel(ref, blk):
            return ref.at[pl.ds(blk * Bv, Bv), :]

        def strip_off(blk):
            # x8 outside the min so Mosaic can prove sublane-tiling
            # divisibility (see stream_cg_v5.strip_off)
            if Bv % 8 == 0 and nv % 8 == 0:
                return 8 * jnp.minimum((blk + 1) * (Bv // 8),
                                       nv // 8 - 1)
            assert interpret, (Bv, nv)
            return jnp.minimum((blk + 1) * Bv, nv - 8)

        def strip(ref, blk):
            return ref.at[pl.ds(strip_off(blk), 8), :]

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
                    d_scr.at[pl.ds(blk * Bv, Bv), :],
                    sems.at[_S_D0 + slot])

            def dload_s(blk, slot):
                return pltpu.make_async_copy(
                    strip(d_hbm, blk),
                    d_scr.at[pl.ds(strip_off(blk), 8), :],
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

        def emit_q():
            """Apply the real operator to the dp pad buffer; corrected
            q lands in q_scr[0:Bv] (dot form mirrors stream_cg_real:
            the corrected read-back is dotted)."""
            q = jnp.zeros((Bv, nh), _F)
            for g, offs in igroups.items():
                sx = dp[P + offs[0][0]:P + offs[0][0] + Bv,
                        P + offs[0][1]:P + offs[0][1] + nh]
                for (dm, dj) in offs[1:]:
                    sx = sx + dp[P + dm:P + dm + Bv,
                                 P + dj:P + dj + nh]
                q = q + g * sx
            q_scr[0:Bv, :] = q
            lanes = lax.broadcasted_iota(jnp.int32, (Bv, W), 1)
            lm = (lanes == 0).astype(_F)
            rm = (lanes == cl_).astype(_F)
            alw = jnp.zeros((Bv, W), _F)
            arw = jnp.zeros((Bv, W), _F)
            for s, (dm, dj) in enumerate(offsets):
                if lc[s] != 0.0:
                    alw = alw + lc[s] * dp[P + dm:P + dm + Bv,
                                           P + dj:P + dj + W]
                if rc[s] != 0.0:
                    arw = arw + rc[s] * dp[P + dm:P + dm + Bv,
                                           P + nh - W + dj:P + nh + dj]
            q_scr[0:Bv, 0:W] = q_scr[0:Bv, 0:W] + alw * lm
            q_scr[0:Bv, nh - W:nh] = q_scr[0:Bv, nh - W:nh] + arw * rm

            @pl.when(j == 0)
            def _():
                rb_ = jnp.zeros((1, nh), _F)
                for s, (dm, dj) in enumerate(offsets):
                    rb_ = rb_ + sb_ref[s] * dp[P + dm:P + dm + 1,
                                               P + dj:P + dj + nh]
                q_scr[0:1, :] = q_scr[0:1, :] + rb_

            @pl.when(j == G - 1)
            def _():
                rt = jnp.zeros((1, nh), _F)
                for s, (dm, dj) in enumerate(offsets):
                    rt = rt + st_ref[s] * dp[P + Bv - 1 + dm:
                                             P + Bv + dm,
                                             P + dj:P + dj + nh]
                q_scr[Bv - 1:Bv, :] = q_scr[Bv - 1:Bv, :] + rt

            if cl_ != W - 1:
                # column-padded grid: pad columns map to exactly 0
                keep = (lanes <= cl_).astype(_F)
                q_scr[0:Bv, nh - W:nh] = q_scr[0:Bv, nh - W:nh] * keep

        @pl.when((it == 0) & (ph == 0) & (j == 0))
        def _():
            bd[0, 0] = beta0_ref[0, 0]
            bd[1, 0] = delta0_ref[0, 0]
            dp[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)
            if qx:
                al[0, 0] = 0.0
                al[1, 0] = 0.0

        # ================= phase 0 =======================================
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

            bt = bd[0, 0]
            rr_ = rb[slot]
            if d_resident:
                dr_ = d_scr[pl.ds(j * Bv, Bv), :]
            else:
                dr_ = db[slot]
            if qx:
                # deferred x update with the previous iteration's alpha
                a_p = al[0, 0]
                nx = xb[slot] + a_p * dr_

                @pl.when(j > 0)
                def _():
                    xo_out(j - 1).wait()
                xo[...] = nx
                xo_out(j).start()
            dn = rr_ + bt * dr_
            if d_resident:
                to = jnp.maximum(j * Bv - P, 0)
                dp[0:P, P:P + nh] = jnp.where(
                    j > 0, d_scr[pl.ds(to, P), :], 0.0)
            else:
                dp[0:P, P:P + nh] = jnp.where(
                    j > 0, carry0[8 - P:8, :], 0.0)
            dp[P:P + Bv, P:P + nh] = dn
            if d_resident:
                bo = jnp.minimum((j + 1) * Bv, nv - P)
                dr2 = d_scr[pl.ds(bo, P), :]
            else:
                dr2 = dsb[slot, 0:P, :]
            bh = rsb[slot, 0:P, :] + bt * dr2
            dp[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                j < G - 1, bh, 0.0)

            if d_resident:
                d_scr[pl.ds(j * Bv, Bv), :] = dn

                @pl.when(it == K - 1)
                def _():
                    dn_ref[...] = dn
            else:
                carry0[...] = dn[Bv - 8:Bv, :]

                @pl.when(j > 0)
                def _():
                    dn_out(j - 1).wait()
                dno[...] = dn
                dn_out(j).start()

            if qx:
                @pl.when(j > 0)
                def _():
                    q_out(j - 1).wait()
            emit_q()
            qf = q_scr[0:Bv, :]
            if qx:
                q_out(j).start()
            dqa[0, 0] += jnp.sum(dn * qf)

            @pl.when(j == G - 1)
            def _():
                dq = dqa[0, 0]
                de = bd[1, 0]
                done = (de == 0.0) | (dq == 0.0)
                al[0, 0] = jnp.where(done, 0.0,
                                     de / jnp.where(done, 1.0, dq))
                al[1, 0] = jnp.where(done, 1.0, 0.0)

        # ================= phase 1 =======================================
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

            a = al[0, 0]
            if qx:
                q = qb[slot]
            else:
                if d_resident:
                    dn = d_scr[pl.ds(j * Bv, Bv), :]
                else:
                    dn = dnb[slot]
                if d_resident:
                    to = jnp.maximum(j * Bv - P, 0)
                    bo = jnp.minimum((j + 1) * Bv, nv - P)
                    dp[0:P, P:P + nh] = jnp.where(
                        j > 0, d_scr[pl.ds(to, P), :], 0.0)
                    dp[P:P + Bv, P:P + nh] = dn
                    dp[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                        j < G - 1, d_scr[pl.ds(bo, P), :], 0.0)
                else:
                    dp[0:P, P:P + nh] = jnp.where(
                        j > 0, carry1[8 - P:8, :], 0.0)
                    dp[P:P + Bv, P:P + nh] = dn
                    dp[P + Bv:2 * P + Bv, P:P + nh] = jnp.where(
                        j < G - 1, dnsb[slot, 0:P, :], 0.0)
                    carry1[...] = dn[Bv - 8:Bv, :]
                emit_q()
                q = q_scr[0:Bv, :]

            nr = rb1[slot] - a * q
            dda[0, 0] += jnp.sum(nr * nr)

            if not qx:
                nx = xb[slot] + a * dn

                @pl.when(j > 0)
                def _():
                    xo_out(j - 1).wait()
                xo[...] = nx
                xo_out(j).start()

            @pl.when(j > 0)
            def _():
                ro_out(j - 1).wait()
            ro[...] = nr
            ro_out(j).start()

            @pl.when(j == G - 1)
            def _():
                dnew = dda[0, 0]
                done = al[1, 0] > 0.5
                de = bd[1, 0]
                bd[0, 0] = jnp.where(
                    done, 0.0,
                    dnew / jnp.where(done | (de == 0.0), 1.0, de))
                bd[1, 0] = dnew
                hist_ref[it, 0] = jnp.sqrt(dnew)

                @pl.when(it == K - 1)
                def _():
                    betan_ref[0, 0] = bd[0, 0]
                    deltan_ref[0, 0] = dnew
                    if qx:
                        alphan_ref[0, 0] = a
                    if not qx:
                        xo_out(j).wait()
                    ro_out(j).wait()

    scratch = []
    if d_resident:
        scratch.append(pltpu.VMEM((nv, nh), _F))           # d (resident)
    scratch += [pltpu.VMEM((Bv, nh), _F),                  # q (block)
                pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),  # dp
                pltpu.SMEM((2, 1), _F),                    # alpha+done
                pltpu.SMEM((1, 1), _F),                    # <d,q> acc
                pltpu.SMEM((1, 1), _F),                    # <r,r> acc
                pltpu.SMEM((2, 1), _F),                    # beta,delta
                pltpu.VMEM((2, Bv, nh), _F),               # rb   (ph0 in)
                pltpu.VMEM((2, 8, nh), _F),                # rsb  (ph0 in)
                pltpu.VMEM((2, Bv, nh), _F),               # xb
                pltpu.VMEM((2, Bv, nh), _F),               # rb1  (ph1 in)
                pltpu.VMEM((Bv, nh), _F),                  # xo   (out)
                pltpu.VMEM((Bv, nh), _F)]                  # ro   (out)
    if not d_resident:
        scratch += [pltpu.VMEM((2, Bv, nh), _F),           # db   (ph0 in)
                    pltpu.VMEM((2, 8, nh), _F),            # dsb  (ph0 in)
                    pltpu.VMEM((Bv, nh), _F),              # dno  (out)
                    pltpu.VMEM((8, nh), _F)]               # carry0
        if not qx:
            scratch += [pltpu.VMEM((2, Bv, nh), _F),       # dnb  (ph1 in)
                        pltpu.VMEM((2, 8, nh), _F),        # dnsb (ph1 in)
                        pltpu.VMEM((8, nh), _F)]           # carry1
    if qx:
        scratch.append(pltpu.VMEM((2, Bv, nh), _F))        # qb   (ph1 in)
    scratch.append(pltpu.SemaphoreType.DMA((_N_SEMS,)))

    in_specs = [smem_in, smem_in] + op_specs + [any_spec] * 3
    out_specs = [any_spec, any_spec, d_out, smem_out((1, 1)),
                 smem_out((1, 1)), smem_out((K, 1))]
    out_shape = [jax.ShapeDtypeStruct((nv, nh), _F),
                 jax.ShapeDtypeStruct((nv, nh), _F),
                 jax.ShapeDtypeStruct((nv, nh), _F),
                 jax.ShapeDtypeStruct((1, 1), _F),
                 jax.ShapeDtypeStruct((1, 1), _F),
                 jax.ShapeDtypeStruct((K, 1), _F)]
    if qx:
        out_specs += [smem_out((1, 1)), any_spec]
        out_shape += [jax.ShapeDtypeStruct((1, 1), _F),
                      jax.ShapeDtypeStruct((nv, nh), _F)]

    def step(op_arg, beta1, delta1, x, r, d, Sr, Sd):
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
        )(beta1, delta1, sb, st, x, r, d)
        if not qx:
            return ret
        xo_, ro_, do_, b1, d1, hist, a1, _qo = ret
        xf = xo_ + a1[0, 0] * do_
        return xf, ro_, do_, b1, d1, hist

    return step


def apply_const_real_xla(offsets, taps, strips2, xp, cpos=None):
    """XLA twin of the real emit_q (see
    stream_cg_v5.apply_const_planes_xla): the v5 init for
    column-padded real grids and a test oracle."""
    c, lc, rc = taps
    sb, st = strips2                        # (noff, 1, nh) each
    nv, nh = xp.shape
    P = _pad_for(offsets)
    x = jnp.pad(xp, P)
    q = jnp.zeros((nv, nh), _F)
    col = jnp.arange(nh)
    redge = cpos if cpos is not None else nh - 1
    m0 = (col == 0).astype(_F)[None, :]
    mr = (col == redge).astype(_F)[None, :]
    row = jnp.arange(nv)
    rb = (row == 0).astype(_F)[:, None]
    rt = (row == nv - 1).astype(_F)[:, None]
    for s, (dm, dj) in enumerate(offsets):
        sx = x[P + dm:P + dm + nv, P + dj:P + dj + nh]
        q = q + c[s] * sx
        q = q + lc[s] * sx * m0
        q = q + rc[s] * sx * mr
        q = q + sb[s, 0][None, :] * sx * rb
        q = q + st[s, 0][None, :] * sx * rt
    if cpos is not None and cpos != nh - 1:
        q = q * (col <= cpos).astype(_F)[None, :]
    return q


def stream_cg_v5_real_planes(offsets, grid, taps, strips2, bp, x0p,
                             n_iterations: int, block_rows: int = None,
                             d_resident: bool = None, qx: bool = False,
                             cpos: int = None, chunk: int = _CHUNK,
                             interpret: bool = False):
    """Panel-round-trip const-tap REAL streaming CG (single RHS).

    Same contract as ``stream_cg_real_planes``; ``d_resident`` defaults
    by the VMEM budget, ``qx`` selects the one-apply variant, ``cpos``
    marks the real right edge of a column-zero-padded grid (operands
    then carry the PADDED shapes; init runs through the XLA apply).
    """
    nv, nh = grid
    if cpos is None and nh % 128 != 0 and not interpret:
        raise ValueError(
            f"v5 needs 128-aligned lane width, got nh={nh} (column-pad "
            "the grid; plan_stencil_cg does this automatically)")
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_v5_real_planes")
    G = nv // Bv
    if d_resident is None:
        d_resident = nv * nh * 4 <= _V5R_DRES_BYTES
    if cpos is None:
        init_k1 = _build_k1_real_const(offsets, grid, taps, Bv,
                                       interpret)
    else:
        def init_k1(op, _b1, _o1, x0_, _zv, _Sx, _zs):
            return None, apply_const_real_xla(offsets, taps, op, x0_,
                                              cpos), None, None
    steps = {}

    def get_step(K):
        if K not in steps:
            steps[K] = _build_v5_real(offsets, grid, taps, Bv, K,
                                      d_resident, interpret, qx=qx,
                                      cpos=cpos)
        return steps[K]

    return _v4_loop_real(get_step, init_k1, strips2, strips2, bp, x0p,
                         n_iterations, nv, nh, G, Bv, P, chunk)


def stream_cg_v5_real(stencil, b, x0=None, n_iterations: int = 10,
                      block_rows: int = None, d_resident: bool = None,
                      qx: bool = False, chunk: int = _CHUNK,
                      interpret: bool = False):
    """Convenience wrapper: real (Nv, Nh) grid in / out."""
    nv, nh = stencil.grid
    taps, strips2 = prepare_stream_real(stencil)
    b = np.asarray(b).reshape(nv, nh).astype(np.float32)
    bp = jnp.asarray(b)
    x0p = (jnp.zeros((nv, nh), np.float32) if x0 is None
           else jnp.asarray(np.asarray(x0).reshape(nv, nh)
                            .astype(np.float32)))
    return stream_cg_v5_real_planes(stencil.offsets, stencil.grid, taps,
                                    strips2, bp, x0p, n_iterations,
                                    block_rows=block_rows,
                                    d_resident=d_resident, qx=qx,
                                    chunk=chunk, interpret=interpret)
