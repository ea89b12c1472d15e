"""HBM-streaming CG v3: one merged kernel per iteration.

The v2 iteration (``tpcg.ops.stream_cg``) runs two pallas calls, K1
(direction + matvec + <d,q>) and K2 (x/r updates + <r,r>), handing
``dnew`` and ``q`` between them through HBM: 8 of its 20 plane-transfers
per iteration are that handoff.  v3 merges both sweeps into ONE pallas
call with grid ``(2, G)`` -- phase 0 re-implements K1, phase 1 K2 -- and
keeps the intermediates in VMEM scratch that persists across grid steps:

  * ``q`` and ``dnew`` never touch HBM (phase 1 reads them from scratch;
    ``dnew`` is additionally streamed out once as the next iteration's
    ``d``),
  * optionally (``keep_r``, on when the grid fits the VMEM budget) ``r``
    is stashed during phase 0 so phase 1 does not re-read it.

Per-iteration HBM traffic drops from 20 plane-transfers to 14
(N = 2048) or 12 (``keep_r``, N <= 1024) -- the difference between ~430
and >900 GB/s-equivalent throughput at the large-N end (VERDICT r2
item 4).

Pipelining notes: the phase-dependent BlockSpec index maps hold each
array's block index constant during the phase that does not use it
(Mosaic skips re-fetch/flush while the index is unchanged), so e.g. the
``x`` input is fetched only during phase 1 and the ``dnew`` output is
flushed only during phase 0.  Output blocks are always fully written
before their first index change, so no garbage buffer ever reaches HBM.

Arithmetic is IDENTICAL to v2 (same block order, same accumulation
order, same freeze guard), so residual histories match v2 bit-for-bit;
tests pin that equality in interpret mode.

Reference semantics preserved: COCG unconjugated dots
(``kernel/complex/vdot.cl:15``), fixed iteration count (``clcg.c:297``).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_cg import _pad_for
from .stream_cg import (_boundary, _build_k1_coef, _build_kernels,
                        _check_block_rows, _pick_block_rows, _smith_cdiv,
                        prepare_stream, prepare_stream_coef)

_F = jnp.float32

# grids whose (q, dnew, r) scratch triple fits comfortably in VMEM keep
# r resident too (3 * 2 * nodes * 4 B <= ~32 MB)
_KEEP_R_NODES = 1024 * 1024 + 1


def _build_merged(offsets, grid, Bv, keep_r, interpret, taps=None):
    """One (2, G)-grid kernel: phase 0 = K1, phase 1 = K2.

    taps None -> variable-coefficient variant (operand = coef planes);
    else constant-tap variant (operand = (sb, st) strips).
    step(op_arg, beta2, delta2, x, r, d, Sr, Sd) ->
        (xn, rn, dnew, Srn, Sdn, beta_new (2,1), delta_new (2,1),
         hist (1,1))
    """
    nv, nh = grid
    P = _pad_for(offsets)
    assert nv % Bv == 0, (nv, Bv)
    G = nv // Bv
    noff = len(offsets)
    const = taps is not None
    if const:
        cr, ci, lcr, lci, rcr, rci = taps
        W = min(nh, 128)

    def ph0(j):
        return j

    blk_r = pl.BlockSpec((2, Bv, nh),
                         (lambda ph, j: (0, j, 0)) if not keep_r
                         else (lambda ph, j:
                               (0, jnp.where(ph == 0, j, G - 1), 0)))
    blk_d = pl.BlockSpec((2, Bv, nh),
                         lambda ph, j: (0, jnp.where(ph == 0, j, G - 1),
                                        0))
    blk_x = pl.BlockSpec((2, Bv, nh),
                         lambda ph, j: (0, jnp.where(ph == 1, j, 0), 0))
    out_ph0 = pl.BlockSpec((2, Bv, nh),
                           lambda ph, j: (0, jnp.where(ph == 0, j,
                                                       G - 1), 0))
    out_ph1 = pl.BlockSpec((2, Bv, nh),
                           lambda ph, j: (0, jnp.where(ph == 1, j, 0),
                                          0))
    sblk_m1 = pl.BlockSpec(
        (2, 1, 2 * P, nh),
        lambda ph, j: (0, jnp.where(ph == 0, jnp.maximum(j - 1, 0), 0),
                       0, 0))
    sblk_p1 = pl.BlockSpec(
        (2, 1, 2 * P, nh),
        lambda ph, j: (0, jnp.where(ph == 0, jnp.minimum(j + 1, G - 1),
                                    0), 0, 0))
    sout_ph0 = pl.BlockSpec(
        (2, 1, 2 * P, nh),
        lambda ph, j: (0, jnp.where(ph == 0, j, G - 1), 0, 0))
    sout_ph1 = pl.BlockSpec(
        (2, 1, 2 * P, nh),
        lambda ph, j: (0, jnp.where(ph == 1, j, 0), 0, 0))
    smem_in = pl.BlockSpec(memory_space=pltpu.SMEM)

    def smem_out(m):
        return pl.BlockSpec((m, 1), lambda ph, j: (0, 0),
                            memory_space=pltpu.SMEM)

    if const:
        op_specs = [pl.BlockSpec((2, noff, 1, nh),
                                 lambda ph, j: (0, 0, 0, 0))] * 2
    else:
        op_specs = [pl.BlockSpec(
            (2, noff, Bv, nh),
            lambda ph, j: (0, 0, jnp.where(ph == 0, j, G - 1), 0))]

    def kernel(*refs):
        (beta_ref, delta_ref) = refs[0:2]
        if const:
            sb_ref, st_ref = refs[2:4]
            x_ref, r_ref, d_ref, srm_ref, srp_ref, sdm_ref, sdp_ref = \
                refs[4:11]
            outs = refs[11:19]
            scr = refs[19:]
        else:
            coef_ref = refs[2]
            x_ref, r_ref, d_ref, srm_ref, srp_ref, sdm_ref, sdp_ref = \
                refs[3:10]
            outs = refs[10:18]
            scr = refs[18:]
        (xn_ref, rn_ref, dnew_ref, srn_ref, sdn_ref, betan_ref,
         deltan_ref, hist_ref) = outs
        if keep_r:
            dpr, dpi, q_scr, dn_scr, r_scr, al_scr, dq_acc, d_acc = scr
        else:
            dpr, dpi, q_scr, dn_scr, al_scr, dq_acc, d_acc = scr
        ph = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((ph == 0) & (j == 0))
        def _():
            dq_acc[0, 0] = 0.0
            dq_acc[1, 0] = 0.0
            dpr[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)
            dpi[...] = jnp.zeros((Bv + 2 * P, nh + 2 * P), _F)

        @pl.when(ph == 0)
        def _():
            br = beta_ref[0, 0]
            bi = beta_ref[1, 0]
            tm = jnp.where(j > 0, 1.0, 0.0).astype(_F)
            bm = jnp.where(j < G - 1, 1.0, 0.0).astype(_F)
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
            dn_scr[0, pl.ds(j * Bv, Bv), :] = dnr
            dn_scr[1, pl.ds(j * Bv, Bv), :] = dni
            if keep_r:
                r_scr[0, pl.ds(j * Bv, Bv), :] = r_ref[0]
                r_scr[1, pl.ds(j * Bv, Bv), :] = r_ref[1]
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

            if const:
                igroups = {}
                for s, (dm, dj) in enumerate(offsets):
                    if cr[s] == 0.0 and ci[s] == 0.0:
                        continue
                    igroups.setdefault((cr[s], ci[s]), []).append(
                        (dm, dj))
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
                lanes = lax.broadcasted_iota(jnp.int32, (Bv, W), 1)
                lm = (lanes == 0).astype(_F)
                rm = (lanes == W - 1).astype(_F)
                lgroups = {}
                rgroups = {}
                for s, (dm, dj) in enumerate(offsets):
                    if lcr[s] != 0.0 or lci[s] != 0.0:
                        lgroups.setdefault((lcr[s], lci[s]),
                                           []).append((dm, dj))
                    if rcr[s] != 0.0 or rci[s] != 0.0:
                        rgroups.setdefault((rcr[s], rci[s]),
                                           []).append((dm, dj))
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
                # edge one-hot columns land as static-slice RMWs on the
                # q scratch (no at[] on values; lanes static)
                q_scr[0, pl.ds(j * Bv, Bv), :] = qr
                q_scr[1, pl.ds(j * Bv, Bv), :] = qi
                q_scr[0, pl.ds(j * Bv, Bv), 0:W] = \
                    q_scr[0, pl.ds(j * Bv, Bv), 0:W] + alr * lm
                q_scr[1, pl.ds(j * Bv, Bv), 0:W] = \
                    q_scr[1, pl.ds(j * Bv, Bv), 0:W] + ali * lm
                q_scr[0, pl.ds(j * Bv, Bv), nh - W:nh] = \
                    q_scr[0, pl.ds(j * Bv, Bv), nh - W:nh] + arr * rm
                q_scr[1, pl.ds(j * Bv, Bv), nh - W:nh] = \
                    q_scr[1, pl.ds(j * Bv, Bv), nh - W:nh] + ari * rm

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
                    q_scr[0, nv - 1:nv, :] = q_scr[0, nv - 1:nv, :] + rtr
                    q_scr[1, nv - 1:nv, :] = q_scr[1, nv - 1:nv, :] + rti
            else:
                qr = jnp.zeros((Bv, nh), _F)
                qi = jnp.zeros((Bv, nh), _F)
                for s, (dm, dj) in enumerate(offsets):
                    ar_ = coef_ref[0, s]
                    ai_ = coef_ref[1, s]
                    xr_ = dpr[P + dm:P + dm + Bv, P + dj:P + dj + nh]
                    xi_ = dpi[P + dm:P + dm + Bv, P + dj:P + dj + nh]
                    qr = qr + ar_ * xr_ - ai_ * xi_
                    qi = qi + ar_ * xi_ + ai_ * xr_
                q_scr[0, pl.ds(j * Bv, Bv), :] = qr
                q_scr[1, pl.ds(j * Bv, Bv), :] = qi

            # bit-parity with v2: the coef path dots the fused VALUES
            # (as v2's K1 does); the const path re-reads the scratch so
            # the edge/strip RMWs above are included (as v2's q_ref
            # read-back does).  Mixing the forms changes the XLA
            # reduction fusion and drifts the f32 histories.
            if const:
                qfr = q_scr[0, pl.ds(j * Bv, Bv), :]
                qfi = q_scr[1, pl.ds(j * Bv, Bv), :]
            else:
                qfr, qfi = qr, qi
            dq_acc[0, 0] += jnp.sum(dnr * qfr - dni * qfi)
            dq_acc[1, 0] += jnp.sum(dnr * qfi + dni * qfr)

            @pl.when(j == G - 1)
            def _():
                dqr = dq_acc[0, 0]
                dqi = dq_acc[1, 0]
                der = delta_ref[0, 0]
                dei = delta_ref[1, 0]
                done = (((der == 0.0) & (dei == 0.0))
                        | ((dqr == 0.0) & (dqi == 0.0)))
                sdr = jnp.where(done, 1.0, dqr)
                sdi = jnp.where(done, 1.0, dqi)
                ar_, ai_ = _smith_cdiv(der, dei, sdr, sdi)
                al_scr[0, 0] = jnp.where(done, 0.0, ar_)
                al_scr[1, 0] = jnp.where(done, 0.0, ai_)
                al_scr[2, 0] = jnp.where(done, 1.0, 0.0)

        @pl.when(ph == 1)
        def _():
            @pl.when(j == 0)
            def _():
                d_acc[0, 0] = 0.0
                d_acc[1, 0] = 0.0

            ar_ = al_scr[0, 0]
            ai_ = al_scr[1, 0]
            dnr = dn_scr[0, pl.ds(j * Bv, Bv), :]
            dni = dn_scr[1, pl.ds(j * Bv, Bv), :]
            qr = q_scr[0, pl.ds(j * Bv, Bv), :]
            qi = q_scr[1, pl.ds(j * Bv, Bv), :]
            if keep_r:
                rr_ = r_scr[0, pl.ds(j * Bv, Bv), :]
                ri_ = r_scr[1, pl.ds(j * Bv, Bv), :]
            else:
                rr_ = r_ref[0]
                ri_ = r_ref[1]
            xn_ref[0] = x_ref[0] + ar_ * dnr - ai_ * dni
            xn_ref[1] = x_ref[1] + ar_ * dni + ai_ * dnr
            nrr = rr_ - (ar_ * qr - ai_ * qi)
            nri = ri_ - (ar_ * qi + ai_ * qr)
            rn_ref[0] = nrr
            rn_ref[1] = nri
            srn_ref[0, 0, 0:P, :] = nrr[0:P]
            srn_ref[1, 0, 0:P, :] = nri[0:P]
            srn_ref[0, 0, P:2 * P, :] = nrr[Bv - P:Bv]
            srn_ref[1, 0, P:2 * P, :] = nri[Bv - P:Bv]
            d_acc[0, 0] += jnp.sum(nrr * nrr - nri * nri)
            d_acc[1, 0] += 2.0 * jnp.sum(nrr * nri)

            @pl.when(j == G - 1)
            def _():
                dnr_ = d_acc[0, 0]
                dni_ = d_acc[1, 0]
                done = al_scr[2, 0] > 0.5
                der = delta_ref[0, 0]
                dei = delta_ref[1, 0]
                sdr = jnp.where(done, 1.0, der)
                sdi = jnp.where(done, 1.0, dei)
                br_, bi_ = _smith_cdiv(dnr_, dni_, sdr, sdi)
                betan_ref[0, 0] = jnp.where(done, 0.0, br_)
                betan_ref[1, 0] = jnp.where(done, 0.0, bi_)
                deltan_ref[0, 0] = dnr_
                deltan_ref[1, 0] = dni_
                hist_ref[0, 0] = jnp.sqrt(jnp.sqrt(dnr_ * dnr_
                                                   + dni_ * dni_))

    scratch = [pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),
               pltpu.VMEM((Bv + 2 * P, nh + 2 * P), _F),
               pltpu.VMEM((2, nv, nh), _F),        # q
               pltpu.VMEM((2, nv, nh), _F)]        # dnew
    if keep_r:
        scratch.append(pltpu.VMEM((2, nv, nh), _F))
    scratch += [pltpu.SMEM((3, 1), _F),            # alpha + done
                pltpu.SMEM((2, 1), _F),            # dq acc
                pltpu.SMEM((2, 1), _F)]            # delta acc

    def step(op_arg, beta2, delta2, x, r, d, Sr, Sd):
        ops = list(op_arg) if const else [op_arg]
        return pl.pallas_call(
            kernel,
            grid=(2, G),
            in_specs=[smem_in, smem_in] + op_specs
            + [blk_x, blk_r, blk_d, sblk_m1, sblk_p1, sblk_m1, sblk_p1],
            out_specs=(out_ph1, out_ph1, out_ph0, sout_ph1, sout_ph0,
                       smem_out(2), smem_out(2), smem_out(1)),
            out_shape=(jax.ShapeDtypeStruct((2, nv, nh), _F),     # xn
                       jax.ShapeDtypeStruct((2, nv, nh), _F),     # rn
                       jax.ShapeDtypeStruct((2, nv, nh), _F),     # dnew
                       jax.ShapeDtypeStruct((2, G, 2 * P, nh), _F),
                       jax.ShapeDtypeStruct((2, G, 2 * P, nh), _F),
                       jax.ShapeDtypeStruct((2, 1), _F),
                       jax.ShapeDtypeStruct((2, 1), _F),
                       jax.ShapeDtypeStruct((1, 1), _F)),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=interpret,
        )(beta2, delta2, *ops, x, r, d, Sr, Sr, Sd, Sd)

    return step


def _v3_loop(step, init_k1, op_init, op_arg, bp, x0p, n_iterations,
             nv, nh, G, Bv, P):
    """r0/delta0 init via the v2 K1, then one merged call per iteration."""
    zero2 = jnp.zeros((2, 1), _F)
    one2 = jnp.ones((2, 1), _F)
    zeros_v = jnp.zeros((2, nv, nh), _F)
    zeros_s = jnp.zeros((2, G, 2 * P, nh), _F)

    Sx0 = _boundary(x0p, G, Bv, P, nh)
    _, q0, _, _ = init_k1(op_init, zero2, one2, x0p, zeros_v, Sx0,
                          zeros_s)
    r0 = bp - q0
    delta0 = jnp.stack([jnp.sum(r0[0] * r0[0] - r0[1] * r0[1]),
                        2.0 * jnp.sum(r0[0] * r0[1])])
    Sr0 = _boundary(r0, G, Bv, P, nh)

    def body(carry, _):
        x, r, d, Sr, Sd, delta2, beta2 = carry
        xn, rn, dnew, Srn, Sdn, beta_new, delta_new, hist1 = step(
            op_arg, beta2, delta2, x, r, d, Sr, Sd)
        return (xn, rn, dnew, Srn, Sdn, delta_new, beta_new), hist1

    carry0 = (x0p, r0, zeros_v, Sr0, zeros_s, delta0.reshape(2, 1),
              zero2)
    (x, _, _, _, _, _, _), hist = lax.scan(body, carry0, None,
                                           length=n_iterations)
    h0 = jnp.sqrt(jnp.sqrt(delta0[0] ** 2 + delta0[1] ** 2))
    return x, jnp.concatenate([h0[None], hist[:, 0, 0]])


def stream_cg_v3_const_planes(offsets, grid, taps, strips2, bp, x0p,
                              n_iterations: int, block_rows: int = None,
                              keep_r: bool = None,
                              interpret: bool = False):
    """Merged-kernel constant-tap streaming CG (single RHS).

    Same contract as ``stream_cg_const_planes``; ``keep_r`` defaults by
    grid size (see module docstring).
    """
    nv, nh = grid
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_v3_const_planes")
    G = nv // Bv
    if keep_r is None:
        keep_r = nv * nh < _KEEP_R_NODES
    init_k1, _ = _build_kernels(offsets, grid, taps, Bv,
                                interpret=interpret)
    step = _build_merged(offsets, grid, Bv, keep_r, interpret, taps=taps)
    return _v3_loop(step, init_k1, strips2, strips2, bp, x0p,
                    n_iterations, nv, nh, G, Bv, P)


def stream_cg_v3_coef_planes(offsets, grid, coefp, bp, x0p,
                             n_iterations: int, block_rows: int = None,
                             keep_r: bool = None,
                             interpret: bool = False):
    """Merged-kernel variable-coefficient streaming CG (single RHS)."""
    nv, nh = grid
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_v3_coef_planes")
    G = nv // Bv
    if keep_r is None:
        keep_r = nv * nh < _KEEP_R_NODES
    init_k1 = _build_k1_coef(offsets, grid, Bv, interpret=interpret)
    step = _build_merged(offsets, grid, Bv, keep_r, interpret, taps=None)
    return _v3_loop(step, init_k1, coefp, coefp, bp, x0p, n_iterations,
                    nv, nh, G, Bv, P)


def stream_cg_v3_const(stencil, b, x0=None, n_iterations: int = 10,
                       block_rows: int = None, keep_r: bool = None,
                       interpret: bool = False):
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
    return stream_cg_v3_const_planes(stencil.offsets, stencil.grid, taps,
                                     strips2, bp, x0p, n_iterations,
                                     block_rows=block_rows, keep_r=keep_r,
                                     interpret=interpret)


def stream_cg_v3_coef(stencil, b, x0=None, n_iterations: int = 10,
                      block_rows: int = None, keep_r: bool = None,
                      interpret: bool = False):
    """Convenience wrapper for the variable-coefficient variant."""
    nv, nh = stencil.grid
    coefp = prepare_stream_coef(stencil)
    b = np.asarray(b).reshape(nv, nh)
    bp = jnp.asarray(np.stack([b.real, b.imag]).astype(np.float32))
    if x0 is None:
        x0p = jnp.zeros((2, nv, nh), np.float32)
    else:
        x0 = np.asarray(x0).reshape(nv, nh)
        x0p = jnp.asarray(np.stack([x0.real, x0.imag]).astype(np.float32))
    return stream_cg_v3_coef_planes(stencil.offsets, stencil.grid, coefp,
                                    bp, x0p, n_iterations,
                                    block_rows=block_rows, keep_r=keep_r,
                                    interpret=interpret)
