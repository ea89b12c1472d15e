"""HBM-streaming CG v4: VMEM-resident multi-iteration kernel.

v3 (``tpcg.ops.stream_cg_v3``) merged the two per-iteration sweeps into
one pallas call but still streams the CG state through HBM every
iteration: 12 plane-transfers (x, r, d read + write) at N = 2048.  v4
removes that too.  ONE pallas call runs K iterations with grid
``(K, 2, G)`` -- iteration, phase (0 = K1 direction+matvec+<d,q>,
1 = K2 updates+<r,r>), row block -- and the whole CG state lives in
VMEM *scratch* across iterations:

  * ``x``, ``r``, ``d`` are read from HBM only at the chunk's first
    iteration and written back only at its last,
  * ``q`` is VMEM-resident too when the budget allows (``keep_q``,
    N <= ~1536); otherwise it is recomputed in phase 1 from the
    resident ``d`` (bit-identical by construction -- the stored
    ``dnew`` values ARE the phase-0 halo expressions),
  * per-iteration scalars (alpha, beta, delta, the <d,q> and <r,r>
    accumulators) live in SMEM scratch, exactly as in v2/v3.

Steady-state HBM traffic is therefore ~zero state planes per iteration
for the constant-tap path (the strips are a few rows), and only the
coefficient planes for the variable-coefficient path.  Solves longer
than ``chunk`` iterations run as a short python loop of such calls with
x/r/d round-tripping HBM once per chunk (12 planes / ``chunk``
iterations -- negligible); that also bounds the SMEM history buffer and
the grid size.

Halo logic: because the full ``r``/``d`` planes are resident, block
halos are direct VMEM row reads -- no side-output strips at all beyond
the chunk's first iteration (which takes the same ``_boundary`` strips
as v2/v3 since neighbour blocks aren't loaded yet).  The top halo of
block j always reads rows already overwritten with this iteration's
``dnew`` (sweep order), the bottom halo recomputes ``r + beta*d`` from
the resident old values -- bit-identical to v2's strip expressions, so
residual histories match v2/v3 bit-for-bit (pinned by tests).

Reference semantics preserved: COCG unconjugated dots
(``kernel/complex/vdot.cl:15``), fixed iteration count (``clcg.c:297``),
per-iteration residual history (``cl.py:120``).
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

# VMEM scratch budgets (bytes) under the 127 MB compiler limit, leaving
# room for the dp pad buffers + pipeline block windows (~10-20 MB):
# keep_q needs x,r,d,q = 8 f32 planes; the recompute variant x,r,d = 6.
_KEEPQ_BYTES = 88 * 1024 * 1024
_RESIDENT_BYTES = 101 * 1024 * 1024
# default iterations per pallas call (bounds SMEM history + grid size)
_CHUNK = 512


def _chunks(n, cap):
    out = [cap] * (n // cap)
    if n % cap:
        out.append(n % cap)
    return out or [n]


def _build_resident(offsets, grid, Bv, K, keep_q, interpret, taps=None,
                    q_hbm=False):
    """K-iteration resident kernel.

    taps None -> variable-coefficient variant (operand = coef planes,
    requires keep_q); else constant-tap variant (operands = (sb, st)
    strips).  Returned step:
    step(op_arg, beta2, delta2, x, r, d, Sr, Sd) ->
        (xn, rn, dn, beta' (2,1), delta' (2,1), hist (K,1))

    q handling when keep_q does not fit: q_hbm=False recomputes q in
    phase 1 from the resident dnew (extra stencil apply per iteration);
    q_hbm=True instead round-trips q through an HBM-space output buffer
    with EXPLICIT async DMA: phase 0 stores each block's corrected q
    with a lazily-waited copy-out (the DMA overlaps the next block's
    direction/halo work), phase 1 double-buffers the copy-ins (block
    j+1 prefetches while block j is consumed).  Ordering is enforced by
    DMA semaphores, so the pattern is well-defined and runs under
    interpret mode, unlike buffer aliasing (whose in-call
    read-after-write interpret cannot express).
    """
    nv, nh = grid
    P = _pad_for(offsets)
    assert nv % Bv == 0, (nv, Bv)
    G = nv // Bv
    noff = len(offsets)
    const = taps is not None
    assert const or keep_q, "coef variant requires keep_q"
    assert not (keep_q and q_hbm)
    if const:
        cr, ci, lcr, lci, rcr, rci = taps
        W = min(nh, 128)
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
    if const:
        op_specs = [pl.BlockSpec((2, noff, 1, nh),
                                 lambda it, ph, j: (0, 0, 0, 0))] * 2
    else:
        op_specs = [pl.BlockSpec(
            (2, noff, Bv, nh),
            lambda it, ph, j: (0, 0, jnp.where(ph == 0, j, G - 1), 0))]
    # state inputs: fetched only during the first iteration's sweep of
    # the phase that consumes them; pinned at the sweep's end otherwise
    # (no refetch, no spurious flush)
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
    # outputs: written only at the last iteration.  x/r sweep ends at
    # the grid's final step (pin-before 0); d's sweep (phase 0) is
    # followed by phase-1 steps, so it pins AFTER at G-1 (the one
    # spurious pre-sweep flush of window G-1 is overwritten by the
    # grid-end flush of the correctly-written window).
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
        beta0_ref, delta0_ref = refs[0:2]
        nin = 9 if const else 8
        if const:
            sb_ref, st_ref = refs[2:4]
            x_ref, r_ref, d_ref, sr_ref, sd_ref = refs[4:9]
        else:
            coef_ref = refs[2]
            x_ref, r_ref, d_ref, sr_ref, sd_ref = refs[3:8]
        nout = 7 if q_hbm else 6
        outs = refs[nin:nin + nout]
        scr = refs[nin + nout:]
        if q_hbm:
            (xn_ref, rn_ref, dn_ref, betan_ref, deltan_ref, hist_ref,
             qo_ref) = outs
            (x_scr, r_scr, d_scr, q_scr, dpr, dpi, al, dqa, dda, bd,
             qb, sems) = scr
        else:
            xn_ref, rn_ref, dn_ref, betan_ref, deltan_ref, hist_ref = \
                outs
            x_scr, r_scr, d_scr, q_scr, dpr, dpi, al, dqa, dda, bd = \
                scr
            qo_ref = qb = sems = None

        def q_out_dma(blk):
            return pltpu.make_async_copy(
                q_scr, qo_ref.at[:, pl.ds(blk * Bv, Bv), :],
                sems.at[2])

        def q_in_dma(blk, slot):
            return pltpu.make_async_copy(
                qo_ref.at[:, pl.ds(blk * Bv, Bv), :], qb.at[slot],
                sems.at[slot])
        it = pl.program_id(0)
        ph = pl.program_id(1)
        j = pl.program_id(2)

        def qrows():
            return pl.ds(j * Bv, Bv) if keep_q else slice(0, Bv)

        def emit_q(coef_blocks=None):
            """Apply the operator to the dp pad buffer; corrected q
            lands in q_scr[qrows].  Returns the uncorrected interior
            values (the coef path dots those, matching v2)."""
            qr = jnp.zeros((Bv, nh), _F)
            qi = jnp.zeros((Bv, nh), _F)
            if const:
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
                q_scr[0, qrows(), :] = qr
                q_scr[1, qrows(), :] = qi
                lanes = lax.broadcasted_iota(jnp.int32, (Bv, W), 1)
                lm = (lanes == 0).astype(_F)
                rm = (lanes == W - 1).astype(_F)
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
                q_scr[0, qrows(), 0:W] = q_scr[0, qrows(), 0:W] + alr * lm
                q_scr[1, qrows(), 0:W] = q_scr[1, qrows(), 0:W] + ali * lm
                q_scr[0, qrows(), nh - W:nh] = \
                    q_scr[0, qrows(), nh - W:nh] + arr * rm
                q_scr[1, qrows(), nh - W:nh] = \
                    q_scr[1, qrows(), nh - W:nh] + ari * rm
                # boundary-row corrections: global row 0 is local row 0
                # in both layouts (block 0 starts at offset 0); the top
                # row is nv-1 (full-plane q) or Bv-1 (block-local q)
                r0l = 0
                rTl = (nv if keep_q else Bv) - 1

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
                    q_scr[0, r0l:r0l + 1, :] = q_scr[0, r0l:r0l + 1, :] \
                        + rbr
                    q_scr[1, r0l:r0l + 1, :] = q_scr[1, r0l:r0l + 1, :] \
                        + rbi

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
                    q_scr[0, rTl:rTl + 1, :] = q_scr[0, rTl:rTl + 1, :] \
                        + rtr
                    q_scr[1, rTl:rTl + 1, :] = q_scr[1, rTl:rTl + 1, :] \
                        + rti
            else:
                for s, (dm, dj) in enumerate(offsets):
                    ar_ = coef_blocks[0][s]
                    ai_ = coef_blocks[1][s]
                    xr_ = dpr[P + dm:P + dm + Bv, P + dj:P + dj + nh]
                    xi_ = dpi[P + dm:P + dm + Bv, P + dj:P + dj + nh]
                    qr = qr + ar_ * xr_ - ai_ * xi_
                    qi = qi + ar_ * xi_ + ai_ * xr_
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
            # top halo: rows already overwritten with THIS iteration's
            # dnew (sweep order); garbage*0-safe via where
            to = jnp.maximum(j * Bv - P, 0)
            dpr[0:P, P:P + nh] = jnp.where(
                j > 0, d_scr[0, pl.ds(to, P), :], 0.0)
            dpi[0:P, P:P + nh] = jnp.where(
                j > 0, d_scr[1, pl.ds(to, P), :], 0.0)
            dpr[P:P + Bv, P:P + nh] = dnr
            dpi[P:P + Bv, P:P + nh] = dni
            # bottom halo: dnew of block j+1 = r + beta*d from the
            # resident old values (or the entry strips at it == 0,
            # before block j+1 is loaded) -- v2's strip expression
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
                # the previous block's copy-out overlapped this block's
                # direction/halo work; reclaim q_scr before emit_q
                # overwrites it
                @pl.when(j > 0)
                def _():
                    q_out_dma(j - 1).wait()

            if const:
                emit_q()
                qfr = q_scr[0, qrows(), :]
                qfi = q_scr[1, qrows(), :]
            else:
                cb = ([coef_ref[0, s] for s in range(noff)],
                      [coef_ref[1, s] for s in range(noff)])
                qfr, qfi = emit_q(coef_blocks=cb)
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
                # double-buffered copy-ins: block j+1 prefetches while
                # block j is consumed
                slot = j % 2

                @pl.when(j == 0)
                def _():
                    q_out_dma(G - 1).wait()     # final phase-0 copy-out
                    q_in_dma(0, 0).start()

                @pl.when(j + 1 < G)
                def _():
                    q_in_dma(j + 1, (j + 1) % 2).start()

                q_in_dma(j, slot).wait()
                qr = qb[slot, 0]
                qi = qb[slot, 1]
            else:
                # recompute q from the resident dnew (all blocks now
                # hold this iteration's values); bit-identical to the
                # phase-0 result because the stored dnew values ARE the
                # phase-0 halo expressions
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
               pltpu.SMEM((3, 1), _F),                        # alpha+done
               pltpu.SMEM((2, 1), _F),                        # <d,q> acc
               pltpu.SMEM((2, 1), _F),                        # <r,r> acc
               pltpu.SMEM((4, 1), _F)]                        # beta,delta
    if q_hbm:
        scratch += [pltpu.VMEM((2, 2, Bv, nh), _F),   # copy-in buffers
                    pltpu.SemaphoreType.DMA((3,))]    # in x2 + out

    in_specs = ([smem_in, smem_in] + op_specs
                + [x_in, r_in, d_in, s_p1, s_p1])
    out_specs = [x_out, r_out, d_out, smem_out((2, 1)),
                 smem_out((2, 1)), smem_out((K, 1))]
    out_shape = [jax.ShapeDtypeStruct((2, nv, nh), _F),
                 jax.ShapeDtypeStruct((2, nv, nh), _F),
                 jax.ShapeDtypeStruct((2, nv, nh), _F),
                 jax.ShapeDtypeStruct((2, 1), _F),
                 jax.ShapeDtypeStruct((2, 1), _F),
                 jax.ShapeDtypeStruct((K, 1), _F)]
    if q_hbm:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct((2, nv, nh), _F))

    def step(op_arg, beta2, delta2, x, r, d, Sr, Sd):
        ops = list(op_arg) if const else [op_arg]
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
        )(beta2, delta2, *ops, x, r, d, Sr, Sd)
        return ret[:6] if q_hbm else ret   # drop the q scratch output

    return step


def _v4_loop(get_step, init_k1, op_init, op_arg, bp, x0p, n_iterations,
             nv, nh, G, Bv, P, chunk):
    """r0/delta0 init via the v2 K1, then one resident call per chunk."""
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
    h0 = jnp.sqrt(jnp.sqrt(delta0[0] ** 2 + delta0[1] ** 2))

    x, r, d = x0p, r0, zeros_v
    Sr, Sd = _boundary(r0, G, Bv, P, nh), zeros_s
    beta2, delta2 = zero2, delta0.reshape(2, 1)
    hists = [h0[None]]
    sizes = _chunks(n_iterations, chunk)
    for i, K in enumerate(sizes):
        step = get_step(K)
        x, r, d, beta2, delta2, hk = step(op_arg, beta2, delta2, x, r,
                                          d, Sr, Sd)
        if i + 1 < len(sizes):
            Sr = _boundary(r, G, Bv, P, nh)
            Sd = _boundary(d, G, Bv, P, nh)
        hists.append(hk[:, 0])
    return x, jnp.concatenate(hists)


def stream_cg_v4_const_planes(offsets, grid, taps, strips2, bp, x0p,
                              n_iterations: int, block_rows: int = None,
                              keep_q: bool = None, q_hbm: bool = False,
                              chunk: int = _CHUNK,
                              interpret: bool = False):
    """VMEM-resident constant-tap streaming CG (single RHS).

    Same contract as ``stream_cg_const_planes``; ``keep_q`` defaults by
    the VMEM budget (see module docstring).  ``q_hbm`` (only with
    keep_q=False) round-trips q through an aliased HBM buffer instead
    of recomputing it in phase 1.
    """
    nv, nh = grid
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_v4_const_planes")
    G = nv // Bv
    if keep_q is None:
        keep_q = 8 * nv * nh * 4 <= _KEEPQ_BYTES
    if keep_q:
        q_hbm = False
    if not keep_q and 6 * nv * nh * 4 > _RESIDENT_BYTES:
        raise ValueError(
            f"grid {grid} exceeds the v4 resident VMEM budget; use the "
            "v3/v2 streaming kernels (plan_stencil_cg picks "
            "automatically)")
    init_k1, _ = _build_kernels(offsets, grid, taps, Bv,
                                interpret=interpret)
    steps = {}

    def get_step(K):
        if K not in steps:
            steps[K] = _build_resident(offsets, grid, Bv, K, keep_q,
                                       interpret, taps=taps,
                                       q_hbm=q_hbm)
        return steps[K]

    return _v4_loop(get_step, init_k1, strips2, strips2, bp, x0p,
                    n_iterations, nv, nh, G, Bv, P, chunk)


def stream_cg_v4_coef_planes(offsets, grid, coefp, bp, x0p,
                             n_iterations: int, block_rows: int = None,
                             chunk: int = _CHUNK,
                             interpret: bool = False):
    """VMEM-resident variable-coefficient streaming CG (single RHS).

    Requires the keep_q budget (x, r, d, q resident); the coefficient
    planes are streamed once per iteration (phase 0 only) -- half the
    v2/v3 coefficient traffic and zero state traffic.
    """
    nv, nh = grid
    P = _pad_for(offsets)
    Bv = block_rows or _pick_block_rows(nv)
    _check_block_rows(nv, Bv, P, "stream_cg_v4_coef_planes")
    G = nv // Bv
    if 8 * nv * nh * 4 > _KEEPQ_BYTES:
        raise ValueError(
            f"grid {grid} exceeds the v4 keep_q VMEM budget (the coef "
            "variant cannot recompute q without re-streaming the "
            "coefficients); use v3/v2")
    init_k1 = _build_k1_coef(offsets, grid, Bv, interpret=interpret)
    steps = {}

    def get_step(K):
        if K not in steps:
            steps[K] = _build_resident(offsets, grid, Bv, K, True,
                                       interpret, taps=None)
        return steps[K]

    return _v4_loop(get_step, init_k1, coefp, coefp, bp, x0p,
                    n_iterations, nv, nh, G, Bv, P, chunk)


def stream_cg_v4_const(stencil, b, x0=None, n_iterations: int = 10,
                       block_rows: int = None, keep_q: bool = None,
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
    return stream_cg_v4_const_planes(stencil.offsets, stencil.grid, taps,
                                     strips2, bp, x0p, n_iterations,
                                     block_rows=block_rows, keep_q=keep_q,
                                     chunk=chunk, interpret=interpret)


def stream_cg_v4_coef(stencil, b, x0=None, n_iterations: int = 10,
                      block_rows: int = None, chunk: int = _CHUNK,
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
    return stream_cg_v4_coef_planes(stencil.offsets, stencil.grid, coefp,
                                    bp, x0p, n_iterations,
                                    block_rows=block_rows, chunk=chunk,
                                    interpret=interpret)
